// Config A/B harness: run a set of declared queries under named conf
// variations, min-of-reps each, and print a comparison table (guide §1
// measure-first loop for configuration experiments).
//
//   SPARK_GRAFT_AB_KEYS=x58,x20 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
//   /opt/spark/bin/spark-shell --master "local[32]" --driver-memory 8g \
//     --driver-class-path target/scala-2.13/classes \
//     --conf spark.ui.enabled=false -I tools/bench_ab.scala
{
  val keysSpec = sys.env.getOrElse("SPARK_GRAFT_AB_KEYS", "x20")
  val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
  val reps = sys.env.getOrElse("SPARK_GRAFT_AB_REPS", "3").toInt
  val matcher = { val names = keysSpec.split(",").map(_.trim).filter(_.nonEmpty).toSet
    (k: String) => names.exists(n => k == n || k.startsWith(n + "_")) }
  spark.conf.set("spark.sql.shuffle.partitions",
    sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
  spark.conf.set("spark.sql.session.timeZone", "UTC")
  spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  // each variation: (name, Map(conf -> value)); applied before the runs
  // and reverted after (set back to the recorded prior value)
  val variations: Seq[(String, Map[String, String])] = Seq(
    ("base", Map.empty),
    ("shj+aqeSHJ", Map(
      "spark.sql.join.preferSortMergeJoin" -> "false",
      "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold" -> "134217728")),
    ("mem", Map("spark.graft.materialize.mode" -> "memory")),
    ("mem+shj", Map(
      "spark.graft.materialize.mode" -> "memory",
      "spark.sql.join.preferSortMergeJoin" -> "false",
      "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold" -> "134217728"))
  )
  val sel = graft.SparkEntry.queries.filter(e => matcher(e._1)).toSeq.sortBy(_._1)
  // warm once (codegen, readers)
  sel.foreach { case (_, fn) =>
    try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    graft.std.Materialize.releaseAll()
  }
  val results = scala.collection.mutable.Map.empty[(String, String), Double]
  variations.foreach { case (vname, confs) =>
    val prior = confs.keys.map(k =>
      k -> util.Try(spark.conf.get(k)).toOption).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    sel.foreach { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          println(s"[ab] $name/$vname FAILED: ${e.getMessage}"); -1.0
        } finally graft.std.Materialize.releaseAll()
      }
      val ok = times.filter(_ >= 0)
      results((name, vname)) = if (ok.isEmpty) -1.0 else ok.min
    }
    prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
  val vnames = variations.map(_._1)
  println("[ab] query                                    " +
    vnames.map(v => f"$v%12s").mkString)
  sel.foreach { case (name, _) =>
    println(f"[ab] $name%-40s " + vnames.map(v =>
      f"${results((name, v))}%12.3f").mkString)
  }
}
sys.exit(0)
