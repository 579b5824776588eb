// Dump .explain("formatted") for a set of declared queries to
// plans/<tag>/<key>_<suffix>.txt — the optimization round's plan-evidence
// tool (guide §1: capture plan shape before/after each change).
//
//   SPARK_GRAFT_PLAN_KEYS=x20,x58 SPARK_GRAFT_PLAN_SUFFIX=before \
//   /opt/spark/bin/spark-shell --master "local[8]" \
//     --driver-class-path target/scala-2.13/classes \
//     --conf spark.ui.enabled=false -I tools/dump_plans.scala
//
// Keys use the same prefix-up-to-underscore matcher as SPARK_GRAFT_ONLY.
// SPARK_GRAFT_PLAN_DIR overrides the output dir (default plans/r21);
// SPARK_GRAFT_SF_DIR the data dir (default sf0.01 — plan SHAPE is what
// matters here, and the small corpus keeps the memo builds cheap).
{
  val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
  val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r21")
  val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
  val keysSpec = sys.env.getOrElse("SPARK_GRAFT_PLAN_KEYS", "")
  val matcher = { val names = keysSpec.split(",").map(_.trim).filter(_.nonEmpty).toSet
    (k: String) => names.exists(n => k == n || k.startsWith(n + "_")) }
  new java.io.File(outDir).mkdirs()
  spark.conf.set("spark.sql.session.timeZone", "UTC")
  spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
  val sel = graft.SparkEntry.queries.filter(e => matcher(e._1)).toSeq.sortBy(_._1)
  sel.foreach { case (name, fn) =>
    try {
      val df = fn(spark, sfDir)
      // run the query first so AQE's final plan (the executed shape:
      // join strategy rewrites, coalesced reads) is what gets dumped
      df.write.format("noop").mode("overwrite").save()
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
      println(s"[plans] wrote $outDir/${name}_$suffix.txt")
    } catch { case e: Throwable =>
      println(s"[plans] $name FAILED: ${e.getMessage}")
    }
    graft.std.Materialize.releaseAll()
  }
  graft.std.SessionMemo.releaseSession(spark)
}
sys.exit(0)
