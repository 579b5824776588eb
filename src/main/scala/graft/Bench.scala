package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // releasing a localCheckpoint pin intentionally discards truncated
    // lineage; the per-RDD WARN would spam the driver-captured tail
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD",
      org.apache.logging.log4j.Level.ERROR)
    // untimed warmup: JVM/codegen/parquet-reader startup otherwise lands
    // entirely on the alphabetically-first query (measured ~6s of the
    // first entry's wall time)
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // SPARK_GRAFT_ONLY=d2,q1 runs a comma-separated subset (local
    // iteration). Match the exact key or a prefix up to an underscore —
    // bare startsWith would make "t1" select t10..t18 too.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) =>
        SparkEntry.queries.filter { case (k, _) =>
          names.exists(n => k == n || k.startsWith(n + "_")) }
      case None => SparkEntry.queries
    }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop-format write forces full evaluation of every column; a bare
      // count() would let Catalyst prune projection-shaped queries down to
      // the scan (benching the reader, not the operator).
      val r = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        name -> (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        // -1 marks a failed query in the JSON; a thrown query must not
        // masquerade as a fast success
        name -> -1.0
      }
      // drop the query's materialize-once pins before timing the next
      // one — accumulated checkpoint blocks squeeze execution memory and
      // made round-3's late dedup queries nondeterministically 10x slow
      graft.std.Materialize.releaseAll()
      r
    }
    // stdout gets 3-dp values: the driver captures only the last ~2.9 KB
    // of output, and round 4's 76-query full-precision line (~3.3 KB)
    // overflowed that window — its head was cut and the JSON never
    // parsed. 3 dp keeps the line under ~2.2 KB with headroom for more
    // queries; the file copy keeps full precision.
    def jsonLine(fmt: Double => String): String = {
      val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val total = results.map(_._2).filter(_ >= 0).sum
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    }
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
        "/tmp/graft_bench.json")), jsonLine(_.toString))
    catch { case _: Throwable => () }
    println(jsonLine(v =>
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))))
    spark.stop()
  }
}
