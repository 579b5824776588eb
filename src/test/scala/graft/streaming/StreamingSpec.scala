package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.Tables

/** Real Structured Streaming smoke: the SAME aggregation function that
  * the batch oracle validates, run through readStream → watermark →
  * memory sink, must produce the batch answer once the stream drains
  * (complete output mode over a finite file source).
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("hourlyByType over readStream equals the batch result") {
    val sfDir = "/root/testdata/sf0.001"
    val batchEvents = Tables.events(spark, sfDir)
    val expected = StreamingOps.hourlyByType(batchEvents)
      .collect().map(_.toSeq).toSet

    // stage the events as micro-batchable parquet (normalized micros
    // timestps so readStream needs no nanos shim)
    val stage = Files.createTempDirectory("stream_src").toString
    batchEvents.write.mode("overwrite").parquet(stage)

    val streamIn = spark.readStream
      .schema(batchEvents.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage)
    val agg = StreamingOps.hourlyByType(
      StreamingOps.withWatermarked(streamIn, "2 hours"))
    val q = agg.writeStream
      .format("memory")
      .queryName("hourly_smoke")
      .outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("hourly_smoke").collect().map(_.toSeq).toSet
      assert(got == expected,
        s"stream/batch divergence: ${got.size} vs ${expected.size} rows")
    } finally q.stop()
  }

  test("flatMapGroupsWithState running totals: batch form equals groupBy agg") {
    val sfDir = "/root/testdata/sf0.001"
    val events = Tables.events(spark, sfDir)
    val viaState = StreamingOps.runningUserTotals(events)
      .collect().map(u => (u.user_id, u.n_events, math.round(u.sum_value * 100)))
      .toSet
    val viaAgg = events.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("value").as("s"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 100)))
      .toSet
    assert(viaState == viaAgg)
  }

  test("flatMapGroupsWithState accumulates across micro-batches") {
    val sfDir = "/root/testdata/sf0.001"
    val batchEvents = Tables.events(spark, sfDir)
    val stage = Files.createTempDirectory("state_src").toString
    // two files → at least two micro-batches with maxFilesPerTrigger=1
    batchEvents.repartition(2).write.mode("overwrite").parquet(stage)
    val streamIn = spark.readStream
      .schema(batchEvents.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage)
    val q = StreamingOps.runningUserTotals(streamIn)
      .writeStream.format("memory").queryName("running_totals")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      // the row with the highest n_events per user is the final state
      // (n_events is strictly increasing; sum_value need not be)
      val last = spark.table("running_totals")
        .withColumn("_rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("user_id")
            .orderBy(col("n_events").desc)))
        .filter(col("_rn") === 1)
        .collect()
        .map(r => (r.getLong(r.fieldIndex("user_id")),
          r.getLong(r.fieldIndex("n_events")),
          math.round(r.getDouble(r.fieldIndex("sum_value")) * 100)))
        .toSet
      val expected = batchEvents.groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum("value").as("s"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 100)))
        .toSet
      assert(last == expected)
    } finally q.stop()
  }

  test("stream-stream range join matches the batch inner form") {
    val sfDir = "/root/testdata/sf0.001"
    val batchEvents = Tables.events(spark, sfDir)
    // batch reference: inner form of the click→purchase pairing
    val clicks = batchEvents.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val purchases = batchEvents.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val expected = clicks.join(purchases,
      col("user_id") === col("p_user") && col("p_ts") > col("click_ts") &&
        col("p_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES")).count()

    val stage = Files.createTempDirectory("ssj_src").toString
    batchEvents.write.mode("overwrite").parquet(stage)
    def stream() = spark.readStream.schema(batchEvents.schema).parquet(stage)
    val sClicks = stream().filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "2 hours")
    val sPurch = stream().filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    val joined = sClicks.join(sPurch,
      col("user_id") === col("p_user") && col("p_ts") > col("click_ts") &&
        col("p_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("ssj_smoke")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("ssj_smoke").count() == expected)
    } finally q.stop()
  }

  test("checkpointed restart is exactly-once (no reprocessed rows)") {
    val sfDir = "/root/testdata/sf0.001"
    val batchEvents = Tables.events(spark, sfDir)
    val srcDir = Files.createTempDirectory("ckpt_src").toString
    val ckpt = Files.createTempDirectory("ckpt").toString
    val outDir = Files.createTempDirectory("ckpt_out").toString
    val half = batchEvents.count() / 2

    def startQuery() = spark.readStream
      .schema(batchEvents.schema)
      .parquet(srcDir)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()

    // batch 1 → process → stop (simulated crash/redeploy)
    batchEvents.limit(half.toInt).write.mode("append").parquet(srcDir)
    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()
    // batch 2 arrives while "down"; restart from the same checkpoint
    batchEvents.write.mode("append").parquet(srcDir)
    val q2 = startQuery()
    q2.processAllAvailable(); q2.stop()

    val got = spark.read.parquet(outDir).count()
    // first half processed once, full set appended once → 1.5x, not 2x
    assert(got == half + batchEvents.count(),
      s"expected ${half + batchEvents.count()} rows, got $got (duplicates = reprocessing)")
  }

  test("streaming dedup emits each content key exactly once") {
    val sfDir = "/root/testdata/sf0.001"
    val batchEvents = Tables.events(spark, sfDir)
    // duplicate-heavy input: the corpus twice over
    val doubled = batchEvents.unionByName(batchEvents)
    val expectedKeys = StreamingOps.dedupedEvents(doubled)
      .select("dedup_key").collect().map(_.getString(0)).toSet

    val stage = Files.createTempDirectory("dedup_src").toString
    doubled.repartition(4).write.mode("overwrite").parquet(stage)
    val streamIn = spark.readStream
      .schema(batchEvents.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage)
    // watermark far beyond any plausible data span (the events corpus
    // covers ~30 days — a 30-day delay would leave only a 43-minute
    // margin before early keys expire mid-test and late duplicates
    // re-emit as a silent flake)
    val q = StreamingOps.dedupedEvents(
        StreamingOps.withWatermarked(streamIn, "3650 days"))
      .writeStream.format("memory").queryName("dedup_smoke")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("dedup_smoke")
        .select("dedup_key").collect().map(_.getString(0))
      assert(got.length == got.distinct.length,
        s"streaming dedup re-emitted ${got.length - got.distinct.length} keys")
      assert(got.toSet == expectedKeys)
    } finally q.stop()
  }

  test("funnel transitions (batch) reproduce clickFunnel's counts") {
    val sfDir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, sfDir)
    val counts = StreamingOps.funnelTransitions(ev).toDF()
      .groupBy("stage").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val summary = StreamingOps.clickFunnel(ev).head()
    graft.std.Materialize.releaseAll()
    assert(counts.getOrElse("clicked", 0L) ==
      summary.getLong(summary.fieldIndex("n_clickers")))
    assert(counts.getOrElse("converted", 0L) ==
      summary.getLong(summary.fieldIndex("n_converted")))
  }

  test("transition pairs: stateful batch form ≡ the x47 lead window") {
    val sfDir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, sfDir)
    val stateful = StreamingOps.transitionRollup(
      StreamingOps.transitionPairs(ev).toDF()).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val window = graft.ext.Timeseries.transitionMatrix(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    graft.std.Materialize.releaseAll()
    assert(stateful == window && stateful.nonEmpty)
  }

  test("streaming transition pairs: last-event state carries across batches") {
    import spark.implicits._
    def ev(uid: Long, typ: String, t: String, id: Long) =
      (uid, typ, java.sql.Timestamp.valueOf(t), id)
    val dir = Files.createTempDirectory("trans_src").toFile
    def stamp(m: Long): Unit = dir.listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.lastModified() > m)
      .foreach(f => assert(f.setLastModified(m)))
    // micro-batch 1: user 1 emits a->b (in-batch), user 2 a lone view
    Seq(ev(1L, "a", "2024-01-01 10:00:00", 1L),
        ev(1L, "b", "2024-01-01 10:01:00", 2L),
        ev(2L, "view", "2024-01-01 10:00:00", 3L))
      .toDF("user_id", "event_type", "ts", "event_id")
      .coalesce(1).write.mode("append").parquet(dir.toString)
    stamp(1000000L)
    // micro-batch 2: user 1's c pairs against the STORED b; user 2
    // converts its lone view into view->click
    Seq(ev(1L, "c", "2024-01-01 10:05:00", 4L),
        ev(2L, "click", "2024-01-01 10:06:00", 5L))
      .toDF("user_id", "event_type", "ts", "event_id")
      .coalesce(1).write.mode("append").parquet(dir.toString)
    stamp(2000000L)
    val streamIn = spark.readStream
      .schema("user_id LONG, event_type STRING, ts TIMESTAMP, event_id LONG")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
    val q = StreamingOps.transitionPairs(streamIn)
      .writeStream.format("memory").queryName("trans_pairs")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("trans_pairs").collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(got.sorted.toSeq ==
        Seq(("a", "b"), ("b", "c"), ("view", "click")),
        s"got ${got.toSeq}")
    } finally q.stop()
  }

  test("gap pairs: stateful batch form ≡ the x51 lag window") {
    val sfDir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, sfDir)
    val stateful = graft.ext.Timeseries.cadenceRollup(
      StreamingOps.gapPairs(ev).toDF()).collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val window = graft.ext.Timeseries.cadenceProfile(ev).collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(stateful == window && stateful.nonEmpty)
  }

  test("streaming gap pairs: last-ts state carries across batches") {
    import spark.implicits._
    def ev(uid: Long, t: String, id: Long) =
      (uid, java.sql.Timestamp.valueOf(t), id)
    val dir = Files.createTempDirectory("gap_src").toFile
    def stamp(m: Long): Unit = dir.listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.lastModified() > m)
      .foreach(f => assert(f.setLastModified(m)))
    // micro-batch 1: user 1 emits one 60s gap in-batch; user 2 lone
    Seq(ev(1L, "2024-01-01 10:00:00", 1L),
        ev(1L, "2024-01-01 10:01:00", 2L),
        ev(2L, "2024-01-01 10:00:30", 3L))
      .toDF("user_id", "ts", "event_id")
      .coalesce(1).write.mode("append").parquet(dir.toString)
    stamp(1000000L)
    // micro-batch 2: both users gap against their STORED timestamps
    Seq(ev(1L, "2024-01-01 10:03:00", 4L),
        ev(2L, "2024-01-01 10:00:45", 5L))
      .toDF("user_id", "ts", "event_id")
      .coalesce(1).write.mode("append").parquet(dir.toString)
    stamp(2000000L)
    val streamIn = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP, event_id LONG")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
    val q = StreamingOps.gapPairs(streamIn)
      .writeStream.format("memory").queryName("gap_pairs")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("gap_pairs").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == Seq((1L, 60L), (1L, 120L), (2L, 15L)),
        s"got $got")
    } finally q.stop()
  }

  test("asof pairs: stateful batch form ≡ the x3 window form") {
    val sfDir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, sfDir)
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(r.fieldIndex("event_id")) ->
        (r.getLong(r.fieldIndex("user_id")),
          r.getTimestamp(r.fieldIndex("event_ts")),
          Option(r.getTimestamp(r.fieldIndex("asof_ts"))))).toMap
    val stateful = keyed(StreamingOps.asofPairs(ev).toDF())
    val window = keyed(graft.ext.TemporalJoins.asOfLast(ev))
    graft.std.Materialize.releaseAll()
    assert(stateful == window && stateful.nonEmpty,
      s"stateful=${stateful.size} window=${window.size}")
  }

  test("streaming asof: signup state carries across batches with micros") {
    import spark.implicits._
    def ev(uid: Long, typ: String, t: String, id: Long) =
      (uid, typ, java.sql.Timestamp.valueOf(t), id)
    val dir = Files.createTempDirectory("asof_src").toFile
    def stamp(m: Long): Unit = dir.listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.lastModified() > m)
      .foreach(f => assert(f.setLastModified(m)))
    // micro-batch 1: user 1 signs up (microsecond timestamp) and errors
    // in-batch; user 2 errors with NO signup anywhere
    Seq(ev(1L, "signup", "2024-01-01 10:00:00.123456", 1L),
        ev(1L, "error", "2024-01-01 10:01:00", 2L),
        ev(2L, "error", "2024-01-01 10:00:00", 3L))
      .toDF("user_id", "event_type", "ts", "event_id")
      .coalesce(1).write.mode("append").parquet(dir.toString)
    stamp(1000000L)
    // micro-batch 2: user 1's second error stamps against the STORED
    // signup — the micros must survive the O(1) state round-trip
    Seq(ev(1L, "error", "2024-01-01 10:05:00", 4L))
      .toDF("user_id", "event_type", "ts", "event_id")
      .coalesce(1).write.mode("append").parquet(dir.toString)
    stamp(2000000L)
    val streamIn = spark.readStream
      .schema("user_id LONG, event_type STRING, ts TIMESTAMP, event_id LONG")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
    val q = StreamingOps.asofPairs(streamIn)
      .writeStream.format("memory").queryName("asof_pairs")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("asof_pairs").collect()
        .map(r => r.getLong(0) -> Option(r.getTimestamp(3))).toMap
      val signup = java.sql.Timestamp.valueOf("2024-01-01 10:00:00.123456")
      assert(got(2L).contains(signup), s"in-batch stamp: ${got.get(2L)}")
      assert(got(4L).contains(signup), s"cross-batch stamp: ${got.get(4L)}")
      assert(got(3L).isEmpty, "no signup -> null asof")
    } finally q.stop()
  }

  test("sequence scorer: stateful batch form ≡ x49's per-user aggregate") {
    val sfDir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, sfDir)
    val stateful = StreamingOps.sequenceScoreStream(ev,
        graft.ext.Timeseries.transitionLogprobE9(ev)).collect()
      .map(s => s.user_id -> (s.n_pairs, s.avg_logprob)).toMap
    // k beyond the user population = the full pre-limit aggregate
    val batch = graft.ext.Timeseries.sequenceLikelihood(ev, k = 1000000)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    graft.std.Materialize.releaseAll()
    assert(stateful == batch && stateful.nonEmpty,
      s"stateful=${stateful.size} batch=${batch.size}")
  }

  test("streaming sequence scorer: running average updates across batches") {
    import spark.implicits._
    def ev(uid: Long, typ: String, t: String, id: Long) =
      (uid, typ, java.sql.Timestamp.valueOf(t), id)
    val dir = Files.createTempDirectory("seqscore_src").toFile
    def stamp(m: Long): Unit = dir.listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.lastModified() > m)
      .foreach(f => assert(f.setLastModified(m)))
    // model: ln P(b|a) = ln 0.75 (9 dp: -0.287682072), ln P(a|b) = 0
    val model = Map(("a", "b") -> -287682072L, ("b", "a") -> 0L)
    // batch 1: a -> b (one scored pair); batch 2: -> a (pair b->a,
    // contrib 0) — the running average must carry the stored sum
    Seq(ev(1L, "a", "2024-01-01 10:00:00", 1L),
        ev(1L, "b", "2024-01-01 10:01:00", 2L))
      .toDF("user_id", "event_type", "ts", "event_id")
      .coalesce(1).write.mode("append").parquet(dir.toString)
    stamp(1000000L)
    Seq(ev(1L, "a", "2024-01-01 10:05:00", 3L))
      .toDF("user_id", "event_type", "ts", "event_id")
      .coalesce(1).write.mode("append").parquet(dir.toString)
    stamp(2000000L)
    val streamIn = spark.readStream
      .schema("user_id LONG, event_type STRING, ts TIMESTAMP, event_id LONG")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
    val q = StreamingOps.sequenceScoreStream(streamIn, model)
      .writeStream.format("memory").queryName("seq_scores")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("seq_scores").collect()
        .map(r => (r.getLong(1), r.getDouble(2))).sortBy(_._1)
      assert(got.toSeq == Seq((1L, -0.287682), (2L, -0.143841)),
        s"running feed: ${got.toSeq}")
    } finally q.stop()
  }

  test("streaming funnel converts when the purchase ARRIVES before the click") {
    import spark.implicits._
    def ev(uid: Long, typ: String, t: String) =
      (uid, typ, java.sql.Timestamp.valueOf(t))
    val dir = Files.createTempDirectory("funnel_src").toFile
    def stamp(m: Long): Unit = dir.listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.lastModified() > m)
      .foreach(f => assert(f.setLastModified(m)))
    // micro-batch 1 (arrives first): purchases only — user 1's is within
    // the hour of a click it has not seen yet, user 2's is outside it
    Seq(ev(1L, "purchase", "2024-01-01 10:30:00"),
        ev(2L, "purchase", "2024-01-01 12:00:00"))
      .toDF("user_id", "event_type", "ts")
      .coalesce(1).write.mode("append").parquet(dir.toString)
    stamp(1000000L)
    // micro-batch 2: the clicks, event-time EARLIER than batch 1
    Seq(ev(1L, "click", "2024-01-01 10:00:00"),
        ev(2L, "click", "2024-01-01 10:00:00"))
      .toDF("user_id", "event_type", "ts")
      .coalesce(1).write.mode("append").parquet(dir.toString)
    stamp(2000000L)

    val streamIn = spark.readStream
      .schema("user_id LONG, event_type STRING, ts TIMESTAMP")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
    val q = StreamingOps.funnelTransitions(streamIn)
      .writeStream.format("memory").queryName("funnel_tr")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("funnel_tr").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      // user 1 converts via the pending-purchase buffer; user 2's
      // purchase is outside the window → clicked only
      assert(got == Set((1L, "clicked"), (1L, "converted"), (2L, "clicked")))
    } finally q.stop()
  }

  test("streaming incremental dedup: micro-batched ≡ batch, pins released") {
    val sfDir = "/root/testdata/sf0.001"
    val base = Tables.documents(spark, sfDir).select(col("doc_id"),
      graft.ext.TextOps.normText(col("text")).as("text"))
    val existing = base.filter(col("doc_id") % 3 === 0)
    val batch = base.filter(col("doc_id") % 3 =!= 0)
      .unionByName(existing.filter(col("doc_id") % 6 === 0)
        .select((col("doc_id") + 300000).as("doc_id"), col("text")))
    // batch-mode reference statuses
    val expected = graft.ext.Dedup.incrementalClassify(batch, existing)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    graft.std.Materialize.releaseAll()
    // the same docs arriving as ≥2 micro-batches
    val stage = Files.createTempDirectory("inc_dedup_src").toString
    batch.repartition(2).write.mode("overwrite").parquet(stage)
    val streamIn = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
    val got = scala.collection.mutable.Set.empty[(Long, String)]
    val state = graft.ext.Dedup.corpusState(existing)
    try {
      val pinsBefore = graft.std.Materialize.pinCount
      val q = StreamingOps.incrementalDedupStream(streamIn, state,
        df => got.synchronized {
          got ++= df.collect().map(r => (r.getLong(0), r.getString(1)))
        }).start()
      try q.processAllAvailable() finally q.stop()
      // micro-batch boundaries cannot change per-doc statuses
      assert(got.toSet == expected)
      // scoped release left no per-batch pins behind
      assert(graft.std.Materialize.pinCount == pinsBefore)
    } finally state.release()
  }

  test("streaming embedding dedup: micro-batched ≡ batch, corpus pinned") {
    val sfDir = "/root/testdata/sf0.001"
    val all = graft.ext.ExtQueries.nearDupVectors(
      Tables.embeddings(spark, sfDir))
    val corpus = all.filter(col("vec_id") % 3 === 0)
    val batch = all.filter(col("vec_id") % 3 =!= 0)
    def rowSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.toString).orNull)).toSet
    val expected = rowSet(graft.ext.Similarity.incrementalEmbeddingDedup(
      batch, corpus, 0.97, dims = Some(64)))
    graft.std.Materialize.releaseAll()
    assert(expected.exists(_._2 == "near_dup"),
      "the injected dups should produce near_dup statuses")
    // the same vectors arriving as ≥2 micro-batches against a standing
    // pinned corpus
    val stage = Files.createTempDirectory("emb_dedup_src").toString
    batch.repartition(2).write.mode("overwrite").parquet(stage)
    val streamIn = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
    val corpusPrepped = graft.std.Materialize.pinUnregistered(
      graft.ext.Similarity.prepVectorCorpus(corpus, dims = Some(64)))
    val got = scala.collection.mutable.Set
      .empty[(Long, String, Long, String)]
    try {
      val pinsBefore = graft.std.Materialize.pinCount
      val q = StreamingOps.embeddingDedupStream(streamIn, corpusPrepped,
        0.97, df => got.synchronized { got ++= rowSet(df) },
        dims = Some(64)).start()
      try q.processAllAvailable() finally q.stop()
      // micro-batch boundaries cannot change per-vector statuses
      assert(got.toSet == expected)
      assert(graft.std.Materialize.pinCount == pinsBefore)
    } finally graft.std.Materialize.releasePin(corpusPrepped)
  }

  test("live incremental-dedup stream survives a concurrent " +
       "Materialize.releaseAll loop (owner-tagged pins)") {
    // the unverified lifecycle claim of the owner-token design: a
    // bench/verify loop calling releaseAll() on another thread while a
    // stream's micro-batch holds scoped pins must neither drop the
    // batch's pins mid-flight nor touch the unregistered corpus state
    val sfDir = "/root/testdata/sf0.001"
    val base = Tables.documents(spark, sfDir).select(col("doc_id"),
      graft.ext.TextOps.normText(col("text")).as("text"))
    val existing = base.filter(col("doc_id") % 3 === 0)
    val batch = base.filter(col("doc_id") % 3 =!= 0)
    val expected = graft.ext.Dedup.incrementalClassify(batch, existing)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    graft.std.Materialize.releaseAll()
    val stage = Files.createTempDirectory("inc_dedup_hammer").toString
    batch.repartition(4).write.mode("overwrite").parquet(stage)
    val streamIn = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
    val got = scala.collection.mutable.Set.empty[(Long, String)]
    val state = graft.ext.Dedup.corpusState(existing)
    try {
      val q = StreamingOps.incrementalDedupStream(streamIn, state,
        df => got.synchronized {
          got ++= df.collect().map(r => (r.getLong(0), r.getString(1)))
        }).start()
      // the concurrent bench/verify loop, as hostile as it gets
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val hammer = new Thread(() => {
        while (!stop.get()) {
          graft.std.Materialize.releaseAll(); Thread.sleep(1)
        }
      }, "releaseAll-hammer")
      hammer.setDaemon(true); hammer.start()
      try q.processAllAvailable()
      finally { stop.set(true); hammer.join(5000); q.stop() }
      assert(got.toSet == expected,
        "statuses diverged under a concurrent releaseAll loop")
      // the unregistered corpus state must still be usable afterwards
      val again = graft.ext.Dedup.classifyIncrement(state, batch)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      graft.std.Materialize.releaseAll()
      assert(again == expected, "corpus state lost its blocks")
    } finally state.release()
  }

  test("userSessions sessionizes with the 5-minute gap (batch form)") {
    import spark.implicits._
    val ts = Seq(
      (1L, "2024-01-01 00:00:00"), (1L, "2024-01-01 00:03:00"),
      (1L, "2024-01-01 00:07:59"), // 4:59 gap → same session
      (1L, "2024-01-01 00:13:00"), // 5:01 gap → new session
      (2L, "2024-01-01 00:00:00")
    ).toDF("user_id", "s")
      .select(col("user_id"), col("s").cast("timestamp").as("ts"),
        lit(1.0).as("value"))
    val got = StreamingOps.userSessions(ts).collect()
      .map(r => (r.getLong(r.fieldIndex("user_id")),
        r.getLong(r.fieldIndex("n_events")))).toSeq.sorted
    assert(got == Seq((1L, 1L), (1L, 3L), (2L, 1L)))
  }

  test("streaming KMV sketch: micro-batched ≡ batch estimate") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sfDir)
    val stage = Files.createTempDirectory("kmv_src").toString
    // three files → three micro-batches; the state fold must merge the
    // per-batch bottom-ks into exactly the whole-corpus bottom-k
    docs.repartition(3).write.mode("overwrite").parquet(stage)
    val streamIn = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
    val q = StreamingOps.kmvCardinalityStream(streamIn, k = 64)
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    // n_hashes_seen is cumulative, so max-per-lang selects the final emit
    val last = spark.table("kmv_stream")
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang")
          .orderBy(col("n_hashes_seen").desc)))
      .filter(col("_rn") === 1)
      .collect()
      .map(r => (r.getString(r.fieldIndex("lang")),
        r.getLong(r.fieldIndex("k_used")),
        r.getDouble(r.fieldIndex("est_distinct")))).toSet
    val batch = graft.ext.TextAnalysis
      .kmvCardinality(docs, k = 64).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("k_used"),
        r.getAs[Double]("est_distinct"))).toSet
    graft.std.Materialize.releaseAll()
    assert(last == batch,
      s"streaming sketch diverged: $last vs $batch")
  }

  test("streaming weighted sample: micro-batched ≡ batch stratified draw") {
    val sfDir = "/root/testdata/sf0.001"
    val orders = Tables.orders(spark, sfDir)
    val stage = Files.createTempDirectory("wsamp_src").toString
    // three files → three micro-batches; top-n of top-ns must equal
    // the one-pass top-n regardless of the split
    orders.repartition(3).write.mode("overwrite").parquet(stage)
    val streamIn = spark.readStream.schema(orders.schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
    val q = StreamingOps.weightedSampleStream(streamIn, "o_orderpriority",
        "o_orderkey", "o_totalprice", nPerGroup = 15)
      .writeStream.format("memory").queryName("wsamp_stream")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    // n_seen is cumulative per group: its max tags the final sample
    val perG = org.apache.spark.sql.expressions.Window.partitionBy("g")
    val last = spark.table("wsamp_stream")
      .withColumn("_mx", max(col("n_seen")).over(perG))
      .filter(col("n_seen") === col("_mx"))
      .collect()
      .map(r => (r.getString(r.fieldIndex("g")),
        r.getLong(r.fieldIndex("id")),
        r.getDouble(r.fieldIndex("w")),
        r.getDouble(r.fieldIndex("sample_key")))).toSet
    val batch = graft.std.Sampling.stratifiedWeightedSample(orders,
        "o_orderpriority", "o_orderkey", "o_totalprice", 15)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSet
    assert(last == batch, s"standing sample diverged from batch")
  }

  test("streaming CMS grid equals the batch grid (bounded state)") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sfDir)
    val batchGrid = graft.ext.TextAnalysis.cmsCellsOfDocs(docs)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val stage = Files.createTempDirectory("cms_src").toString
    docs.repartition(3).write.mode("overwrite").parquet(stage)
    val streamIn = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
    // complete mode: the sink always holds the whole (<= 4096-cell) grid
    val q = graft.ext.TextAnalysis.cmsCellsOfDocs(streamIn)
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamGrid = spark.table("cms_stream")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamGrid == batchGrid,
      s"grids differ: ${streamGrid.size} vs ${batchGrid.size} cells")
  }

  test("resample plan applies identically to batch and stream") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sfDir)
    // plan once on the snapshot; enforcement must be order-independent
    val plan = graft.ext.TextAnalysis.temperatureResample(docs)
    val batchKept = graft.ext.TextAnalysis
      .applyResamplePlan(docs, plan)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchKept.nonEmpty && batchKept.size < 500,
      s"degenerate resample: kept ${batchKept.size} of 500")
    val stage = Files.createTempDirectory("resample_src").toString
    docs.repartition(3).write.mode("overwrite").parquet(stage)
    val streamIn = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
    val q = graft.ext.TextAnalysis.applyResamplePlan(streamIn, plan)
      .select("doc_id")
      .writeStream.format("memory").queryName("resample_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamKept = spark.table("resample_stream")
      .collect().map(_.getLong(0)).toSet
    graft.std.Materialize.releaseAll()
    assert(streamKept == batchKept,
      "stream-applied plan diverged from batch application")
  }

  test("stateless curation gates apply identically to batch and stream") {
    // piiRedact / gopherRules / encodeDocsPartitioned are pure per-row
    // transforms — the streaming form IS the batch function on a
    // streaming frame. This pins that: same rows out, any micro-batch
    // partitioning (maxFilesPerTrigger=1 over 3 files).
    val sfDir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sfDir)
    val stage = Files.createTempDirectory("gates_src").toString
    docs.repartition(3).write.mode("overwrite").parquet(stage)
    def streamIn = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
    def run(name: String, f: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame): Set[String] = {
      val q = f(streamIn).writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      spark.table(name).collect().map(_.mkString("|")).toSet
    }
    val redact = (d: org.apache.spark.sql.DataFrame) =>
      graft.ext.TextAnalysis.piiRedact(d)
    val gopher = (d: org.apache.spark.sql.DataFrame) =>
      graft.ext.TextAnalysis.gopherRules(d)
    val encode = (d: org.apache.spark.sql.DataFrame) =>
      graft.ext.Bpe.encodeDocsPartitioned(d, graft.ext.Bpe.DemoMerges)
    assert(run("gate_pii", redact) ==
      redact(docs).collect().map(_.mkString("|")).toSet)
    assert(run("gate_gopher", gopher) ==
      gopher(docs).collect().map(_.mkString("|")).toSet)
    assert(run("gate_bpe", encode) ==
      encode(docs).collect().map(_.mkString("|")).toSet)
  }

  test("source report streams in complete mode with bounded state") {
    // the curation health monitor: the SAME sourceReport aggregation
    // runs on a micro-batched stream — state is one row per source
    // (bounded by |sources|, not the corpus), and the completed report
    // equals the batch report bit-for-bit.
    val sfDir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sfDir)
    val stage = Files.createTempDirectory("report_src").toString
    docs.repartition(3).write.mode("overwrite").parquet(stage)
    val streamIn = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
    val q = graft.ext.TextAnalysis.sourceReport(streamIn)
      .writeStream.format("memory").queryName("report_stream")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("report_stream")
      .collect().map(_.mkString("|")).toSet
    val batch = graft.ext.TextAnalysis.sourceReport(docs)
      .collect().map(_.mkString("|")).toSet
    assert(streamed == batch,
      "streamed complete-mode report diverged from the batch report")
  }

  test("anomaly monitor: stream verdicts equal batch on closed hours") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val events = Tables.events(spark, sfDir)
    // the batch operator scores every full-history hour including each
    // key's final one; a monitor never scores an hour still in flight,
    // so the comparable domain is hours strictly before each key's max
    val lastHour = events.groupBy(col("event_type").as("k"))
      .agg(max(date_trunc("hour", col("ts"))).as("last_hour"))
    val expected = graft.ext.Timeseries.hourlyAnomalies(events)
      .join(lastHour, col("key") === col("k") &&
        col("hour") < col("last_hour"))
      .drop("k", "last_hour")
      .collect().map(_.mkString("|")).toSet

    // batch-mode execution of the stateful op: arithmetic parity
    val batchRun = StreamingOps.anomalyStream(events)
      .collect().map(r => Seq(r.key, r.hour, r.n, r.trailing_mean,
        r.zscore.map(_.toString).orNull, r.is_anomaly).mkString("|")).toSet
    assert(batchRun == expected,
      s"batch-mode anomalyStream diverged: ${batchRun.size} vs ${expected.size}")

    // real micro-batched stream: chronological file chunks (sequential
    // writes -> increasing mod times, the file source's replay order)
    val stage = Files.createTempDirectory("anomaly_src").toString
    val sorted = events.orderBy("ts").withColumn(
      "chunk", ntile(3).over(
        org.apache.spark.sql.expressions.Window.orderBy("ts")))
    (1 to 3).foreach { c =>
      sorted.filter(col("chunk") === c).drop("chunk")
        .coalesce(1).write.mode("append").parquet(stage)
      Thread.sleep(20)
    }
    val streamIn = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
    val q = StreamingOps.anomalyStream(streamIn)
      .writeStream.format("memory").queryName("anomaly_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("anomaly_stream")
      .collect().map(_.mkString("|")).toSet
    assert(streamed == expected,
      s"streamed anomaly verdicts diverged: ${streamed.size} vs ${expected.size}")
  }

  test("streaming bloom dedup: never forgets, matches a local replay") {
    import spark.implicits._
    val m = 1 << 16; val k = 4; val shards = 8
    val b1 = (1L to 200L).map(i => (i, s"alpha text number $i"))
    val dupOfB1 = (1001L to 1100L).map(i => (i, s"alpha text number ${i - 1000}"))
    val fresh = (2001L to 2100L).map(i => (i, s"omega fresh text $i"))
    val b2 = dupOfB1 ++ fresh

    val stage = Files.createTempDirectory("bloom_src").toString
    b1.toDF("doc_id", "text").write.mode("overwrite").parquet(stage)
    val schema = spark.read.parquet(stage).schema
    val streamIn = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
    val q = StreamingOps.bloomDedupStream(streamIn, m, k, shards)
      .writeStream.format("memory").queryName("bloom_dedup")
      .outputMode("append").start()
    try {
      q.processAllAvailable() // batch 1 fully folded into state…
      b2.toDF("doc_id", "text").write.mode("append").parquet(stage)
      q.processAllAvailable() // …before any batch-2 file arrives
    } finally q.stop()
    val got = spark.table("bloom_dedup").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap

    // local replay with the operator's own kernels: same hashes, same
    // shard split, same per-batch doc_id order → exact expected output,
    // false positives included
    val hashOf = (b1 ++ b2).toDF("doc_id", "text")
      .select(col("doc_id"), graft.ext.TextOps.hash64(
        graft.ext.TextOps.normText(col("text"))).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val filters = Array.fill(shards)(new Array[Byte](m / 8))
    val expected = scala.collection.mutable.Map.empty[Long, Boolean]
    Seq(b1, b2).foreach { batch =>
      batch.map(_._1).groupBy(id => (hashOf(id) % shards).toInt)
        .foreach { case (shard, ids) =>
          ids.sorted.foreach { id =>
            val h = hashOf(id)
            val seen = graft.functions.BloomBits.contains(filters(shard), h, m, k)
            if (!seen) graft.functions.BloomBits.set(filters(shard), h, m, k)
            expected(id) = seen
          }
        }
    }
    assert(got == expected.toMap)
    // one-sided semantics on top of the exact replay: every true dup
    // flagged, fresh content almost never (fp rate ~0.1% at this load)
    assert(dupOfB1.forall { case (id, _) => got(id) })
    assert(fresh.count { case (id, _) => got(id) } < 5)
  }

  test("bloom dedup on a batch frame flags intra-batch duplicates") {
    import spark.implicits._
    val docs = Seq((1L, "same text"), (2L, "other text"), (3L, "same text"))
      .toDF("doc_id", "text")
    val got = StreamingOps.bloomDedupStream(docs).collect()
      .map(r => r.doc_id -> r.probably_seen).toMap
    assert(got == Map(1L -> false, 2L -> false, 3L -> true))
  }

  test("url dedup stream: raw variants of one canonical address collide") {
    import spark.implicits._
    val docs = Seq(
      (1L, "https://A.ex/x/?utm_source=s#frag"),  // canonical https://a.ex/x
      (2L, "https://a.ex/x"),                     // same address -> seen
      (3L, "https://a.ex/y"),                     // different path -> fresh
      (4L, null: String),                         // null url: empty key
      (5L, null: String))                         // second null -> seen
      .toDF("doc_id", "url")
    val got = StreamingOps.urlDedupStream(docs).collect()
      .map(r => r.doc_id -> r.probably_seen).toMap
    assert(got == Map(1L -> false, 2L -> true, 3L -> false,
      4L -> false, 5L -> true))
  }

  test("url dedup stream accumulates across micro-batches") {
    import spark.implicits._
    val stage = java.nio.file.Files
      .createTempDirectory("url_dedup_stage").toString
    Seq((1L, "http://h.ex:80/p?utm_a=1"))
      .toDF("doc_id", "url").write.mode("append").parquet(stage)
    val schema = spark.read.parquet(stage).schema
    val streamIn = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
    val q = StreamingOps.urlDedupStream(streamIn)
      .writeStream.format("memory").queryName("url_dedup")
      .outputMode("append").start()
    try {
      q.processAllAvailable() // batch 1 folded into state…
      Seq((2L, "http://h.ex/p"), (3L, "http://h.ex/q"))
        .toDF("doc_id", "url").write.mode("append").parquet(stage)
      q.processAllAvailable() // …before batch 2 arrives
    } finally q.stop()
    val got = spark.table("url_dedup").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // :80 + utm param normalize to batch-2's bare form -> 2 is seen
    assert(got == Map(1L -> false, 2L -> true, 3L -> false))
  }

  test("attribution join: stream-stream run equals the batch interval join") {
    import spark.implicits._
    val base = java.time.Instant.parse("2024-06-01T10:00:00Z")
    def ts(min: Int) = java.sql.Timestamp.from(base.plusSeconds(min * 60L))
    val views = Seq(
      (1L, 10L, ts(0)), (1L, 11L, ts(30)),   // both within u1's purchase hour
      (2L, 20L, ts(0)),                       // u2: purchase 2h later - no match
      (3L, 30L, ts(5)))                       // u3: no purchase at all
      .toDF("user_id", "event_id", "ts")
    val purchases = Seq(
      (1L, 90L, ts(45)), (2L, 91L, ts(125)))
      .toDF("user_id", "event_id", "ts")

    val batch = StreamingOps.attributionJoin(views, purchases).collect()
      .map(r => (r.getLong(1), r.getLong(3))).toSet
    assert(batch == Set((10L, 90L), (11L, 90L)))

    val stage = java.nio.file.Files
      .createTempDirectory("attr_join_stage").toString
    views.withColumn("event_type", lit("view"))
      .unionByName(purchases.withColumn("event_type", lit("purchase")))
      .write.mode("overwrite").parquet(stage)
    val schema = spark.read.parquet(stage).schema
    val streamIn = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
    val q = StreamingOps.attributionJoin(
        streamIn.filter(col("event_type") === "view"),
        streamIn.filter(col("event_type") === "purchase"))
      .writeStream.format("memory").queryName("attr_join")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("attr_join").collect()
      .map(r => (r.getLong(1), r.getLong(3))).toSet
    assert(streamed == batch, "stream-stream result diverged from batch")
  }

  test("attribution credit: first/last flags and linear split by hand") {
    import spark.implicits._
    val base = java.time.Instant.parse("2024-06-01T10:00:00Z")
    def ts(min: Int) = java.sql.Timestamp.from(base.plusSeconds(min * 60L))
    // purchase 90 has touches 10 (t0), 11 (t30); purchase 91 has one
    val pairs = Seq(
      (1L, 10L, ts(0), 90L, ts(45)),
      (1L, 11L, ts(30), 90L, ts(45)),
      (2L, 20L, ts(0), 91L, ts(10)))
      .toDF("user_id", "from_id", "from_ts", "to_id", "to_ts")
    val out = StreamingOps.attributionCredit(pairs).collect()
      .map(r => r.getLong(r.fieldIndex("from_id")) ->
        ((r.getLong(r.fieldIndex("n_touches")),
          r.getBoolean(r.fieldIndex("is_first")),
          r.getBoolean(r.fieldIndex("is_last")),
          r.getDouble(r.fieldIndex("linear_credit"))))).toMap
    assert(out(10L) == ((2L, true, false, 0.5)))
    assert(out(11L) == ((2L, false, true, 0.5)))
    assert(out(20L) == ((1L, true, true, 1.0)))
  }

  test("bloom dedup survives null-text documents (hashes as empty, t28 rule)") {
    import spark.implicits._
    // a null-text crawl record must not kill the forever-running stream:
    // hash64(normText(null)) is null and BloomedDoc.h is non-nullable —
    // the operator coalesces to "" first, so nulls dedup against empty
    val docs = Seq((1L, null: String), (2L, "real text"), (3L, null: String),
      (4L, "")).toDF("doc_id", "text")
    val got = StreamingOps.bloomDedupStream(docs).collect()
      .map(r => r.doc_id -> r.probably_seen).toMap
    assert(got == Map(1L -> false, 2L -> false, 3L -> true, 4L -> true))
  }

  test("ewma points: stateful batch form ≡ the x53 collect_list fold") {
    val sfDir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, sfDir)
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getDate(1)) -> r.toSeq.drop(2)).toMap
    val stateful = keyed(graft.ext.Timeseries.ewmaVerdicts(
      StreamingOps.ewmaPoints(
        graft.ext.Timeseries.dailySeries(ev)).toDF()))
    val window = keyed(graft.ext.Timeseries.ewmaBaseline(ev))
    assert(stateful == window && stateful.nonEmpty)
  }

  test("streaming ewma: the fold state carries across micro-batches") {
    import spark.implicits._
    def d(s: String, day: String, n: Long, v: Long) =
      (s, java.sql.Date.valueOf(day), n, v)
    val dir = Files.createTempDirectory("ewma_src").toFile
    def stamp(m: Long): Unit = dir.listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.lastModified() > m)
      .foreach(f => assert(f.setLastModified(m)))
    // micro-batch 1: series "a" seeds at 10M then folds 20M -> 13M
    Seq(d("a", "2024-01-01", 2L, 10000000L),
        d("a", "2024-01-02", 1L, 20000000L))
      .toDF("series", "day", "n_events", "value_micro")
      .coalesce(1).write.mode("append").parquet(dir.toString)
    stamp(1000000L)
    // micro-batch 2: day 3 folds against the STORED 13M state:
    // (3*33M + 7*13M) div 10 = 19M; series "b" seeds fresh
    Seq(d("a", "2024-01-03", 1L, 33000000L),
        d("b", "2024-01-03", 1L, 5000000L))
      .toDF("series", "day", "n_events", "value_micro")
      .coalesce(1).write.mode("append").parquet(dir.toString)
    stamp(2000000L)
    val streamIn = spark.readStream
      .schema("series STRING, day DATE, n_events LONG, value_micro LONG")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
    val q = StreamingOps.ewmaPoints(streamIn)
      .writeStream.format("memory").queryName("ewma_points")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ewma_points").collect()
        .map(r => (r.getString(0), r.getDate(1).toString,
          r.getLong(4))).sorted.toSeq
      assert(got == Seq(
        ("a", "2024-01-01", 10000000L),
        ("a", "2024-01-02", 13000000L),
        ("a", "2024-01-03", 19000000L),
        ("b", "2024-01-03", 5000000L)), s"got $got")
    } finally q.stop()
  }

  test("holt points: stateful batch form ≡ the x68 prefix fold") {
    val sfDir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, sfDir)
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getDate(1)) -> r.toSeq.drop(2)).toMap
    val stateful = keyed(graft.ext.Timeseries.holtDisplay(
      StreamingOps.holtPoints(
        graft.ext.Timeseries.holtDaily(ev)).toDF()))
    val window = keyed(graft.ext.Timeseries.holtTrend(ev))
    assert(stateful == window && stateful.nonEmpty)
  }

  test("streaming holt: state carries across micro-batches and the " +
    "trend survives negative on a decline") {
    import spark.implicits._
    def d(s: String, day: String, n: Long, v: Long) =
      (s, java.sql.Date.valueOf(day), n, v)
    val dir = Files.createTempDirectory("holt_src").toFile
    def stamp(m: Long): Unit = dir.listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.lastModified() > m)
      .foreach(f => assert(f.setLastModified(m)))
    // micro-batch 1: "a" seeds (300M, 0) then folds the 250M decline:
    // l = (750M + 7*300M) div 10 = 285M, b = floor(2*(-15M)/10) = -3M
    Seq(d("a", "2024-01-01", 1L, 300000000L),
        d("a", "2024-01-02", 1L, 250000000L))
      .toDF("series", "day", "n_events", "value_micro")
      .coalesce(1).write.mode("append").parquet(dir.toString)
    stamp(1000000L)
    // micro-batch 2: day 3 folds against the STORED (285M, -3M):
    // l = (3*200M + 7*282M) div 10 = 257.4M,
    // b = floor((2*(257.4M-285M) + 8*(-3M))/10) = floor(-79.2M/10)
    //   = -7.92M; forecast = 285M - 3M = 282M
    Seq(d("a", "2024-01-03", 1L, 200000000L))
      .toDF("series", "day", "n_events", "value_micro")
      .coalesce(1).write.mode("append").parquet(dir.toString)
    stamp(2000000L)
    val streamIn = spark.readStream
      .schema("series STRING, day DATE, n_events LONG, value_micro LONG")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
    val q = StreamingOps.holtPoints(streamIn)
      .writeStream.format("memory").queryName("holt_points")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("holt_points").collect()
        .map(r => (r.getDate(1).toString, r.getLong(4), r.getLong(5),
          if (r.isNullAt(6)) -1L else r.getLong(6))).sorted.toSeq
      assert(got == Seq(
        ("2024-01-01", 300000000L, 0L, -1L),
        ("2024-01-02", 285000000L, -3000000L, 300000000L),
        ("2024-01-03", 257400000L, -7920000L, 282000000L)), s"got $got")
    } finally q.stop()
  }

  test("frozen-index assignment: micro-batched stream equals the " +
    "batch form — stateless serving, no stream-side shuffle") {
    // the s29 serving path: train once (write time), then the SAME
    // indexAssign code runs over arriving vector micro-batches
    // against the frozen broadcast codebooks — append mode, no
    // state, no watermark, each batch independent
    val sfDir = "/root/testdata/sf0.001"
    val vecs = Tables.embeddings(spark, sfDir)
    val trainSet = vecs.filter(col("vec_id") % 5 =!= 4)
    def cbOf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("cluster_id").as("_cw"), col("dim").as("_dim"),
        col("centroid").as("_c"))
    val cellCb = graft.std.Materialize.once(cbOf(
      graft.ext.Similarity.kmeansTrain(trainSet, 4, 2, subspaces = 1,
        seedTag = "km")))
    val pqCb = graft.std.Materialize.once(cbOf(
      graft.ext.Similarity.kmeansTrain(trainSet, 8, 2, subspaces = 4,
        seedTag = "pq")))
    val arriving = vecs.filter(col("vec_id") % 5 === 4)
    val expected = graft.ext.Similarity
      .indexAssign(arriving, cellCb, pqCb, 4)
      .collect().map(_.toSeq).toSet
    assert(expected.nonEmpty)
    val stage = Files.createTempDirectory("assign_src").toString
    arriving.repartition(3).write.mode("overwrite").parquet(stage)
    val streamIn = spark.readStream
      .schema(arriving.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage)
    val q = graft.ext.Similarity
      .indexAssign(streamIn, cellCb, pqCb, 4)
      .writeStream.format("memory").queryName("assign_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("assign_stream").collect()
        .map(_.toSeq).toSet
      assert(got == expected,
        s"stream/batch divergence: ${got.size} vs ${expected.size}")
    } finally {
      q.stop()
      graft.std.Materialize.releaseAll()
    }
  }
}
