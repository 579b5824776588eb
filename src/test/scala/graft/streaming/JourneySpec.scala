package graft.streaming

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Journeys: session splits, depth cut, tie-pinned in-session order,
  * and the deterministic top-k cut.
  */
class JourneySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(m: Int, s: Int = 0) =
    Timestamp.valueOf(f"2024-01-01 10:$m%02d:$s%02d")

  test("gap splits sessions; depth caps the path; ids pin ts ties") {
    val events = Seq(
      // user 1, session 1: four events (depth cut keeps 3); the two
      // at :01 tie on ts — event_id 11 < 12 must order b before c
      (1L, ts(0), 10L, "a"), (1L, ts(1), 11L, "b"),
      (1L, ts(1), 12L, "c"), (1L, ts(2), 13L, "d"),
      // user 1, session 2 after a 10-minute gap
      (1L, ts(12), 14L, "e"),
      // user 2: one two-event session
      (2L, ts(0), 20L, "a"), (2L, ts(1), 21L, "b"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val r = StreamingOps.topJourneys(events)
      .collect().map(x => x.getString(0) -> x.getLong(1))
    assert(r.toMap == Map("a>b>c" -> 1L, "e" -> 1L, "a>b" -> 1L))
    // cut order: count desc, journey asc
    assert(r.map(_._1).toSeq == Seq("a>b", "a>b>c", "e"))
  }

  test("streamed session journeys + batch rollup equal the batch form") {
    val sfDir = "/root/testdata/sf0.001"
    val batchEvents = graft.sources.Tables.events(spark, sfDir)
    val expected = StreamingOps.topJourneys(batchEvents)
      .collect().map(_.toSeq).toSet

    // sentinel event far in the future: in append mode a session only
    // emits once the watermark passes its end, so without this the
    // tail sessions never flush on a finite source
    val maxTs = batchEvents
      .agg(org.apache.spark.sql.functions.max("ts")).collect()(0)
      .getTimestamp(0)
    val sentinel = Seq((-1L, new Timestamp(maxTs.getTime + 86400000L),
      -1L, "zzz_sentinel")).toDF("user_id", "ts", "event_id", "event_type")
    val staged = batchEvents
      .select("user_id", "ts", "event_id", "event_type")
      .unionByName(sentinel)
    val stage = java.nio.file.Files.createTempDirectory("journey_src")
      .toString
    staged.write.mode("overwrite").parquet(stage)

    val streamIn = spark.readStream.schema(staged.schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
    val q = StreamingOps.sessionJourneys(
        streamIn.withWatermark("ts", "1 minute"))
      .writeStream.format("memory").queryName("journeys_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = StreamingOps.journeyRollup(
          spark.table("journeys_stream")
            .filter(!org.apache.spark.sql.functions.col("journey")
              .startsWith("zzz_sentinel")))
        .collect().map(_.toSeq).toSet
      assert(got == expected,
        s"stream/batch journey divergence: ${got.size} vs ${expected.size}")
    } finally q.stop()
  }

  test("topK truncates after the pinned sort") {
    val events = (1 to 6).flatMap { u =>
      Seq((u.toLong, ts(0), u * 10L, s"t$u"))
    }.toDF("user_id", "ts", "event_id", "event_type")
    val r = StreamingOps.topJourneys(events, topK = 3)
      .collect().map(_.getString(0)).toSeq
    assert(r == Seq("t1", "t2", "t3"), "journey asc breaks the 1-1 tie")
  }
}
