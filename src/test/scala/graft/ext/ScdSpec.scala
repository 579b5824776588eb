package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** SCD2 interval build on a hand-written observation log. */
class ScdSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def t(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")

  test("consecutive repeats collapse; changes close half-open intervals") {
    val log = Seq(
      ("A", "v1", t(0), 1L), ("A", "v1", t(1), 2L), // repeat collapses
      ("A", "v2", t(2), 3L),                        // change
      ("A", "v1", t(3), 4L),                        // change BACK: new row
      ("B", "solo", t(5), 5L))
      .toDF("k", "v", "ts", "id")
    val out = Scd.scd2FromLog(log, "k", "v", "ts", "id").collect()
      .map(r => (r.getString(0), r.getLong(2)) ->
        ((r.getString(1), r.getTimestamp(3), Option(r.getTimestamp(4)),
          r.getBoolean(5)))).toMap
    assert(out == Map(
      ("A", 1L) -> (("v1", t(0), Some(t(2)), false)),
      ("A", 2L) -> (("v2", t(2), Some(t(3)), false)),
      ("A", 3L) -> (("v1", t(3), None, true)),
      ("B", 1L) -> (("solo", t(5), None, true))))
  }

  test("a NULL value is a real observed state, not a missing row") {
    val log = Seq(
      ("C", null.asInstanceOf[String], t(0), 1L),
      ("C", null.asInstanceOf[String], t(1), 2L), // null repeat collapses
      ("C", "v", t(2), 3L))
      .toDF("k", "v", "ts", "id")
    val out = Scd.scd2FromLog(log, "k", "v", "ts", "id").collect()
      .sortBy(_.getLong(2))
    assert(out.length == 2)
    assert(out(0).isNullAt(1) && out(0).getTimestamp(3) == t(0) &&
      out(0).getTimestamp(4) == t(2) && !out(0).getBoolean(5))
    assert(out(1).getString(1) == "v" && out(1).getBoolean(5))
  }

  test("observations without a timestamp have no place on the timeline") {
    val log = Seq(
      ("E", "v1", t(0), 1L),
      ("E", "v2", null.asInstanceOf[Timestamp], 2L), // dropped
      ("E", "v1", t(1), 3L))                         // still a repeat
      .toDF("k", "v", "ts", "id")
    val out = Scd.scd2FromLog(log, "k", "v", "ts", "id").collect()
    assert(out.length == 1)
    assert(out.head.getString(1) == "v1" && out.head.getBoolean(5))
  }

  test("same-instant observations resolve by the tiebreak column") {
    val log = Seq(
      ("D", "x", t(0), 2L), ("D", "y", t(0), 1L)) // y first by id
      .toDF("k", "v", "ts", "id")
    val out = Scd.scd2FromLog(log, "k", "v", "ts", "id").collect()
      .sortBy(_.getLong(2))
    assert(out.map(_.getString(1)).toSeq == Seq("y", "x"))
    assert(out(1).getBoolean(5) && !out(0).getBoolean(5))
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("incremental merge equals the full-log rebuild (hand case)") {
    val log1 = Seq(
      ("A", "v1", t(0), 1L), ("A", "v2", t(2), 2L), // A: two intervals
      ("B", "b1", t(1), 3L),                        // B: one, current
      ("C", "c1", t(1), 4L))                        // C: untouched later
      .toDF("k", "v", "ts", "id")
    val log2 = Seq(
      ("A", "v2", t(4), 5L),  // repeat of A's current: absorbs
      ("A", "v3", t(5), 6L),  // closes v2, opens v3
      ("B", "b2", t(6), 7L),  // closes b1
      ("D", "d1", t(6), 8L))  // brand-new key
      .toDF("k", "v", "ts", "id")
    val dim = Scd.scd2FromLog(log1, "k", "v", "ts", "id")
    val merged = Scd.scd2Merge(dim, log2, "k", "v", "ts", "id")
    val rebuilt = Scd.scd2FromLog(log1.union(log2), "k", "v", "ts", "id")
    assert(canon(merged) == canon(rebuilt))
  }

  test("incremental merge equals the full-log rebuild (event stream)") {
    val events = graft.sources.Tables.events(
      spark, "/root/testdata/sf0.001")
      .select(col("user_id").as("k"), col("event_type").as("v"),
        col("ts"), col("event_id").as("id"))
    val cut = Timestamp.valueOf("2024-01-20 00:00:00")
    val part1 = events.filter(col("ts") < cut)
    val part2 = events.filter(col("ts") >= cut)
    val merged = Scd.scd2Merge(
      Scd.scd2FromLog(part1, "k", "v", "ts", "id"),
      part2, "k", "v", "ts", "id")
    val rebuilt = Scd.scd2FromLog(events, "k", "v", "ts", "id")
    assert(canon(merged) == canon(rebuilt))
  }

  test("cdcApply: last-writer-wins upsert/delete; untouched keys pass") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("k", "v")
    val changes = Seq(
      (2L, "b2", 1L, "U"), (2L, "b3", 4L, "U"), // seq 4 wins
      (3L, "x", 2L, "U"), (3L, "x", 5L, "D"),   // delete outranks
      (4L, "d", 1L, "I"),                       // brand-new key
      (5L, "e", 1L, "U"))                       // update-as-upsert
      .toDF("k", "v", "seq", "op")
    val out = Scd.cdcApply(base, changes, "k")
    val got = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    graft.std.Materialize.releaseAll()
    assert(got == Map(1L -> "a", 2L -> "b3", 4L -> "d", 5L -> "e"))
  }

  test("cdcApply: replaying the same log is idempotent; null op deletes") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val changes = Seq((1L, "a2", 1L, "U"), (2L, null, 2L, null))
      .toDF("k", "v", "seq", "op")
    val once = Scd.cdcApply(base, changes, "k")
    val onceRows = once.collect().map(r =>
      r.getLong(0) -> r.getString(1)).toMap
    graft.std.Materialize.releaseAll()
    assert(onceRows == Map(1L -> "a2")) // null op degrades to delete
    val twice = Scd.cdcApply(
      Seq((1L, "a2")).toDF("k", "v"), changes, "k")
    val twiceRows = twice.collect().map(r =>
      r.getLong(0) -> r.getString(1)).toMap
    graft.std.Materialize.releaseAll()
    assert(twiceRows == onceRows)
  }

  test("cdcApply: base side anti-joins a BROADCAST key set (no base shuffle)") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val changes = Seq((1L, "a2", 1L, "U")).toDF("k", "v", "seq", "op")
    val plan = Scd.cdcApply(base, changes, "k")
      .queryExecution.executedPlan.toString
    graft.std.Materialize.releaseAll()
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftAnti"),
      s"expected broadcast left-anti join, got:\n$plan")
  }
}
