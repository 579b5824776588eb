package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Fuzzy record linkage: best-match semantics, null handling, and the
  * length-bucket blocking completeness proof (blocked ≡ all-pairs).
  */
class LinkageSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val catalog = Seq(
    "red bolt", "old bolt", "red widget", "small ring", "red bolt")
    .toDF("name") // dup "red bolt" must dedup before blocking

  test("best match: min distance wins, ties break on name ascending") {
    val probes = Seq(
      (1L, "red bolt"),   // exact: dist 0 beats "old bolt" at 2
      (2L, "rld bolt"),   // dist 1 to BOTH red/old bolt -> "old bolt" (asc)
      (3L, "zzzzzzzzzzz"),// nothing within 2 -> unmatched, null columns
      (4L, null)          // null probe: reported, never matched
    ).toDF("probe_id", "probe_name")
    val out = Linkage.fuzzyBestMatch(probes, catalog,
        "probe_id", "probe_name", "name", maxDist = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size == 4)
    assert(out(1L).getString(2) == "red bolt" && out(1L).getInt(3) == 0)
    assert(out(2L).getString(2) == "old bolt" && out(2L).getInt(3) == 1)
    assert(out(3L).isNullAt(2) && out(3L).isNullAt(3))
    assert(out(4L).isNullAt(2) && out(4L).isNullAt(3))
  }

  test("blocking is complete: blocked pairs equal the all-pairs filter") {
    // strings spanning many length buckets, incl. cross-bucket pairs
    // (lengths differing by exactly maxDist around bucket boundaries)
    val names = (1 to 40).map(i => "n" * (i % 13 + 2) + (i % 7).toString)
    val cat = names.toDF("name")
    val probes = names.zipWithIndex
      .map { case (s, i) => (i.toLong, s.drop(1) + "q") }
      .toDF("probe_id", "probe_name")
    val blocked = Linkage.fuzzyPairs(probes, cat,
        "probe_id", "probe_name", "name", maxDist = 2)
      .select("probe_id", "matched_name", "dist").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val brute = probes.crossJoin(cat.distinct())
      .withColumn("dist", levenshtein(col("probe_name"), col("name")))
      .filter(col("dist") <= 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(2), r.getInt(3))).toSet
    assert(blocked == brute, "length-bucket blocking dropped a pair")
    assert(brute.nonEmpty)
  }

  test("catalog side dedups and the bucket join broadcasts it") {
    val probes = Seq((1L, "red bolt")).toDF("probe_id", "probe_name")
    val frame = Linkage.fuzzyBestMatch(probes, catalog,
      "probe_id", "probe_name", "name", maxDist = 2)
    frame.collect()
    val bcasts = graft.std.Plans.collect(frame) {
      case e: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => e
    }.length
    assert(bcasts >= 1, "dimension-sized catalog should broadcast")
  }
}
