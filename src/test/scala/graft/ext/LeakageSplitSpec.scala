package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** d14 leakage-aware split: every member of a near-dup cluster lands
  * in its representative's split; the naive doc-keyed counterfactual
  * and the would-have-leaked flag are replayed against an independent
  * plain-Java md5 implementation of the shared 56-bit lane.
  */
class LeakageSplitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // independent replay of TextOps.hash64: first 56 bits of md5 (the
  // first 14 hex chars) as a non-negative long
  private def md5Lane(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    BigInt(1, d.take(7)).toLong
  }
  private def splitOf(key: Long): String = {
    val h = md5Lane(s"split|$key") % 100
    if (h < 90) "train" else if (h < 95) "val" else "test"
  }

  test("cluster members inherit the rep's split; leak flag replays") {
    // a leaky cluster: two ids whose DOC-keyed splits differ (found by
    // the replay, so the fixture can't rot), plus a same-split cluster
    // and a singleton
    val ids = (1L to 500L)
    val a = ids.find(i => splitOf(i) == "train").get
    val b = ids.find(i => splitOf(i) == "test").get
    val c = ids.find(i => splitOf(i) == "train" && i != a).get
    val clusters = Seq(
      (a, a), (b, a), // leaky: naive would put b in test, a in train
      (c, c), (ids.find(i =>
        splitOf(i) == splitOf(c) && i != c && i != a && i != b).get, c),
      (499L, 499L)) // singleton
      .toDF("doc_id", "cluster_rep")
    val got = Dedup.leakageSafeSplit(clusters).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2),
        r.getString(3), r.getBoolean(4)))).toMap
    // every member carries the REP's split, never its own
    assert(got(b)._2 == splitOf(a), s"member follows rep: $got")
    assert(got.forall { case (_, (rep, split, _, _)) =>
      split == splitOf(rep) }, s"split replay: $got")
    // naive counterfactual replays the doc-keyed lane
    assert(got.forall { case (doc, (_, _, naive, _)) =>
      naive == splitOf(doc) }, s"naive replay: $got")
    // leak flag: true exactly where members' naive splits differ
    assert(got(a)._4 && got(b)._4, s"leaky cluster flagged: $got")
    assert(!got(c)._4, s"same-split cluster not flagged: $got")
    assert(!got(499L)._4, "a singleton can never leak")
  }

  test("a NULL cluster_rep becomes a singleton, never a dropped doc") {
    // r17 advice: the join back is an equi-join on cluster_rep, and
    // NULL keys never match — a malformed upstream frame used to lose
    // the document from the split silently. Now it coalesces to the
    // doc's own id (a singleton cluster).
    val clusters = Seq((1L, Some(2L)), (2L, Some(2L)), (7L, None))
      .toDF("doc_id", "cluster_rep")
    val got = Dedup.leakageSafeSplit(clusters).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2),
        r.getBoolean(4)))).toMap
    assert(got.keySet == Set(1L, 2L, 7L), s"no doc dropped: $got")
    assert(got(7L)._1 == 7L, "null rep coalesces to the doc's own id")
    assert(got(7L)._2 == splitOf(7L), "singleton splits on its own lane")
    assert(!got(7L)._3, "a singleton can never leak")
  }

  test("proportions over singletons match the replayed lane exactly") {
    val n = 1000L
    val clusters = (1L to n).map(i => (i, i)).toDF("doc_id", "cluster_rep")
    val got = Dedup.leakageSafeSplit(clusters).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val expected = (1L to n).map(i => i -> splitOf(i)).toMap
    assert(got == expected)
    // and the buckets are all non-empty at this n (sanity on the lane)
    assert(Set("train", "val", "test").subsetOf(got.values.toSet))
  }
}
