package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** t80 content-defined chunk dedup: differential against a plain-Scala
  * replay of the CDC contract on seeded random colliding corpora, the
  * t80 ⊆ t77 under-approximation property (a duplicated ≥ L-token
  * segment contains duplicated L-windows, so CDC can only remove what
  * the every-offset kernel also removes), the alignment-free shared-
  * segment case with hand-placed anchors, and the fingerprint-count
  * economy claim.
  */
class CdcSegmentDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val L = 3   // min segment tokens
  private val K = 3   // anchor rate (1/K of the lane)

  private def md5Lane(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    BigInt(1, d.take(7)).toLong
  }
  private def isAnchor(tok: String): Boolean =
    md5Lane(s"cdc|$tok") % K == 0

  /** Plain-Scala replay: anchors open segments, runs between anchors
    * are segments, participating iff length >= L, dup iff the token
    * SEQUENCE recurs corpus-wide, removed positions = union of dup
    * segment intervals (merged when contiguous).
    */
  private def replay(docs: Seq[(Long, String)])
      : Map[Long, (String, Long, Long, Long)] = {
    def toks(s: String): Vector[String] =
      s.toLowerCase.trim.replaceAll("\\s+", " ").split(" ", -1).toVector
    val tokd = docs.map { case (id, t) =>
      id -> toks(Option(t).getOrElse(""))
    }
    val segs = tokd.flatMap { case (id, ts) =>
      val bounds = ts.zipWithIndex.foldLeft(Vector.empty[(Int, Int)]) {
        case (acc, (tok, i)) =>
          val p = i + 1
          if (acc.isEmpty || isAnchor(tok)) acc :+ ((p, p))
          else acc.init :+ ((acc.last._1, p))
      }
      bounds.map { case (s0, e0) => (id, s0, e0, ts.slice(s0 - 1, e0)) }
    }.filter { case (_, s0, e0, _) => e0 - s0 + 1 >= L }
    val occ = segs.groupBy(_._4).map { case (k2, xs) => k2 -> xs.length }
    tokd.map { case (id, ts) =>
      val dupPos = segs.collect {
        case (d, s0, e0, key) if d == id && occ(key) > 1 =>
          (s0 to e0)
      }.flatten.distinct.sorted
      val islands = dupPos.foldLeft(Vector.empty[(Int, Int)]) {
        case (acc, p) =>
          if (acc.nonEmpty && p <= acc.last._2 + 1)
            acc.init :+ ((acc.last._1, p))
          else acc :+ ((p, p))
      }
      val kept = (1 to ts.length).filterNot(p =>
        islands.exists(iv => p >= iv._1 && p <= iv._2))
      id -> ((kept.map(p => ts(p - 1)).mkString(" "),
        ts.length.toLong, islands.length.toLong,
        islands.map(iv => iv._2 - iv._1 + 1).sum.toLong))
    }.toMap
  }

  private def corpus(seed: Long, nDocs: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    (1 to nDocs).map { i =>
      val n = 1 + rnd.nextInt(16)
      i.toLong -> Vector.fill(n)(vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")
    }
  }

  test("pipeline ≡ plain-Scala replay on seeded random colliding corpora") {
    for (seed <- Seq(5L, 23L, 71L)) {
      val docs = corpus(seed, 24)
      val got = TextAnalysis.cdcSegmentDedup(docs.toDF("doc_id", "text"),
        minTokens = L, avgSegTokens = K).collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))).toMap
      assert(got == replay(docs), s"seed $seed diverged")
    }
  }

  test("t80 is an under-approximation of t77: clean_t77 ⊆ clean_t80") {
    // every dup CDC segment of >= L tokens is a verbatim recurring
    // substring, so t77 at the same L removes those positions too —
    // t77's kept positions are a subset, i.e. its clean text is an
    // in-order subsequence of t80's
    for (seed <- Seq(5L, 23L, 71L)) {
      val docs = corpus(seed, 24).toDF("doc_id", "text")
      val cdc = TextAnalysis.cdcSegmentDedup(docs,
        minTokens = L, avgSegTokens = K).collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(4)))).toMap
      val span = TextAnalysis.spanDedup(docs, minTokens = L).collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(4)))).toMap
      def isSubseq(a: Seq[String], b: Seq[String]): Boolean = {
        var i = 0
        b.foreach { t => if (i < a.length && a(i) == t) i += 1 }
        i == a.length
      }
      cdc.keys.foreach { id =>
        assert(cdc(id)._2 <= span(id)._2,
          s"doc $id: CDC removed more than t77: ${cdc(id)} ${span(id)}")
        val c77 = span(id)._1.split(" ").filter(_.nonEmpty).toSeq
        val c80 = cdc(id)._1.split(" ").filter(_.nonEmpty).toSeq
        assert(isSubseq(c77, c80),
          s"doc $id: t77 clean not a subsequence of t80 clean")
      }
    }
  }

  test("alignment-free: a shared anchored segment goes from both docs") {
    // hand-verified anchor/non-anchor tokens: the shared run's HEAD
    // [f0, f1] carries no anchor, so it fuses into each doc's unique
    // prefix segment (different content per doc → kept — the CDC
    // boundary-granularity trade); the segment opened by the run's
    // anchor [a, f2, f3] is identical in both docs REGARDLESS of the
    // different-length prefixes → removed from both (alignment-free)
    val pool = (1 to 2000).map(i => s"w$i")
    val anchor = pool.filter(isAnchor).head
    val fillers = pool.filterNot(isAnchor).take(8)
    assume(fillers.length == 8)
    val run = Seq(fillers(0), fillers(1), anchor, fillers(2), fillers(3))
    val a = 1L -> (Seq(fillers(4)) ++ run).mkString(" ")
    val b = 2L -> (Seq(fillers(5), fillers(6), fillers(7)) ++ run)
      .mkString(" ")
    val got = TextAnalysis.cdcSegmentDedup(Seq(a, b).toDF("doc_id", "text"),
      minTokens = L, avgSegTokens = K).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(4)))).toMap
    for (id <- Seq(1L, 2L)) {
      assert(got(id)._2 == 3L, s"doc $id: anchored segment removed: $got")
      assert(!got(id)._1.contains(anchor), "anchor token removed too")
      assert(got(id)._1.contains(fillers(1)),
        "prefix-fused partial chunk kept (the documented trade)")
    }
  }

  test("incremental ≡ full rebuild restricted to increment docs") {
    // segment boundaries are per-doc content-defined, so an increment
    // doc's segments ARE the rebuild's; totals = inc + standing index.
    // Differential on seeded random colliding corpora, plus a verbatim
    // standing copy whose shared segments only the INDEX can flag
    // (each side sees them once).
    for (seed <- Seq(5L, 71L)) {
      val standing = corpus(seed, 24)
      val fresh = corpus(seed + 500, 8)
        .map { case (id, t) => (id + 100L, t) }
      val donor = standing.filter(_._2.split(" ").length >= 12).head
      val inc = fresh :+ (150L -> donor._2)
      val idx = TextAnalysis.cdcSegmentIndex(
        standing.toDF("doc_id", "text"), minTokens = L, avgSegTokens = K)
      val got = TextAnalysis.cdcSegmentDedupIncrement(
        inc.toDF("doc_id", "text"), idx,
        minTokens = L, avgSegTokens = K).collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))).toMap
      val full = TextAnalysis.cdcSegmentDedup(
        (standing ++ inc).toDF("doc_id", "text"),
        minTokens = L, avgSegTokens = K)
        .filter(org.apache.spark.sql.functions.col("doc_id") > 100L)
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))).toMap
      assert(got == full, s"seed $seed: incremental diverged from rebuild")
    }
  }

  test("economy: participating fingerprints ≈ tokens/K, and nulls survive") {
    val docs = corpus(99L, 40) :+ (999L -> (null: String))
    val rows = TextAnalysis.cdcSegmentDedup(docs.toDF("doc_id", "text"),
      minTokens = L, avgSegTokens = K).collect()
    assert(rows.length == docs.length, "every doc survives")
    val nullDoc = rows.find(_.getLong(0) == 999L).get
    assert(nullDoc.getString(1) == "" && nullDoc.getLong(2) == 1L &&
      nullDoc.getLong(3) == 0L && nullDoc.getLong(4) == 0L)
    rows.filter(_.getLong(0) != 999L).foreach { r =>
      val (clean, n, spans, removed) =
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val keptCount = if (clean.isEmpty) 0L else clean.split(" ").length
      assert(keptCount + removed == n, s"token conservation: $r")
      assert(removed >= spans * L, s"each island >= L tokens: $r")
    }
  }
}
