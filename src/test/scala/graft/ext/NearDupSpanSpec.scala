package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** t79 near-duplicate span dedup. The adversarial case the operator
  * exists for: a duplicated span with ONE substituted token per copy
  * (per-feed tracking tokens, `_$i` suffixes) that t77's exact-window
  * kernel provably misses and t79 catches. Plus a full differential
  * against an independent plain-Scala replay of the leave-one-out
  * contract on seeded random colliding corpora, the superset-of-t77
  * property, and the accounting invariants.
  */
class NearDupSpanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val L = 4

  test("one-token-edited duplicated span: t77 misses it, t79 catches it") {
    // a 7-token syndicated run whose position 4 is a per-copy tracking
    // token, chosen so EVERY window of the run covers the tweak (L=4,
    // run windows at run-offsets 1..4 all contain position 4) — no
    // window of the run is verbatim-equal across copies, so t77 is
    // blind by construction. Each copy gets a 3-token doc-unique
    // prefix: the boundary window holding exactly ONE unique prefix
    // token ([p3, r1, r2, r3]) is itself a legitimate 1-mismatch dup
    // across copies, so removal bleeds exactly that one token — the
    // documented boundary behavior, asserted here on purpose.
    val run = Vector("alpha", "beta", "gamma", "TWEAK", "delta",
      "epsilon", "zeta")
    def copyOf(id: Long): (Long, String) =
      id -> (Seq(s"pre1u$id", s"pre2u$id", s"pre3u$id") ++
        run.updated(3, s"trk$id")).mkString(" ")
    val docs = Seq(copyOf(1L), copyOf(2L), copyOf(3L),
      4L -> "totally unrelated organic text here")
    val df = docs.toDF("doc_id", "text")

    val exact = TextAnalysis.spanDedup(df, minTokens = L).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(exact.values.forall(_ == 0L),
      s"t77 must remove nothing — no window is verbatim-duplicated: $exact")

    val near = TextAnalysis.nearDupSpanDedup(df, minTokens = L).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(4)))).toMap
    for (id <- Seq(1L, 2L, 3L)) {
      // the run (7) plus the one boundary prefix token (1)
      assert(near(id)._2 == 8L, s"doc $id: run + boundary: ${near(id)}")
      assert(near(id)._1 == s"pre1u$id pre2u$id",
        s"doc $id keeps its unique prefix minus the boundary token: " +
          near(id))
      assert(!near(id)._1.contains("trk"), "tracking token removed")
    }
    assert(near(4L)._2 == 0L, "organic text untouched")
  }

  test("exact duplicates: t79's flagged set is a superset of t77's") {
    // verbatim copies collide on ALL L leave-one-out fingerprints
    val docs = Seq(
      1L -> "x aa bb cc dd y",
      2L -> "z aa bb cc dd w",
      3L -> "clean words only here")
    val df = docs.toDF("doc_id", "text")
    val exact = TextAnalysis.spanDedup(df, minTokens = L).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    val near = TextAnalysis.nearDupSpanDedup(df, minTokens = L).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(exact(1L) == 4L && exact(2L) == 4L)
    // t79 removes at least what t77 does (here more: the windows
    // covering x/z + the run's head differ only at the filler slot)
    assert(near(1L) >= exact(1L) && near(2L) >= exact(2L))
    assert(near(3L) == 0L && exact(3L) == 0L)
  }

  /** Plain-Scala replay of the leave-one-out contract: window dup iff
    * ANY (slot, window-minus-token-at-slot) recurs corpus-wide.
    */
  private def replay(docs: Seq[(Long, String)])
      : Map[Long, (String, Long, Long, Long)] = {
    def toks(s: String): Vector[String] =
      s.toLowerCase.trim.replaceAll("\\s+", " ").split(" ", -1).toVector
    val tokd = docs.map { case (id, t) =>
      id -> toks(Option(t).getOrElse(""))
    }
    val wins = tokd.flatMap { case (id, ts) =>
      if (ts.length < L) Nil
      else (0 to ts.length - L).map(i => (id, i + 1, ts.slice(i, i + L)))
    }
    val loo = wins.flatMap { case (id, off, w) =>
      (0 until L).map(slot =>
        (id, off, (slot, (w.take(slot) ++ w.drop(slot + 1)).mkString(" "))))
    }
    val occ = loo.groupBy(_._3).map { case (k, xs) => k -> xs.length }
    tokd.map { case (id, ts) =>
      val dupOffs = loo.collect {
        case (d, off, k) if d == id && occ(k) > 1 => off
      }.distinct.sorted
      val islands = dupOffs.foldLeft(Vector.empty[(Int, Int)]) {
        case (acc, off) =>
          if (acc.nonEmpty && off <= acc.last._2 - (L - 1) + L)
            acc.init :+ ((acc.last._1, off + L - 1))
          else acc :+ ((off, off + L - 1))
      }
      val kept = (1 to ts.length).filterNot(p =>
        islands.exists(iv => p >= iv._1 && p <= iv._2))
      val removed = islands.map(iv => iv._2 - iv._1 + 1).sum
      id -> ((kept.map(p => ts(p - 1)).mkString(" "),
        ts.length.toLong, islands.length.toLong, removed.toLong))
    }.toMap
  }

  private def corpus(seed: Long, nDocs: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    // vocab big enough that exact window collisions are rare but
    // one-mismatch collisions still occur — the regime t79 owns
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    (1 to nDocs).map { i =>
      val n = 1 + rnd.nextInt(14)
      i.toLong -> Vector.fill(n)(vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")
    }
  }

  test("pipeline ≡ plain-Scala replay on seeded random colliding corpora") {
    for (seed <- Seq(3L, 11L, 58L)) {
      val docs = corpus(seed, 24)
      val got = TextAnalysis.nearDupSpanDedup(docs.toDF("doc_id", "text"),
        minTokens = L).collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))).toMap
      assert(got == replay(docs), s"seed $seed diverged")
    }
  }

  test("incremental ≡ full rebuild restricted to increment docs") {
    // the spanDedupIncrement equivalence argument at loo grain: any
    // fingerprint occurring in the increment totals inc + standing —
    // exactly the rebuild's count. Differentially asserted on seeded
    // random colliding corpora (collisions land at arbitrary slots),
    // plus an explicit cross-corpus 1-mismatch copy that only the
    // STANDING index can strip (occurs once on each side).
    for (seed <- Seq(5L, 23L)) {
      val standing = corpus(seed, 24)
      val fresh = corpus(seed + 1000, 8)
        .map { case (id, t) => (id + 100L, t) }
      // a one-substitution copy of a standing doc long enough to open
      // windows: tweak one middle token
      val donor = standing.filter(_._2.split(" ").length >= L + 2).head
      val dt = donor._2.split(" ").toVector
      val tweaked = dt.updated(dt.length / 2, "zz").mkString(" ")
      val inc = fresh :+ (150L -> tweaked)
      val idx = TextAnalysis.nearDupSpanIndex(
        standing.toDF("doc_id", "text"), minTokens = L)
      val got = TextAnalysis.nearDupSpanDedupIncrement(
        inc.toDF("doc_id", "text"), idx, minTokens = L).collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))).toMap
      val full = TextAnalysis.nearDupSpanDedup(
        (standing ++ inc).toDF("doc_id", "text"), minTokens = L)
        .filter(org.apache.spark.sql.functions.col("doc_id") > 100L)
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))).toMap
      assert(got == full, s"seed $seed: incremental diverged from rebuild")
      // the cross-corpus lane actually fired: the tweaked copy lost
      // tokens despite occurring ONCE in the increment
      assert(got(150L)._4 > 0L,
        "the 1-mismatch standing copy must be stripped by the index")
    }
  }

  test("accounting invariants + every-doc-survives (null text included)") {
    val docs = corpus(17L, 40) :+ (999L -> (null: String))
    val rows = TextAnalysis.nearDupSpanDedup(docs.toDF("doc_id", "text"),
      minTokens = L).collect()
    assert(rows.length == docs.length, "every doc survives")
    rows.filter(_.getLong(0) != 999L).foreach { r =>
      val (clean, n, spans, removed) =
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val keptCount = if (clean.isEmpty) 0L else clean.split(" ").length
      assert(keptCount + removed == n, s"token conservation: $r")
      assert(removed >= spans * L, s"each island spans >= L tokens: $r")
    }
    // null text → ONE empty token, kept (too short for any window),
    // serialized as "" — the degenerate the conservation count above
    // can't see, asserted field-by-field instead
    val nullDoc = rows.find(_.getLong(0) == 999L).get
    assert(nullDoc.getString(1) == "" && nullDoc.getLong(2) == 1L &&
      nullDoc.getLong(3) == 0L && nullDoc.getLong(4) == 0L)
  }
}
