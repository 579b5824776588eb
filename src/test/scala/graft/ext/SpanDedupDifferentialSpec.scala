package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** t77 adversarial differential: the full spanDedup pipeline vs an
  * independent plain-Scala replay (tokenize → every-offset windows →
  * corpus occurrence counts → island merge → rebuild) on seeded random
  * corpora over a TINY alphabet — small vocabularies force organic
  * window collisions at arbitrary alignments, within-doc repeats, and
  * islands that merge/abut/break, none of it hand-picked. Also pins
  * the accounting invariants on the same corpora.
  */
class SpanDedupDifferentialSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val L = 4 // small window so short random docs can collide

  /** Plain-Scala replay of the operator's contract (no Spark, no md5 —
    * content equality stands in for the 56-bit hash, which is exactly
    * what the hash approximates).
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
      else (0 to ts.length - L).map(i =>
        (id, i + 1, ts.slice(i, i + L).mkString(" ")))
    }
    val occ = wins.groupBy(_._3).map { case (w, xs) => w -> xs.length }
    tokd.map { case (id, ts) =>
      val dupOffs = wins.collect {
        case (d, off, w) if d == id && occ(w) > 1 => off
      }.sorted
      // island merge: contiguous coverage iff off <= prev + L
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
    val vocab = Vector("aa", "bb", "cc", "dd") // tiny: collisions abound
    (1 to nDocs).map { i =>
      val n = 1 + rnd.nextInt(14)
      i.toLong -> Vector.fill(n)(vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")
    }
  }

  test("pipeline ≡ plain-Scala replay on seeded random colliding corpora") {
    for (seed <- Seq(1L, 7L, 42L)) {
      val docs = corpus(seed, 24)
      val got = TextAnalysis.spanDedup(docs.toDF("doc_id", "text"),
        minTokens = L).collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))).toMap
      assert(got == replay(docs), s"seed $seed diverged")
    }
  }

  test("accounting invariants hold on a larger random corpus") {
    val docs = corpus(99L, 80)
    val rows = TextAnalysis.spanDedup(docs.toDF("doc_id", "text"),
      minTokens = L).collect()
    assert(rows.length == docs.length, "every doc survives")
    rows.foreach { r =>
      val (clean, n, spans, removed) =
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val keptCount = if (clean.isEmpty) 0L else clean.split(" ").length
      assert(keptCount + removed == n, s"token conservation: $r")
      assert(removed >= spans * L, s"each island spans >= L tokens: $r")
    }
  }
}
