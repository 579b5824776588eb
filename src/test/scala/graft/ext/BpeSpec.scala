package graft.ext

import org.apache.spark.sql.functions.lit
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** BPE merge training: the textbook example hand-computed, plus
  * determinism and encode round-trip on the real corpus.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("learns the textbook merge sequence") {
    // Sennrich et al.'s example vocabulary: low×5 lower×2 newest×6
    // widest×3. Hand-computed: (e,s)=9 ties (s,t)=9 → lexicographic;
    // then (es,t)=9; then (l,o)=7 ties (o,w) → lexicographic; (lo,w)=7.
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    // the empty doc contributes word "" with ZERO symbols — it must
    // yield no pairs, not a negative-length slice crash
    val docs = Seq((1L, words.mkString(" ")), (2L, ""))
      .toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, 4)
    assert(merges == Seq("e" -> "s", "es" -> "t", "l" -> "o", "lo" -> "w"))
    // encode applies greedily left-to-right
    val enc = docs.select(Bpe.encodeWord(lit("lowest"), merges).as("e"))
      .head().getSeq[String](0)
    assert(enc == Seq("low", "est"))
    // overlapping-pair greediness: aaa under (a,a) → [aa, a]
    val aa = docs.select(
        Bpe.encodeWord(lit("aaa"), Seq("a" -> "a")).as("e"))
      .head().getSeq[String](0)
    assert(aa == Seq("aa", "a"))
  }

  test("encode fold matches a plain-Scala greedy reference on random input") {
    // property-style over a seeded generator (no ScalaCheck Spark
    // session plumbing needed): the Column fold must equal the obvious
    // sequential implementation for every (word, merge) combination
    def refMerge(syms: List[String], a: String, b: String): List[String] =
      syms.foldLeft(List.empty[String]) {
        case (acc, s) if acc.nonEmpty && acc.last == a && s == b =>
          acc.init :+ (a + b)
        case (acc, s) => acc :+ s
      }
    val rnd = new scala.util.Random(42)
    val alphabet = Seq("a", "b", "c")
    val cases = (1 to 60).map { _ =>
      val word = (1 to (1 + rnd.nextInt(8)))
        .map(_ => alphabet(rnd.nextInt(3))).mkString
      val m = (alphabet(rnd.nextInt(3)), alphabet(rnd.nextInt(3)))
      (word, m)
    }
    val got = cases.map { case (w, (a, b)) =>
      spark.range(1).select(Bpe.encodeWord(lit(w), Seq(a -> b)).as("e"))
        .head().getSeq[String](0).toList
    }
    val want = cases.map { case (w, (a, b)) =>
      refMerge(w.split("").toList, a, b)
    }
    assert(got == want)
  }

  test("corpus training is deterministic and pin-clean") {
    val docs = graft.sources.Tables
      .documents(spark, "/root/testdata/sf0.001")
    // pinUnregistered never touches the pins registry, so pinCount
    // cannot see a leak here — count the actual persisted RDDs instead
    val before = spark.sparkContext.getPersistentRDDs.size
    val a = Bpe.trainMerges(docs, 8)
    val b = Bpe.trainMerges(docs, 8)
    assert(a == b && a.length == 8)
    assert(a.distinct.length == 8) // merges never repeat
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "trainMerges leaked checkpoint RDDs")
  }
}
