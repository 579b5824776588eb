package graft.ext

import org.apache.spark.sql.functions.{length, lit, regexp_replace, sum}
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

  test("batched training ≡ sequential on the textbook example") {
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    // round 1 exercises the conflict stop: (e,s)=9 then (s,t)=9 share
    // 's', so the batch commits (e,s) alone exactly like sequential
    val batched = Bpe.trainMergesBatched(docs, 4, maxBatch = 4)
    assert(batched == Seq("e" -> "s", "es" -> "t", "l" -> "o", "lo" -> "w"))
    assert(batched == Bpe.trainMerges(docs, 4))
  }

  test("batched training ≡ sequential ≡ plain-Scala BPE on the corpus") {
    // independent ground truth: textbook BPE over a word-frequency map
    // in plain Scala — same (count desc, pair asc) pick order
    def refTrain(freqs: Map[String, Long], n: Int): Seq[(String, String)] = {
      var vocab = freqs.toSeq.map { case (w, f) =>
        (w.split("").filter(_.nonEmpty).toList, f) }
      val out = scala.collection.mutable.ListBuffer.empty[(String, String)]
      var done = false
      while (out.size < n && !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        vocab.foreach { case (syms, f) =>
          syms.zip(syms.drop(1)).foreach(p =>
            counts(p) = counts.getOrElse(p, 0L) + f) }
        if (counts.isEmpty) done = true
        else {
          val (l, r) = counts.toSeq
            .minBy { case ((l, r), c) => (-c, l, r) }._1
          out += ((l, r))
          vocab = vocab.map { case (syms, f) =>
            (syms.foldLeft(List.empty[String]) {
              case (acc, s) if acc.nonEmpty && acc.last == l && s == r =>
                acc.init :+ (l + r)
              case (acc, s) => acc :+ s
            }, f)
          }
        }
      }
      out.toList
    }
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val freqs = docs
      .select(org.apache.spark.sql.functions.explode(
        TextOps.tokens(org.apache.spark.sql.functions.col("text"))).as("w"))
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = refTrain(freqs, 24)
    assert(Bpe.trainMerges(docs, 24) == want)
    // batched must commit the identical table at every batch bound
    assert(Bpe.trainMergesBatched(docs, 24, maxBatch = 8) == want)
    assert(Bpe.trainMergesBatched(docs, 24, maxBatch = 64) == want)
    // the driver-loop form (one Spark job total) — identical table
    assert(Bpe.trainMergesLocal(docs, 24) == want)
  }

  test("driver-loop training ≡ sequential, including exhaustion + cap") {
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = Seq((1L, words.mkString(" ")), (2L, "")).toDF("doc_id", "text")
    assert(Bpe.trainMergesLocal(docs, 4) ==
      Seq("e" -> "s", "es" -> "t", "l" -> "o", "lo" -> "w"))
    // asking past exhaustion stops cleanly at the full merge set
    val all = Bpe.trainMergesLocal(docs, 1000)
    assert(all.size < 1000 && all.take(4) ==
      Seq("e" -> "s", "es" -> "t", "l" -> "o", "lo" -> "w"))
    assert(Bpe.trainMerges(docs, 1000) == all)
    // the vocab cap is a deterministic frequency floor: top-2 words by
    // (freq desc, word asc) = newest(6), low(5) — the capped table must
    // equal training on exactly those two words
    val twoWords = Seq((1L, (Seq.fill(6)("newest") ++ Seq.fill(5)("low"))
      .mkString(" "))).toDF("doc_id", "text")
    assert(Bpe.trainMergesLocal(docs, 3, maxVocab = 2) ==
      Bpe.trainMerges(twoWords, 3))
  }

  test("pure in-memory trainer ≡ the Spark trainers (the t61 contract)") {
    // the frozen constant is the pure trainer's output...
    assert(Bpe.TrainedMerges ==
      Bpe.trainMergesInMemory(Bpe.TrainWords, 16))
    // ...and every Spark training path over the same corpus agrees
    val docs = Bpe.TrainWords.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    assert(Bpe.trainMergesLocal(docs, 16) == Bpe.TrainedMerges)
    assert(Bpe.trainMerges(docs, 16) == Bpe.TrainedMerges)
    // the learned table is non-degenerate: 16 distinct merges with
    // multi-character progressions (a trained table, not a char list)
    assert(Bpe.TrainedMerges.size == 16 &&
      Bpe.TrainedMerges.distinct.size == 16)
    assert(Bpe.TrainedMerges.exists { case (a, b) =>
      (a + b).length >= 3 })
    // one corpus split across documents trains identically to
    // one-word-per-row (word frequencies are all that matter)
    val chunked = Bpe.TrainWords.grouped(7).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
    assert(Bpe.trainMergesLocal(chunked, 16) == Bpe.TrainedMerges)
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

  test("corpus encode: expression and mapPartitions forms agree") {
    val corpus = graft.sources.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
      // edge rows: empty text, overlapping-merge bait, repeated words
      .unionByName(Seq(
        (9001L, ""), (9002L, "aaa aaa"), (9003L, "join join join"),
        (9004L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"))
    val merges = Bpe.DemoMerges ++ Seq("a" -> "a")
    val expr = Bpe.encodeDocs(corpus, merges)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val part = Bpe.encodeDocsPartitioned(corpus, merges)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(expr == part && expr.size > 500)
    // the trained table compresses the corpus: fewer tokens than chars
    val chars = corpus.select(
        sum(length(regexp_replace($"text", " ", ""))).cast("long"))
      .head().getLong(0)
    val toks = expr.values.map(_._2).sum
    assert(toks < chars && toks > 0)
    // greedy left-to-right: "aaa aaa" under (a,a) → [aa, a] twice
    assert(expr(9002L) == ((2L, 4L,
      java.security.MessageDigest.getInstance("MD5")
        .digest("aa a aa a".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)))
    // empty doc: one empty word, zero tokens
    assert(expr(9001L)._2 == 0L)
  }

  test("fertility report: hand-computed per-language ratios") {
    val docs = Seq(
      (1L, "x", "ab ab"), // (a,b) merges: 2 words -> 2 tokens, 5 chars
      (2L, "y", "cd"),    // no merge applies: 1 word -> 2 tokens, 2 chars
      (3L, "z", null.asInstanceOf[String])) // empty: 1 word, 0 tokens
      .toDF("doc_id", "lang", "text")
    val out = Bpe.fertilityByLang(docs, Seq("a" -> "b")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) Double.NaN else r.getDouble(5),
        if (r.isNullAt(6)) Double.NaN else r.getDouble(6)))).toMap
    assert(out("x") == ((1L, 2L, 2L, 5L, 1.0, 2.5)))
    assert(out("y") == ((1L, 1L, 2L, 2L, 2.0, 1.0)))
    val z = out("z")
    assert(z._1 == 1L && z._2 == 1L && z._3 == 0L && z._4 == 0L)
    assert(z._5 == 0.0 && z._6.isNaN) // 0 tokens: chars/token undefined
  }
}
