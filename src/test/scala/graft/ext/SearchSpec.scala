package graft.ext

import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** BM25 retrieval (t29) semantics on a hand-checkable corpus. */
class SearchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(qs: Seq[(Long, String)], docs: Seq[(Long, String)]) =
    Search.bm25TopK(docs.toDF("doc_id", "text"),
        qs.toDF("query_id", "qtext"), k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(3)) -> r.getLong(1)).toMap

  test("length normalization outranks raw term frequency") {
    // docB has tf(apple)=2 but is 3x longer; with b=0.75 the length
    // penalty wins: 2.2/1.791 > 4.4/3.773 (hand-computed denominators)
    val got = run(Seq((1L, "apple")), Seq(
      (10L, "apple banana"),
      (20L, "apple apple banana extra words here"),
      (30L, "cherry only text")))
    assert(got((1L, 1L)) == 10L)
    assert(got((1L, 2L)) == 20L)
    assert(!got.contains((1L, 3L))) // no apple in docC → never scored
  }

  test("multi-term queries sum per-term weights; duplicates count once") {
    val docs = Seq(
      (10L, "apple banana"),
      (20L, "banana cherry"),
      (30L, "cherry text cherry"))
    // both-terms doc beats single-term docs; "cherry cherry" scores
    // like "cherry" (query terms are distinct)
    val both = run(Seq((1L, "banana cherry")), docs)
    assert(both((1L, 1L)) == 20L)
    val dup = run(Seq((1L, "cherry cherry")), docs)
    val single = run(Seq((1L, "cherry")), docs)
    assert(dup == single)
  }

  test("standing-query alert: batch ≡ stream, scores match bm25TopK") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val qs = Seq("q1" -> "spark join merge", "q2" -> "vector hash table scan")
    val idx = Search.bm25Freeze(docs, qs)
    graft.std.Materialize.releaseAll()
    assert(idx.termIdf("q1").size == 3 && idx.avgdl > 0)

    val threshold = 0.5
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val batch = rows(Search.bm25Alert(docs, idx, threshold))
    assert(batch.nonEmpty && batch.exists(_._2 == "q1"))

    // stream: same docs in 3 micro-batches through the SAME operator
    val stage = java.nio.file.Files.createTempDirectory("bm25_src").toString
    docs.repartition(3).write.mode("overwrite").parquet(stage)
    val streamIn = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
    val q = Search.bm25Alert(streamIn, idx, threshold)
      .writeStream.format("memory").queryName("bm25_alert")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(rows(spark.table("bm25_alert")) == batch)

    // the frozen-index scores agree with the batch ranker's: absent
    // query terms contribute an exact decimal 0, so per-(query, doc)
    // totals coincide
    val topk = Search.bm25TopK(docs,
        Seq((1L, qs.head._2)).toDF("query_id", "qtext"), k = Int.MaxValue)
      .collect().map(r => r.getLong(1) -> r.getDouble(2))
      .filter(_._2 >= threshold).toSet
    graft.std.Materialize.releaseAll()
    assert(batch.collect { case (d, "q1", s) => d -> s } == topk)
  }

  test("alert skips null-text docs instead of spuriously firing") {
    // size(null) = -1 would make every per-term denominator small and
    // every score large-positive — the null row must not alert at all
    val docs = Seq((1L, "apple pie")).toDF("doc_id", "text")
      .unionByName(Seq(2L).toDF("doc_id")
        .withColumn("text", lit(null).cast("string")))
    val idx = Search.bm25Freeze(docs.filter(col("doc_id") === 1L),
      Seq("q" -> "apple"))
    graft.std.Materialize.releaseAll()
    val got = Search.bm25Alert(docs, idx, threshold = -1000.0).collect()
      .map(_.getLong(0)).toSet
    assert(got == Set(1L))
  }

  test("top-k cut and deterministic doc_id tiebreak") {
    // 5 identical docs score identically → rank by doc_id; k=3 keeps 3
    val docs = (1L to 5L).map(i => (i, "same text here"))
    val got = Search.bm25TopK(docs.toDF("doc_id", "text"),
        Seq((1L, "same")).toDF("query_id", "qtext"), k = 3)
      .collect().map(r => r.getLong(3) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("RRF: both-list docs beat single-list docs; ranks kept for provenance") {
    // doc 10 is rank 1 in BOTH lists: 2/61 ≈ 0.0327868852
    // doc 20 is lex-only rank 2:      1/62 ≈ 0.0161290323
    // doc 30 is dense-only rank 2:    1/62 — ties doc 20, doc_id breaks
    val lex = Seq((1L, 10L, 1L), (1L, 20L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val dense = Seq((1L, 10L, 1L), (1L, 30L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val got = Search.rrfFuse(lex, dense).collect()
      .map(r => r.getLong(5) -> (r.getLong(1), r.getDouble(2),
        Option(r.get(3)), Option(r.get(4)))).toMap
    assert(got(1L)._1 == 10L && got(1L)._3 == Some(1L) &&
      got(1L)._4 == Some(1L))
    assert(got(1L)._2 == 0.032786886) // round(1/61,9)*2
    assert(got(2L)._1 == 20L && got(2L)._4 == None) // lex-only, id tiebreak
    assert(got(3L)._1 == 30L && got(3L)._3 == None)
    assert(got(2L)._2 == got(3L)._2)
  }

  test("RRF: k cut applies after fusion; queries fuse independently") {
    val lex = (1L to 8L).map(d => (1L, d, d)) ++ Seq((2L, 100L, 1L))
    val dense = (1L to 8L).map(d => (1L, d + 4L, d)) // 5..12 overlap 5..8
    val got = Search.rrfFuse(lex.toDF("query_id", "doc_id", "rank"),
      dense.toDF("query_id", "doc_id", "rank"), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(5)) -> r.getLong(1))
      .toMap
    // overlapping docs 5..8 get two terms; 5 has the best combined
    // (lex 5 + dense 1), then 6, then 7
    assert(got((1L, 1L)) == 5L && got((1L, 2L)) == 6L &&
      got((1L, 3L)) == 7L)
    assert(got((2L, 1L)) == 100L) // query 2 fuses on its own
    assert(got.size == 4)
  }

  test("hard negatives: positive at rank 1, hards 2..1+n, easy outside") {
    // a hand-built ranking: query 1 retrieved docs 10..14 at ranks
    // 1..5; the corpus adds unretrieved docs 20, 21
    val ranked = Seq(
      (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L), (1L, 13L, 4L),
      (1L, 14L, 5L))
      .toDF("query_id", "doc_id", "rank")
    val corpus = Seq(10L, 11L, 12L, 13L, 14L, 20L, 21L).toDF("doc_id")
    // buckets = 1: the degenerate whole-corpus draw (this fixture's 2
    // unretrieved docs are far fewer than the default 16 buckets)
    val rows = Search.hardNegatives(ranked, corpus, nHard = 3,
      buckets = 1).collect()
    val hard = rows.filter(_.getString(3) == "hard")
      .map(r => (r.getLong(2), r.getLong(4))).sorted
    // hards are EXACTLY ranks 2..4; rank 5 is beyond nHard
    assert(hard.toSeq == Seq((11L, 2L), (12L, 3L), (13L, 4L)))
    assert(rows.forall(_.getLong(1) == 10L), "positive is the rank-1 hit")
    val easy = rows.filter(_.getString(3) == "easy")
    assert(easy.length == 1 && easy(0).isNullAt(4))
    // the easy pick comes from OUTSIDE the retrieved set — doc 20 or
    // 21, whichever the (query, doc) hash orders first, never 10..14
    assert(Set(20L, 21L).contains(easy(0).getLong(2)))
    // determinism: a second run picks the identical easy negative
    val again = Search.hardNegatives(ranked, corpus, nHard = 3,
        buckets = 1)
      .collect().filter(_.getString(3) == "easy")(0).getLong(2)
    assert(again == easy(0).getLong(2))
  }

  test("easy negative draws from the query's hash bucket, not the corpus") {
    // ranked: query 1 retrieved docs 10..14; unretrieved corpus
    // 100..139 minus 118. Md5-lane arithmetic (hand-computed): query
    // 1 lands in bucket 11 of 16; the unretrieved bucket-11 docs are
    // {112, 116, 132} whose (query,doc)-hash argmin is 116 — while
    // the WHOLE-corpus argmin is 135. The two picks differing is the
    // point: the bucketed draw reads |corpus|/B rows per query and is
    // exactly as deterministic, but it is a different (equally
    // uniform) draw, so the spec pins both.
    val ranked = Seq(
      (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L), (1L, 13L, 4L),
      (1L, 14L, 5L))
      .toDF("query_id", "doc_id", "rank")
    val corpus = ((10L to 14L) ++ (100L to 139L).filterNot(_ == 118L))
      .toDF("doc_id")
    val bucketed = Search.hardNegatives(ranked, corpus, nHard = 3)
      .collect().filter(_.getString(3) == "easy")
    assert(bucketed.length == 1 && bucketed(0).getLong(2) == 116L,
      s"bucket-11 hash argmin must win: ${bucketed.toSeq}")
    val global = Search.hardNegatives(ranked, corpus, nHard = 3,
        buckets = 1)
      .collect().filter(_.getString(3) == "easy")
    assert(global.length == 1 && global(0).getLong(2) == 135L,
      s"whole-corpus hash argmin: ${global.toSeq}")
    // the plan has no cartesian: the bucket cut is an equi-join
    val plan = Search.hardNegatives(ranked, corpus, nHard = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"easy pick must equi-join on the bucket id:\n$plan")
  }
}
