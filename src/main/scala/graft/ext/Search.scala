package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked retrieval over the document corpus — the query side of a
  * training-data pipeline (dataset search, eval-set mining, targeted
  * decontamination probes). The reference has no search surface; this is
  * part of the beyond-reference curation tier.
  */
object Search {

  /** BM25 top-k retrieval (t29): score every document against a small
    * query table with Okapi BM25 (k1 = 1.2, b = 0.75 — the standard
    * Robertson parameters) and keep the `k` best per query.
    *
    * 100 TB shape — an inverted-index probe expressed relationally:
    * the per-(doc, token) term-frequency frame is the posting list, and
    * the query only ever touches postings whose token appears in some
    * query (`dtf ⋈ broadcast(query tokens)` — the corpus-wide frame is
    * scanned once and immediately cut to the query vocabulary, so the
    * expensive joins move `docs-containing-query-terms` rows, not the
    * corpus). Document frequency is computed on that cut (equivalent:
    * df only matters for query terms), so no full-vocabulary rollup
    * exists anywhere. Corpus-level stats (N, avgdl) are one broadcast
    * row; the query side is always broadcast.
    *
    * Determinism (the t25 discipline): `ln` agrees cross-engine at
    * 9 dp, so idf is rounded to 9 dp BEFORE use; each term weight is
    * IEEE arithmetic over that rounded idf (multiply/divide/add are
    * exactly rounded, so identical operation order ⇒ identical
    * doubles), itself rounded to 9 dp; per-(query, doc) totals sum in
    * DECIMAL(28,9) — order-free. Ranking orders by the exact decimal
    * total (doc_id tiebreak), never the displayed 6 dp score.
    *
    * @param queries (query_id: long, qtext: string); tokenized with the
    *                corpus normalizer, duplicate query terms count once.
    */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int = 10,
               textCol: String = "text"): DataFrame = {
    // posting lists: one row per (doc, token) with its term frequency.
    // Pinned: feeds document lengths, the query-vocabulary cut, and
    // (via the cut) document frequencies — one tokenize pass total.
    val dtf = graft.std.Materialize.once(docs
      .select(col("doc_id"), explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("_tf")))
    val dl = dtf.groupBy(col("doc_id")).agg(sum(col("_tf")).as("_dl"))
    val stats = dl.agg(count(lit(1)).as("_n_docs"), sum(col("_dl")).as("_sum_dl"))
    val qtok = queries.select(col("query_id"),
      explode(array_distinct(TextOps.tokens(col("qtext")))).as("token"))
    // corpus → query-vocabulary cut; df computed on the cut (each
    // (doc, token) row appears once, so count(*) = docs containing it)
    val dtfq = graft.std.Materialize.once(
      dtf.join(broadcast(qtok.select(col("token")).distinct()), "token"))
    val dfq = dtfq.groupBy(col("token")).agg(count(lit(1)).as("_df"))
    val idf = round(
      log((col("_n_docs").cast("double") - col("_df").cast("double") + 0.5) /
        (col("_df").cast("double") + 0.5) + 1.0), 9)
    val avgdl = col("_sum_dl").cast("double") / col("_n_docs").cast("double")
    val w = round(
      idf * (col("_tf").cast("double") * lit(2.2)) /
        (col("_tf").cast("double") +
          lit(1.2) * (lit(1.0) - lit(0.75) +
            lit(0.75) * (col("_dl").cast("double") / avgdl))), 9)
    val scored = dtfq
      .join(broadcast(qtok), "token")
      .join(broadcast(dfq), "token")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"),
        w.cast("decimal(28,9)").as("_w"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("_w")).as("_s"))
    val rk = Window.partitionBy(col("query_id"))
      .orderBy(col("_s").desc, col("doc_id").asc)
    scored
      .select(col("query_id"), col("doc_id"),
        round(col("_s").cast("double"), 6).as("score"),
        row_number().over(rk).cast("long").as("rank"))
      .filter(col("rank") <= k)
  }

  /** Frozen per-term BM25 weights for a fixed query set — the standing-
    * query index [[bm25Alert]] scores against. Collected driver-side:
    * the map is bounded by the QUERY vocabulary (a handful of terms),
    * never the corpus vocabulary, so freezing is a tiny bounded
    * collect no matter the corpus size. idf uses [[bm25TopK]]'s exact
    * discipline (9 dp-rounded ln over the query-vocabulary df cut).
    */
  case class Bm25Index(termIdf: Map[String, Map[String, Double]],
                       avgdl: Double)

  def bm25Freeze(corpus: DataFrame,
                 queries: Seq[(String, String)],
                 textCol: String = "text"): Bm25Index = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val dtf = graft.std.Materialize.once(corpus
      .select(col("doc_id"), explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("_tf")))
    val dl = dtf.groupBy(col("doc_id")).agg(sum(col("_tf")).as("_dl"))
    val Array(nDocs, sumDl) = dl
      .agg(count(lit(1)).cast("double"), sum(col("_dl")).cast("double"))
      .head().toSeq.map(_.asInstanceOf[Double]).toArray
    val qtok = queries.map { case (qid, qtext) =>
      qid -> qtext.toLowerCase.trim.split("\\s+").distinct.toSeq
    }
    val allTerms = qtok.flatMap(_._2).distinct
    val dfByTerm = dtf
      .join(broadcast(allTerms.toDF("token")), "token")
      .groupBy(col("token")).agg(count(lit(1)).as("_df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def idf(df: Long): Double = BigDecimal(
      math.log((nDocs - df.toDouble + 0.5) / (df.toDouble + 0.5) + 1.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    Bm25Index(
      qtok.map { case (qid, terms) =>
        qid -> terms.map(t => t -> idf(dfByTerm.getOrElse(t, 0L))).toMap
      }.toMap,
      sumDl / nDocs)
  }

  /** Standing-query BM25 alerting (streaming search): score every
    * incoming document against a [[bm25Freeze]] index and emit
    * `(doc_id, query_id, score)` rows clearing `threshold`. The
    * streamable complement of [[bm25TopK]]: top-k needs a global rank
    * (not streamable in append mode), an alert threshold does not —
    * and because the index is FROZEN, scoring is a pure per-row
    * expression over the document's own tokens (tf via `array` filter
    * counts, dl via `size`) — no state, no watermark, no shuffle,
    * whole-stage codegen; works identically on a batch frame (the spec
    * proves batch ≡ stream). Production swaps the frozen index
    * per-deploy, exactly like the resample-plan and LM operators.
    */
  def bm25Alert(docs: DataFrame, index: Bm25Index, threshold: Double,
                k1: Double = 1.2, b: Double = 0.75,
                textCol: String = "text"): DataFrame = {
    val base = TextOps.attrBarrier(
        docs.select(col("doc_id"), col(textCol)),
        Seq("doc_id"), "_toks", TextOps.tokens(col(textCol)))
      // NULL text → _toks null → size/filter give -1, which would turn
      // into a large POSITIVE score alerting on every query; bm25TopK
      // drops such docs (no postings), so the alert path must too
      .filter(col("_toks").isNotNull)
    val dl = size(col("_toks")).cast("double")
    val norm = lit(1.0) - lit(b) + lit(b) * (dl / lit(index.avgdl))
    val perQuery = index.termIdf.toSeq.sortBy(_._1).map { case (qid, terms) =>
      val score = terms.toSeq.sortBy(_._1).map { case (t, idf) =>
        val tf = size(filter(col("_toks"), x => x === lit(t))).cast("double")
        round(lit(idf) * (tf * lit(k1 + 1.0)) /
          (tf + lit(k1) * norm), 9).cast("decimal(28,9)")
      }.reduce(_ + _)
      struct(lit(qid).as("query_id"),
        score.cast("double").as("score"))
    }
    base.select(col("doc_id"), explode(array(perQuery: _*)).as("_q"))
      .select(col("doc_id"), col("_q.query_id"),
        round(col("_q.score"), 6).as("score"))
      .filter(col("score") >= threshold)
  }

  /** Reciprocal-rank fusion (t54): merge a LEXICAL ranking (BM25) and a
    * DENSE ranking (embedding cosine) of the same corpus into one
    * hybrid list per query — the standard two-tower + keyword hybrid
    * retrieval every RAG / eval-mining stack runs, fused without score
    * calibration: RRF needs only the RANKS, so the two rankers'
    * incomparable score scales never meet.
    *
    * `lex` and `dense` are `(query_id, doc_id, rank)` top-k frames
    * (ranks 1-based, as [[bm25TopK]] and
    * [[Similarity.bruteForceTopK]] emit). Fused score =
    * Σ_rankers 1/(k0 + rank) over the rankers that returned the doc
    * (k0 = 60, the Cormack/Clarke/Buettcher constant); a doc absent
    * from one list simply contributes nothing for it. Output keeps the
    * per-ranker ranks (nullable) for provenance and re-ranks by
    * (fused score DESC, doc_id ASC) — fully deterministic.
    *
    * 100 TB shape: both inputs are already per-query top-k, so fusion
    * moves O(|queries| · k) rows REGARDLESS of corpus size — the heavy
    * lifting stays in the rankers (which are the scale-audited t29/s1
    * kernels); the fuse itself is one bounded full-outer join plus a
    * bounded window. Determinism: each 1/(k0+rank) term is rounded to
    * 9 dp and summed in DECIMAL(28,9) (order-free, the t25
    * discipline), so the fused score is bit-identical cross-engine.
    */
  def rrfFuse(lex: DataFrame, dense: DataFrame, k: Int = 10,
              k0: Int = 60): DataFrame = {
    require(k >= 1, "need k >= 1")
    require(k0 >= 1, "need k0 >= 1")
    val l = lex.select(col("query_id"), col("doc_id"),
      col("rank").cast("long").as("lex_rank"))
    val d = dense.select(col("query_id"), col("doc_id"),
      col("rank").cast("long").as("dense_rank"))
    val term = (r: Column) => coalesce(
      round(lit(1.0) / (lit(k0).cast("double") + r.cast("double")), 9),
      lit(0.0)).cast("decimal(28,9)")
    val fused = l.join(d, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        col("lex_rank"), col("dense_rank"),
        (term(col("lex_rank")) + term(col("dense_rank"))).as("_s"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("_s").desc, col("doc_id").asc)
    fused
      .select(col("query_id"), col("doc_id"),
        round(col("_s").cast("double"), 9).as("rrf_score"),
        col("lex_rank"), col("dense_rank"),
        row_number().over(w).cast("long").as("fused_rank"))
      .filter(col("fused_rank") <= k)
  }

  /** Contrastive hard-negative mining (t65): the triplet-building
    * stage of retrieval training (the DPR / sentence-transformers
    * recipe) over a ranked retrieval result — POSITIVE = each query's
    * rank-1 hit, HARD negatives = the next `nHard` ranks (lexically
    * close but wrong: the gradient-rich examples a bi-encoder learns
    * most from), EASY negative = one deterministic corpus pick
    * OUTSIDE the retrieved set (hash-argmin over (query, doc) stands
    * in for the uniform draw — the repo's no-RNG rule, and exactly as
    * reproducible across engines as everything else here).
    *
    * 100 TB shape: positives and hards are projections of the (tiny)
    * ranked frame. The easy pick never touches the whole corpus per
    * query: the corpus is PRE-CUT to one deterministic hash bucket
    * per query — corpus ids bucket by `hash64(t65b|doc) mod B`, each
    * query draws bucket `hash64(t65q|query) mod B`, and the two sides
    * meet on an EQUI-join on the bucket id (no cross join in the
    * plan), so the scan is |corpus|/B rows per query. The argmin
    * inside the bucket is a partial-aggregable `min(struct(hash,
    * doc))` — no per-query global sort (a row_number window over a
    * whole per-query partition WAS the practical bottleneck, not the
    * row count). Size `buckets` so |corpus|/B ≫ the retrieved set per
    * query (the anti-join removes retrieved docs; an empty cut would
    * drop that query's easy row — with the default 16 buckets and any
    * real corpus the cut is thousands of times the retrieved set).
    *
    * Returns (query_id, positive_id, negative_id, kind,
    * negative_rank) — kind ∈ {hard, easy}, negative_rank null on easy
    * rows.
    */
  def hardNegatives(ranked: DataFrame, corpus: DataFrame,
                    nHard: Int = 3, buckets: Int = 16): DataFrame = {
    require(nHard >= 1, "need at least one hard negative")
    require(buckets >= 1, "need at least one bucket")
    val pos = ranked.filter(col("rank") === 1)
      .select(col("query_id"), col("doc_id").as("positive_id"))
    val hard = ranked.filter(col("rank") > 1 && col("rank") <= 1 + nHard)
      .select(col("query_id"), col("doc_id").as("negative_id"),
        col("rank").as("negative_rank"))
    val hardRows = pos.join(hard, Seq("query_id"))
      .select(col("query_id"), col("positive_id"), col("negative_id"),
        lit("hard").as("kind"), col("negative_rank"))
    val cut = corpus.select(col("doc_id"))
      .withColumn("_b", TextOps.hash64(
        concat(lit("t65b|"), col("doc_id").cast("string"))) % buckets)
    val qb = broadcast(pos.withColumn("_b", TextOps.hash64(
      concat(lit("t65q|"), col("query_id").cast("string"))) % buckets))
    val easy = cut.join(qb, Seq("_b"))
      .join(ranked.select(col("query_id"), col("doc_id")),
        Seq("query_id", "doc_id"), "left_anti")
      .withColumn("_h", TextOps.hash64(
        concat(col("query_id").cast("string"), lit("|"),
          col("doc_id").cast("string"))))
      .groupBy(col("query_id"))
      .agg(min(struct(col("_h"), col("doc_id"), col("positive_id")))
        .as("_m"))
      .select(col("query_id"), col("_m.positive_id").as("positive_id"),
        col("_m.doc_id").as("negative_id"), lit("easy").as("kind"),
        lit(null).cast("long").as("negative_rank"))
    hardRows.unionByName(easy)
  }
}
