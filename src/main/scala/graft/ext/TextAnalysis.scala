package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over a document corpus: token statistics,
  * quality scoring, n-gram-marker language ID, content fingerprints.
  * All per-row `Column` expressions + one optional aggregate — the shape
  * that survives 100 TB (the row-level pass is embarrassingly parallel;
  * the per-language rollup shuffles ~5 keys with partial aggregation).
  */
object TextAnalysis {

  /** t77/t78 span-dedup defaults, shared by the Spark operators
    * ([[spanDedup]]/[[sourceSpanPressure]] default params), the query
    * fixtures ([[ExtQueries]]' promo injection), and the DuckDB twin
    * generator ([[ExtOracleSql]]'s span CTE chain) — r17 advice: the
    * SQL used to hardcode 8/7/`occ > 1` and duplicate the promo
    * sentence as separate literals, so a change to the Spark-side
    * defaults or promo text silently diverged the twins.
    */
  val SpanMinTokens: Int = 8
  val SpanMaxOcc: Int = 1
  /** t80 anchor rate: a token opens a new segment when its seeded
    * content hash lands in 1/CdcAvgSegTokens of the lane.
    */
  val CdcAvgSegTokens: Int = 8
  val SpanPromoText: String =
    "subscribe to our newsletter today for weekly updates " +
      "and exclusive member offers"

  /** t79's tweaked-promo fixture fragments, derived ONCE from the
    * shared promo (review finding: ExtQueries, the SQL twin, and the
    * scale probe each re-derived take(5)/drop(6) independently — the
    * same twin-drift class the shared constant exists to close). The
    * substituted slot is promo position [[SpanPromoTweakPos]]
    * (1-based); a per-copy tracking token goes between head and tail.
    */
  val SpanPromoTweakPos: Int = 6

  /** t21's per-source quota and t26's target corpus fraction, shared
    * with the DuckDB twins (review finding: the twins hardcoded
    * `rank = 11` and `u < 0.5` — the same twin-drift class the span
    * constants close: a Spark-side parameter change would silently
    * diverge the oracle instead of failing the gate).
    */
  val DomainQuotaN: Int = 10
  val TempTargetFrac: Double = 0.5
  val SpanPromoHead: String =
    SpanPromoText.split(" ").take(SpanPromoTweakPos - 1).mkString(" ")
  val SpanPromoTail: String =
    SpanPromoText.split(" ").drop(SpanPromoTweakPos).mkString(" ")

  /** Marker stopwords per language for the n-gram-heuristic language ID.
    * Deterministic and tiny by design — a real deployment swaps in
    * fastText-style profiles; the *operator shape* (per-row argmax over
    * k marker scores) is what scales.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "is", "to"),
    "es" -> Seq("el", "la", "de", "los", "y", "es"),
    "fr" -> Seq("le", "la", "de", "les", "et", "est"),
    "zh" -> Seq("de_zh", "shi", "le_zh", "zai", "he", "you"))

  /** Tokens matching a marker list. */
  private def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(m => m: Any): _*)))

  /** Language-ID scores + argmax with deterministic alphabetical
    * tiebreak (first language in [[LangMarkers]] order wins ties).
    */
  def langScores(toks: Column): Seq[(String, Column)] =
    LangMarkers.map { case (lang, ms) => lang -> markerCount(toks, ms) }

  def predictedLang(toks: Column): Column = {
    val scores = langScores(toks)
    // lang_i wins if its score >= every later score and > every earlier
    // one it didn't already lose to; expressed as a foldRight CASE chain:
    // pick the first lang whose score equals the row maximum.
    val maxScore = greatest(scores.map(_._2): _*)
    scores.reverse.foldLeft(lit("und")) { case (acc, (lang, s)) =>
      when(s === maxScore && maxScore > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Per-document token statistics. The tokenize chain crosses an
    * [[TextOps.attrBarrier]] so the four downstream stats (two sizes,
    * the distinct count, the length-fold lambda) read a materialized
    * array attribute instead of re-running the regex-normalize-split
    * chain once per reference — the lambda sits outside codegen
    * subexpression elimination, so without the barrier the chain is
    * evaluated 4× per row.
    */
  def tokenStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val base = docs.select(
      col("doc_id"), length(col(textCol)).as("n_chars_raw"), col(textCol))
    val barriered = TextOps.attrBarrier(base, Seq("doc_id", "n_chars_raw"),
      "_toks", TextOps.tokens(col(textCol)))
    val toks = col("_toks")
    barriered.select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_uniq_tokens"),
      round(TextOps.foldSumDouble(
          transform(toks, t => length(t).cast("double"))) /
        size(toks).cast("double"), 6).as("avg_token_len"),
      col("n_chars_raw"))
  }

  /** Heuristic quality score in [0,1]: length saturation + low-punctuation
    * + stopword presence (the classic pre-training quality gates, each as
    * a guarded ratio).
    *
    * The tokenize chain crosses a [[TextOps.attrBarrier]] exactly like
    * [[tokenStats]]: the three token consumers (`size`, the stopword
    * filter lambda, the composite score) read one materialized array
    * attribute instead of re-running the regex-normalize-split chain per
    * reference — the filter lambda sits outside codegen subexpression
    * elimination, so the un-barriered form evaluates the chain ~4× per
    * row on the full-corpus scoring pass.
    */
  def qualityScore(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val base = docs.select(col("doc_id"), col(textCol))
    val barriered = TextOps.attrBarrier(base, Seq("doc_id", textCol),
      "_toks", TextOps.tokens(col(textCol)))
    val t = col(textCol)
    val toks = col("_toks")
    barriered.select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      round(punctRatioExpr(t), 6).as("punct_ratio"),
      round(stopRatioFromToks(toks), 6).as("stopword_ratio"),
      qualityScoreFromToks(toks, t).as("quality_score"))
  }

  private def punctRatioExpr(t: Column): Column = {
    val nChar = length(t).cast("double")
    val punct = nChar - length(regexp_replace(t, "[^\\w\\s]", "")).cast("double")
    when(nChar > 0, punct / nChar).otherwise(0.0)
  }

  /** English-stopword ratio over a PRECOMPUTED token array (see
    * [[qualityScoreFromToks]] for why callers barrier the array first).
    */
  private def stopRatioFromToks(toks: Column): Column = {
    val nTok = size(toks).cast("double")
    when(nTok > 0,
      markerCount(toks, LangMarkers.toMap.apply("en")).cast("double") / nTok)
      .otherwise(0.0)
  }

  /** The rounded composite quality score as a column expression, so
    * rankers ([[domainQuota]]) order on the identical double the t3
    * profile reports.
    */
  def qualityScoreExpr(t: Column): Column =
    qualityScoreFromToks(TextOps.tokens(t), t)

  /** [[qualityScoreExpr]] over a PRECOMPUTED token array: whole-frame
    * scorers (d12) route tokens through [[TextOps.attrBarrier]] first so
    * the stopword filter lambda reads an attribute — a lambda capturing
    * the raw tokenize chain re-runs the regex-normalize-split once per
    * reference (the t1 defect; see the barrier's doc).
    */
  private[ext] def qualityScoreFromToks(toks: Column, t: Column): Column = {
    val nTok = size(toks).cast("double")
    val stopRatio = stopRatioFromToks(toks)
    round(
      least(nTok / 100.0, lit(1.0)) * 0.5 +
        (lit(1.0) - punctRatioExpr(t)) * 0.3 +
        least(stopRatio * 5.0, lit(1.0)) * 0.2, 6)
  }

  /** Approximate one-pass corpus profile: HLL distinct counts and
    * approximate percentiles. Not oracle-gated (sketch internals differ
    * per engine by design); unit-tested against exact counts. At 100 TB
    * this replaces the exact-distinct shuffle with mergeable fixed-size
    * state — the only way the profile stays one pass.
    */
  def corpusProfile(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.agg(
      count(lit(1)).as("n_docs"),
      approx_count_distinct(md5(TextOps.normText(col(textCol))))
        .as("approx_uniq_texts"),
      approx_count_distinct(col("lang")).as("approx_langs"),
      expr("approx_percentile(n_chars, array(0.5D, 0.9D, 0.99D))")
        .as("chars_percentiles"))

  /** Deterministic train/valid/test assignment bucketed on the CONTENT
    * digest (hash of the normalized text), not the document id: two
    * copies of the same text always land in the same split, so exact
    * duplicates can never straddle train/test (id-bucketed splits leak
    * exactly that way). Near-duplicates under different wording still
    * require near-dup dedup ([[graft.ext.Dedup]]) before splitting.
    * Content bucketing is also stable across engines, runs, and
    * re-shards (never use random() or row position, both of which
    * reassign docs when the corpus is re-partitioned).
    */
  def trainTestSplit(docs: DataFrame, textCol: String = "text",
                     trainPct: Int = 80, validPct: Int = 10): DataFrame = {
    val bucket = TextOps.hash64(TextOps.normText(col(textCol))) % 100
    docs.withColumn("split",
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + validPct, "valid")
        .otherwise("test"))
  }

  /** Exact character-length percentiles per language — the distribution
    * profile a curator reads before setting length filters. Exact
    * `percentile` buffers each group's values (fine at per-language
    * group counts); at 100 TB switch to `approx_percentile`
    * ([[corpusProfile]] shows the sketch form) — the exact one exists
    * because it is DuckDB-oracle-checkable and the approx one is not.
    */
  def charPercentiles(docs: DataFrame): DataFrame =
    docs.groupBy(col("lang")).agg(
      count(lit(1)).as("n_docs"),
      round(expr("percentile(n_chars, 0.25D)"), 6).as("p25"),
      round(expr("percentile(n_chars, 0.5D)"), 6).as("p50"),
      round(expr("percentile(n_chars, 0.75D)"), 6).as("p75"),
      round(expr("percentile(n_chars, 0.9D)"), 6).as("p90"))

  /** Fixed-width character chunking with overlap (width 200, stride 150
    * ⇒ 50-char overlap) — the context-window slicing step of a training
    * pipeline. Explode over the start offsets is a narrow generator: no
    * shuffle, rows scale by ~len/stride. Every document yields at least
    * one chunk (empty text ⇒ one empty chunk).
    */
  def chunkDocs(docs: DataFrame, width: Int = 200,
                stride: Int = 150, textCol: String = "text"): DataFrame = {
    // last start: the first one whose chunk reaches the end of the text
    // (a start beyond len - (width - stride) would emit a tail chunk the
    // previous chunk already fully covers)
    val starts = sequence(lit(1),
      greatest(length(col(textCol)) - (width - stride), lit(1)), lit(stride))
    val chunk = col(textCol).substr(col("chunk_start").cast("int"), lit(width))
    docs.select(col("doc_id"), col(textCol),
        explode(starts).as("chunk_start"))
      .select(col("doc_id"), col("chunk_start").cast("long").as("chunk_start"),
        length(chunk).cast("long").as("chunk_len"),
        md5(chunk).as("chunk_md5"))
  }

  /** Token-budget sequence packing (running-sum form): docs are laid out
    * in (lang, doc_id) order and assigned to the pack their first token
    * falls into (`floor(preceding_tokens / budget)`). Deterministic and
    * windowed per language — each partition packs in parallel, unlike
    * true first-fit-decreasing packing, which is sequential by nature
    * and would serialize the corpus through one task. Docs longer than
    * `budget` simply span packs (they get their own `ceil(n/budget)`
    * slots downstream).
    */
  def sequencePacking(docs: DataFrame, budget: Int = 2048,
                      textCol: String = "text"): DataFrame = {
    // ROWS frame pinned explicitly: the default RANGE frame gives tied
    // ordering keys the same cumulative sum, which diverges from the
    // oracle's ROWS UNBOUNDED PRECEDING whenever doc_id ever repeated
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs
      .select(col("doc_id"), col("lang"),
        size(TextOps.tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .withColumn("pack_id",
        floor((col("cum_tokens") - col("n_tokens")) / lit(budget.toDouble)))
      .groupBy(col("lang"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("pack_tokens"),
        min("doc_id").as("first_doc"))
  }

  /** The corpus quality gate: the filter [[qualityScore]]'s signals
    * feed — per language, how many documents clear the score threshold
    * and the token-length band. The reduction every curation pipeline
    * applies before training; kept as an aggregate so the oracle
    * compares pass counts, not nondeterministic row subsets.
    */
  def qualityGate(docs: DataFrame, minScore: Double = 0.5,
                  minTokens: Int = 5, maxTokens: Int = 5000): DataFrame = {
    val scored = qualityScore(docs)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
    val pass = col("quality_score") >= minScore &&
      col("n_tokens").between(minTokens, maxTokens)
    val nPassed = sum(when(pass, 1L).otherwise(0L))
    scored.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        nPassed.as("n_passed"),
        round(nPassed.cast("double") / count(lit(1)), 6).as("pass_rate"))
  }

  /** Corpus vocabulary head: top-k tokens by occurrence count with
    * document frequency — explode + two-level aggregate. The per-token
    * partial aggregation absorbs the explode volume map-side; the final
    * top-k is `TakeOrderedAndProject` with a deterministic (count desc,
    * token asc) tiebreak.
    */
  def topTokens(docs: DataFrame, k: Int = 50,
                textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
        explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("token").asc)
      .limit(k)

  /** TF-IDF-style term weighting, top-`k` terms per document. The
    * inverse-document-frequency factor is the log-free rational
    * `(N+1)/(df+1)` so both engines compute bit-identical doubles
    * (libm `ln` is not correctly-rounded and can differ in the last
    * ulp across engines — swap the log back in at deployment, where
    * no cross-engine hash compare is at stake). Plan shape: one
    * explode + (doc, term) count, a broadcastable |vocab| df table,
    * and a per-doc window for the top-k — all partial-aggregated.
    */
  def tfIdfTopTerms(docs: DataFrame, k: Int = 5,
                    textCol: String = "text"): DataFrame = {
    // pinned: the exploded term frame feeds both the tf and df branches
    // (the diamond class Materialize.once exists for); the corpus count
    // rides along as a 1-row broadcast instead of an eager .count() job
    val terms = graft.std.Materialize.once(
      docs.select(col("doc_id"), explode(TextOps.tokens(col(textCol)))
        .as("term")))
    val nDocs = docs.agg(count(lit(1)).as("_n_docs"))
    val tfBase = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("_cnt"))
    val tf = tfBase
      .withColumn("_n_tok",
        sum(col("_cnt")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id"))))
    // no broadcast hint on the df table: a real corpus vocabulary is
    // unbounded (10^7+ terms easily), so a forced broadcast risks OOM at
    // scale — AQE broadcasts from runtime stats when it actually fits.
    // df counts rows of the per-(doc, term) frame — already one row per
    // doc there, so no Expand-based countDistinct is needed, and the
    // identical tfBase subtree is exchange-reusable with the tf branch
    val df = tfBase.groupBy(col("term"))
      .agg(count(lit(1)).as("_df"))
    val scored = tf.join(df, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("_score",
        (col("_cnt").cast("double") / col("_n_tok")) *
          ((col("_n_docs") + 1).cast("double") / (col("_df") + 1)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("_score").desc, col("term").asc)
    scored.withColumn("_rank", row_number().over(w))
      .filter(col("_rank") <= k)
      .select(col("doc_id"), col("term"),
        col("_rank").cast("long").as("term_rank"),
        round(col("_score"), 6).as("tfidf"))
  }

  /** PII scrubbing: redact emails and URLs, reporting per-doc match
    * counts and the scrubbed digest. Conservative patterns chosen to
    * parse identically under Java regex and RE2 (no backtracking
    * constructs). Pure per-row expressions: embarrassingly parallel.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[^ ]+"

  def piiScrub(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val scrubbed = regexp_replace(
      regexp_replace(t, UrlPattern, "<URL>"),
      EmailPattern, "<EMAIL>")
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(t, lit(EmailPattern), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(t, lit(UrlPattern), lit(0)))
        .cast("long").as("n_urls"),
      md5(scrubbed).as("scrubbed_md5"))
  }

  /** Extended-PII patterns (t34). Like [[EmailPattern]]/[[UrlPattern]],
    * chosen to compile to the same automaton under Java regex and RE2:
    * fixed digit-run shapes, `\b` ASCII word boundaries, no alternation
    * whose match could differ between leftmost-first engines.
    */
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePattern = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val SsnPattern = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** Extended PII redaction (t34): [[piiScrub]] widened to the masking a
    * pre-training pipeline actually ships — emails, URLs, IPv4
    * addresses, phone numbers and SSN-shaped ids, each replaced by a
    * typed placeholder. Counts are taken on the RAW text; the digest is
    * of the sequentially redacted text, in an order that keeps the
    * patterns from half-eating each other: URL first (addresses and ids
    * can appear inside URLs), then email, then the 3-2-4 SSN shape
    * BEFORE the 3-3-4 phone shape (so neither nibbles the other's
    * digit runs), then IPv4.
    *
    * Pure per-row regex expressions — embarrassingly parallel, no
    * shuffle, scan-once; the 100-TB cost is exactly one codegen'd pass
    * over the text column.
    */
  def piiRedact(docs: DataFrame, textCol: String = "text"): DataFrame = {
    // null text scans as '' (the t28 rule): zero counts and the digest
    // of the empty string, not -1 sizes and a null digest
    val t = coalesce(col(textCol), lit(""))
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(t, UrlPattern, "<URL>"),
              EmailPattern, "<EMAIL>"),
            SsnPattern, "<ID>"),
          PhonePattern, "<PHONE>"),
        Ipv4Pattern, "<IP>")
    def n(p: String) =
      size(regexp_extract_all(t, lit(p), lit(0))).cast("long")
    docs.select(
      col("doc_id"),
      n(EmailPattern).as("n_emails"),
      n(UrlPattern).as("n_urls"),
      n(Ipv4Pattern).as("n_ips"),
      n(SsnPattern).as("n_ids"),
      n(PhonePattern).as("n_phones"),
      md5(redacted).as("redacted_md5"))
  }

  /** Credit-card candidate shape (t64): a bare 13–16 digit run on
    * ASCII word boundaries — the SHAPE gate; [[luhnValid]] is the
    * checksum gate that separates card numbers from order ids and
    * timestamps that happen to be long. Like the other PII patterns,
    * compiles to the same automaton under Java regex and RE2 (a
    * 17-digit run matches NOWHERE in either engine: `\b` cannot fall
    * between digits).
    */
  val CcCandidatePattern = "\\b\\d{13,16}\\b"

  /** Luhn checksum validity of a digit-run column — the actual
    * card-number test (ISO/IEC 7812): walking right-to-left, odd
    * positions count as-is, even positions double-and-digit-sum
    * (2d, or 2d−9 past 9), valid iff the total divides by 10. Pure
    * integer expressions over the split digit array, identical in
    * both engines.
    */
  def luhnValid(c: Column): Column = {
    val ds = filter(split(c, ""), s => s =!= "")
    val n = size(ds)
    val total = aggregate(
      sequence(lit(1), n),
      lit(0),
      (acc, i) => {
        val d = ascii(element_at(ds, n - i + 1)) - lit(48)
        acc + when(i % 2 === 1, d)
          .otherwise(when(d < 5, d * 2).otherwise(d * 2 - 9))
      })
    total % 10 === 0
  }

  /** Credit-card audit + redaction (t64): per document, the count of
    * card-SHAPED digit runs ([[CcCandidatePattern]]), how many pass
    * the [[luhnValid]] checksum, and the digest of the text with the
    * VALID numbers replaced by `<CC>` — the two-stage discipline a
    * real PII pipeline needs, because redacting every long digit run
    * destroys order ids and timestamps (the t34 single-stage masks
    * can't tell them apart; the checksum can).
    *
    * Redaction folds over the valid candidates in match order
    * (`aggregate` seeded with the raw text) — a candidate appearing
    * twice redacts at first encounter and the second pass no-ops, the
    * same left-to-right fold both engines run. Each replacement is
    * anchored on the SAME `\b` boundaries as [[CcCandidatePattern]]
    * (candidates are digit-only, so splicing one into a pattern needs
    * no escaping): a valid number that also occurs inside a longer
    * 17+-digit run stays untouched there — only text that actually
    * matched as a candidate redacts. Pure per-row expressions:
    * scan-once, no shuffle.
    *
    * Returns (doc_id, n_cc_candidates, n_cc_valid, redacted_md5).
    */
  def ccAudit(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val cands = regexp_extract_all(t, lit(CcCandidatePattern), lit(0))
    val valid = filter(cands, c => luhnValid(c))
    docs.select(
      col("doc_id"),
      size(cands).cast("long").as("n_cc_candidates"),
      size(valid).cast("long").as("n_cc_valid"),
      md5(aggregate(valid, t, (acc, c) => regexp_replace(acc,
          concat(lit("\\b"), c, lit("\\b")), lit("<CC>"))))
        .as("redacted_md5"))
  }

  /** Gopher-style document-quality rules (t35) — the composite
    * pre-training gate of Rae et al. 2021 (arXiv:2112.11446, table A1),
    * the rules a curation pipeline applies before any model-based
    * scoring: word-count bounds, mean-word-length bounds, a
    * symbol-to-word ceiling, a minimum fraction of alphabetic words,
    * and a minimum stopword presence. Reported per rule (the audit
    * view: WHICH rule kills a document matters as much as the verdict)
    * plus the conjunction.
    *
    * Thresholds are the paper's where the synthetic corpus can
    * exercise them (mean word length 3–10, alpha fraction 0.8,
    * symbol ratio 0.1) and scaled to the corpus where it can't (word
    * count ≥ 50 with no upper bound binding at test scale; stopword
    * rule over the [[LangMarkers]] "en" list — ≥ 2 DISTINCT markers
    * present, the paper's rule shape with the repo's deterministic
    * list).
    *
    * Tokens cross an [[TextOps.attrBarrier]] once; every rule below it
    * is a per-row expression over that attribute — no shuffle,
    * scan-once, same 100-TB shape as [[qualityScore]].
    */
  def gopherRules(docs: DataFrame, textCol: String = "text"): DataFrame = {
    // null text gates like the empty document (the t28 rule)
    val base = docs.select(col("doc_id"),
      coalesce(col(textCol), lit("")).as(textCol))
    val b = TextOps.attrBarrier(base, Seq("doc_id", textCol),
      "_toks", TextOps.tokens(col(textCol)))
    val toks = col("_toks")
    val nWords = size(toks).cast("long")
    val meanLen = gopherMeanLen(toks)
    val alphaFrac = gopherAlphaFrac(toks)
    val symbolRatio = gopherSymbolRatio(toks, col(textCol))
    val stopDistinct = gopherStopDistinct(toks)
    b.select(
      col("doc_id"),
      nWords.as("n_words"),
      round(meanLen, 6).as("mean_word_len"),
      round(alphaFrac, 6).as("alpha_word_frac"),
      round(symbolRatio, 6).as("symbol_ratio"),
      stopDistinct.as("n_stop_distinct"),
      (nWords >= 50).as("r_word_count"),
      (meanLen >= 3.0 && meanLen <= 10.0).as("r_mean_len"),
      (alphaFrac >= 0.8).as("r_alpha"),
      (symbolRatio < 0.1).as("r_symbol"),
      (stopDistinct >= 2).as("r_stop"))
      .withColumn("passes",
        col("r_word_count") && col("r_mean_len") && col("r_alpha") &&
          col("r_symbol") && col("r_stop"))
  }

  // The individual Gopher measures over a barriered token attribute —
  // shared by gopherRules and sourceReport so the gates cannot drift.
  private def gopherMeanLen(toks: Column): Column =
    when(size(toks) > 0,
      TextOps.foldSumLong(transform(toks, w => length(w).cast("long")))
        .cast("double") / size(toks)).otherwise(0.0)
  private def gopherAlphaFrac(toks: Column): Column =
    when(size(toks) > 0,
      size(filter(toks, w => w.rlike("[A-Za-z]"))).cast("double")
        / size(toks)).otherwise(0.0)
  private def gopherSymbolRatio(toks: Column, t: Column): Column =
    when(size(toks) > 0,
      size(regexp_extract_all(t, lit("#|\\.\\.\\."), lit(0)))
        .cast("double") / size(toks)).otherwise(0.0)
  private def gopherStopDistinct(toks: Column): Column =
    size(array_intersect(toks,
      array(LangMarkers.toMap.apply("en").map(lit): _*))).cast("long")

  /** The conjunction of the five Gopher gates (same thresholds as
    * [[gopherRules]]), as one boolean over a barriered token attribute.
    * `private[ext]`: [[sourceReport]] and [[Curation.curate]] compose
    * it into their single-scan pipelines.
    */
  private[ext] def gopherPasses(toks: Column, t: Column): Column =
    size(toks).cast("long") >= 50 &&
      gopherMeanLen(toks) >= 3.0 && gopherMeanLen(toks) <= 10.0 &&
      gopherAlphaFrac(toks) >= 0.8 &&
      gopherSymbolRatio(toks, t) < 0.1 &&
      gopherStopDistinct(toks) >= 2

  /** zlib redundancy profile — the compression-ratio quality gate of
    * the web-scale curation pipelines (CCNet's "well-compressing pages
    * are boilerplate" observation; RefinedWeb and Dolma both threshold
    * on it): per document, the DEFLATE-level-6 compressed/raw byte
    * ratio of the text via the native codegen expression
    * [[graft.functions.DeflateRatio]], plus the band verdict —
    * template spam and repeated boilerplate compress far below prose
    * (`r_too_repetitive`), while base64 blobs, minified bundles, and
    * encrypted noise compress at or above prose and trip
    * `r_too_random`. `passes` is the keep band `[lo, hi)`.
    *
    * A null or empty document has no bytes to compress — its ratio is
    * null and it fails the band (an empty doc is a quality reject, the
    * t28 rule restated for this gate).
    *
    * Scale: one scan, zero shuffles — the ratio is a per-row codegen'd
    * expression (one `Deflater` per evaluation, no broadcast state), so
    * the gate pipelines into the same pass as the Gopher rules. Cost is
    * O(bytes) per document like every other text gate. Spec-gated
    * (`CorpusStatsSpec`): DuckDB has no zlib, so the oracle cannot
    * express it; the spec pins exact ratios against a direct
    * `java.util.zip.Deflater` run and the band semantics.
    */
  def compressionStats(docs: DataFrame, textCol: String = "text",
                       lo: Double = 0.25, hi: Double = 0.95): DataFrame = {
    val ratio = org.apache.spark.sql.GraftColumns.deflateRatio(col(textCol))
    docs.select(
        col("doc_id"),
        length(col(textCol)).as("n_chars"),
        ratio.as("deflate_ratio"))
      .withColumn("r_too_repetitive",
        coalesce(col("deflate_ratio") < lo, lit(false)))
      .withColumn("r_too_random",
        coalesce(col("deflate_ratio") >= hi, lit(false)))
      .withColumn("passes",
        coalesce(col("deflate_ratio") >= lo && col("deflate_ratio") < hi,
          lit(false)))
  }

  /** Per-source token-distribution DIVERSITY report (t47): Shannon
    * entropy of each source's token histogram plus the normalized form
    * (H / ln(distinct) ∈ [0, 1]) — the mixture-health metric next to
    * t18's volume shares: a source whose entropy collapses is
    * template spam even when its volume looks fine (the t19/t44
    * signals aggregated to source granularity).
    *
    * 100 TB shape: corpus → (source, token) counts in ONE partial-agg
    * shuffle (the t13 shape); everything downstream runs on the
    * |sources| × |vocab| count frame, with per-source totals broadcast
    * back. Determinism: each `-p·ln p` term rounds to 9 dp (the t25
    * libm grain) and sums as DECIMAL(28,9), order-free; the normalizer
    * `ln(distinct)` rounds to 9 dp before the division.
    */
  def sourceEntropy(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val b = TextOps.attrBarrier(
      docs.select(col("doc_id"), col("source"), col(textCol)),
      Seq("doc_id", "source"), "_toks", TextOps.tokens(col(textCol)))
    val counts = b.select(col("source"), explode(col("_toks")).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("source")).agg(
      sum(col("c")).as("n_tokens"),
      count(lit(1)).as("n_distinct_tokens"))
    val p = col("c") / col("n_tokens")
    val terms = counts.join(broadcast(totals), Seq("source"))
      .select(col("source"), round(negate(p) * log(p), 9).as("_h"))
    terms.groupBy(col("source"))
      .agg(sum(col("_h").cast("decimal(28,9)")).as("_hs"))
      .join(broadcast(totals), Seq("source"))
      .select(col("source"), col("n_tokens"), col("n_distinct_tokens"),
        round(col("_hs"), 9).cast("double").as("entropy"),
        when(col("n_distinct_tokens") > 1,
          round(col("_hs").cast("double") /
            round(log(col("n_distinct_tokens")), 9), 6))
          .otherwise(0.0).as("norm_entropy"))
  }

  /** Source shingle-diversity ratio (t72): per source, distinct
    * 3-shingles over total 3-shingle occurrences — the TEMPLATE-SPAM
    * detector at source grain. t16 scores repetition WITHIN a doc;
    * a source serving thousands of near-identical boilerplate pages
    * passes every per-doc gate while its corpus-level shingle pool
    * barely grows — this ratio is where that shows (mirror-site
    * detection, SEO-farm triage, the "same page, new slug" pattern),
    * next to [[sourceEntropy]]'s token-level diversity (tokens can
    * stay diverse while 3-grams collapse — templates reuse PHRASES).
    *
    * Shingles travel as their 64-bit content hashes (the d2
    * discipline — digests shuffle, never text; both engines hash the
    * identical md5 lane so the exact distinct counts agree). One
    * corpus pass; the shuffle moves (source, hash) pairs with
    * map-side collapse. The e9 ratio is one truncating division of
    * exact longs.
    */
  def sourceShingleDiversity(docs: DataFrame, n: Int = 3): DataFrame = {
    val b = TextOps.attrBarrier(
      docs.filter(col("text").isNotNull && col("source").isNotNull)
        .select(col("doc_id"), col("source"), col("text")),
      Seq("doc_id", "source"), "_shs",
      TextOps.shingles(TextOps.tokens(col("text")), n))
    // two-level collapse instead of count+countDistinct in one agg:
    // the combined form plans an Expand (2× the exploded rows through
    // the shuffle); collapsing to (source, hash) counts first moves
    // each distinct shingle once and the second agg runs on the
    // distinct frame
    val agg = b.select(col("source"), explode(col("_shs")).as("_sh"))
      .select(col("source"), TextOps.hash64(col("_sh")).as("_h"))
      .groupBy(col("source"), col("_h"))
      .agg(count(lit(1)).as("_c"))
      .groupBy(col("source"))
      .agg(sum(col("_c")).as("n_shingles"),
        count(lit(1)).as("n_distinct_shingles"))
    val nd = b.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    agg.join(nd, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_shingles"),
        col("n_distinct_shingles"),
        expr("CAST(n_distinct_shingles * 1000000000 div n_shingles " +
          "AS BIGINT)").as("diversity_e9"),
        (expr("CAST(n_distinct_shingles * 1000000000 div n_shingles " +
          "AS BIGINT)").cast("double") / lit(1e9)).as("diversity"))
  }

  /** Per-language Zipf fit (t56): least-squares slope of ln(freq) on
    * ln(rank) over each language's token rank–frequency curve — the
    * distribution-shape corpus-health metric next to [[sourceEntropy]]
    * (entropy catches COLLAPSE; the Zipf slope catches a curve that is
    * too flat — synthetic/templated text — or too steep — boilerplate
    * dominance — even when entropy looks plausible; natural corpora
    * sit near −1, Zipf's law).
    *
    * 100 TB shape: corpus → (lang, token) counts in one partial-agg
    * shuffle (the t13/t47 shape); ranking and the moment sums run on
    * the |langs| × |vocab| count frame — window state per task is one
    * language's vocabulary, orders of magnitude below the corpus.
    * Output is |langs| rows.
    *
    * Determinism: ranks are integers pinned by (freq DESC, token ASC);
    * ln terms round to 9 dp (the t25 libm grain); moments ride the x28
    * Pearson device — linear sums DECIMAL(28,9), cross/square moments
    * as exact-rounded double products in DECIMAL(38,12) — so slope,
    * intercept, and R² divide identical doubles in both engines.
    */
  def zipfFit(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val b = TextOps.attrBarrier(
      docs.select(col("doc_id"), col("lang"), col(textCol)),
      Seq("doc_id", "lang"), "_toks", TextOps.tokens(col(textCol)))
    val counts = b.select(col("lang"), explode(col("_toks")).as("tok"))
      .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("freq"))
    val ranked = counts.withColumn("rank",
      row_number().over(Window.partitionBy(col("lang"))
        .orderBy(col("freq").desc, col("tok").asc)))
    val x = round(log(col("rank").cast("double")), 9)
    val y = round(log(col("freq").cast("double")), 9)
    val dec = "decimal(38,12)"
    val m = ranked
      .select(col("lang"), x.as("_x"), y.as("_y"))
      .groupBy(col("lang")).agg(
        count(lit(1)).as("n_distinct_tokens"),
        sum(col("_x").cast("decimal(28,9)")).as("_sx"),
        sum(col("_y").cast("decimal(28,9)")).as("_sy"),
        sum((col("_x") * col("_x")).cast(dec)).as("_sxx"),
        sum((col("_y") * col("_y")).cast(dec)).as("_syy"),
        sum((col("_x") * col("_y")).cast(dec)).as("_sxy"))
    val totals = counts.groupBy(col("lang"))
      .agg(sum(col("freq")).as("n_tokens"))
    val n = col("n_distinct_tokens").cast("double")
    def d(c: String) = col(c).cast("double")
    val covN = n * d("_sxy") - d("_sx") * d("_sy")
    val varX = n * d("_sxx") - d("_sx") * d("_sx")
    val varY = n * d("_syy") - d("_sy") * d("_sy")
    val slope = round(covN / varX, 6)
    m.join(broadcast(totals), Seq("lang"))
      .select(col("lang"), col("n_tokens"), col("n_distinct_tokens"),
        when(varX > 0, slope).as("zipf_slope"),
        when(varX > 0,
          round((d("_sy") - slope * d("_sx")) / n, 6)).as("zipf_intercept"),
        when(varX > 0 && varY > 0,
          round(covN * covN / (varX * varY), 6)).as("r2"))
  }

  /** Distinctive tokens per source (t59): the top tokens by LIFT —
    * a token's frequency share within the source over its share in the
    * whole corpus — the "what makes this feed different" report that
    * catches topic drift and injected boilerplate the way raw top
    * tokens (t13) cannot: a globally common token never surfaces here,
    * only the locally over-represented ones do.
    *
    * 100 TB shape: one partial-agg shuffle to (source, token) counts
    * (the t13/t47/t56 shape); source and corpus totals are tiny
    * aggregates broadcast back; the per-source rank window runs over
    * that count frame. `minCount` suppresses small-sample noise.
    *
    * Determinism: lift in 1e-9 fixed point via one truncating division
    * of exact DECIMAL(38) products; ranks pinned (lift DESC, token
    * ASC).
    *
    * Returns (source, token, n_in_source, n_in_corpus, lift_e9, lift,
    * rank) for the top `topK` per source.
    */
  def distinctiveTokens(docs: DataFrame, textCol: String = "text",
                        topK: Int = 5, minCount: Long = 10L): DataFrame = {
    val b = TextOps.attrBarrier(
      docs.select(col("doc_id"), col("source"), col(textCol)),
      Seq("doc_id", "source"), "_toks", TextOps.tokens(col(textCol)))
    val counts = graft.std.Materialize.once(
      b.select(col("source"), explode(col("_toks")).as("tok"))
        .groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).as("c_st")))
    val perSource = counts.groupBy(col("source"))
      .agg(sum(col("c_st")).as("n_s"))
    val perToken = counts.groupBy(col("tok"))
      .agg(sum(col("c_st")).as("c_t"))
    val total = counts.agg(sum(col("c_st")).as("n_total"))
    val lifted = counts.filter(col("c_st") >= minCount)
      .join(broadcast(perSource), Seq("source"))
      .join(perToken, Seq("tok"))
      .crossJoin(broadcast(total))
      .withColumn("lift_e9",
        expr("CAST(CAST(c_st AS DECIMAL(38,0)) * n_total * 1000000000 " +
          "div (CAST(n_s AS DECIMAL(38,0)) * c_t) AS BIGINT)"))
    val byLift = Window.partitionBy(col("source"))
      .orderBy(col("lift_e9").desc, col("tok").asc)
    lifted.withColumn("rank", row_number().over(byLift))
      .filter(col("rank") <= topK)
      .select(col("source"), col("tok").as("token"),
        col("c_st").as("n_in_source"), col("c_t").as("n_in_corpus"),
        col("lift_e9"),
        (col("lift_e9").cast("double") / lit(1e9)).as("lift"),
        col("rank"))
  }

  /** Vocabulary growth curve (t60): new-type counts per document
    * bucket in ingestion order — the Heaps'-law readout next to
    * [[zipfFit]] (Zipf describes the frequency SHAPE, Heaps how the
    * VOCABULARY grows as the corpus does). A crawl whose curve goes
    * flat is re-crawling what it already has; one that grows linearly
    * is ingesting noise (OCR garbage, random ids) — both invisible to
    * per-doc quality gates.
    *
    * "First occurrence" is by the (doc_id) ingestion order: a token
    * belongs to the bucket of the minimum doc_id containing it. The
    * cumulative curve is a running sum over the |buckets| frame — the
    * [[graft.std.PrefixSum]] situation, with the frame tiny by
    * construction here (one global window over |buckets| rows).
    *
    * 100 TB shape: corpus → (token, min doc_id) in one partial-agg
    * shuffle (min is associative — map-side combine absorbs the
    * explode volume); everything downstream runs on |buckets| rows.
    * Exact integers throughout.
    *
    * Returns (bucket, bucket_start_doc, n_new_tokens,
    * cum_distinct_tokens).
    */
  def vocabGrowth(docs: DataFrame, textCol: String = "text",
                  bucketDocs: Int = 50): DataFrame = {
    require(bucketDocs >= 1, "bucket size must be positive")
    val b = TextOps.attrBarrier(
      docs.select(col("doc_id"), col(textCol)),
      Seq("doc_id"), "_toks", TextOps.tokens(col(textCol)))
    val firstSeen = b.select(col("doc_id"), explode(col("_toks")).as("tok"))
      .groupBy(col("tok")).agg(min(col("doc_id")).as("_first"))
    val perBucket = firstSeen
      .groupBy((floor(col("_first") / bucketDocs) * bucketDocs)
        .cast("long").as("bucket_start_doc"))
      .agg(count(lit(1)).as("n_new_tokens"))
    val byStart = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket_start_doc"))
      .rowsBetween(Window.unboundedPreceding, 0)
    perBucket
      .withColumn("bucket",
        (col("bucket_start_doc") / bucketDocs).cast("long"))
      .withColumn("cum_distinct_tokens",
        sum(col("n_new_tokens")).over(byStart))
      .select(col("bucket"), col("bucket_start_doc"),
        col("n_new_tokens"), col("cum_distinct_tokens"))
  }

  /** Fractional QUALITY BUDGET per source (t43) — keep the top `frac`
    * of each source's documents by quality score: the rate-based
    * sibling of [[domainQuota]] (which caps absolute counts). A
    * curation run uses the count cap against flooding and the fraction
    * cap to equalize quality bars across sources of very different
    * sizes. Deterministic total order (score desc, doc_id asc);
    * verdicts read the UNROUNDED percent_rank, the reported rank is
    * rounded for display.
    *
    * Scale: one shuffle, partitioned by source — the window state per
    * task is one source's docs; a pathologically dominant source skews
    * the task like any per-key window, at which point the count-capped
    * [[domainQuota]] path (rank ≤ k needs no full-partition rank
    * denominator) or salted pre-aggregation is the escape hatch.
    */
  def qualityBudget(docs: DataFrame, frac: Double = 0.5,
                    textCol: String = "text"): DataFrame = {
    val b = TextOps.attrBarrier(docs.select(
      col("doc_id"), col("source"),
      coalesce(col(textCol), lit("")).as(textCol)),
      Seq("doc_id", "source", textCol),
      "_toks", TextOps.tokens(col(textCol)))
    val scored = b.select(col("doc_id"), col("source"),
      qualityScoreFromToks(col("_toks"), col(textCol))
        .as("quality_score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("quality_score").desc, col("doc_id").asc)
    scored.withColumn("_pr", percent_rank().over(w))
      .select(col("doc_id"), col("source"), col("quality_score"),
        round(col("_pr"), 6).as("pct_rank"),
        (col("_pr") <= frac).as("kept"))
  }

  /** Per-source corpus REPORT CARD (t39) — the audit table a curation
    * run publishes: per source, doc and token volume, mean quality
    * score, Gopher pass rate, and PII incidence. The point is the
    * SHAPE: every per-doc signal (tokens, quality, gates, PII counts)
    * is a per-row expression computed in ONE scan over the corpus,
    * then rolled up in one tiny aggregation keyed by source — not four
    * separate jobs re-reading 100 TB. DECIMAL sums keep the mean
    * order-free (the x1/s3 discipline); rates are exact integer
    * ratios.
    */
  def sourceReport(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val b = TextOps.attrBarrier(docs.select(
      col("doc_id"), col("source"),
      coalesce(col(textCol), lit("")).as(textCol)),
      Seq("doc_id", "source", textCol),
      "_toks", TextOps.tokens(col(textCol)))
    val t = col(textCol)
    val toks = col("_toks")
    def nPii(p: String) =
      size(regexp_extract_all(t, lit(p), lit(0)))
    val perDoc = b.select(
      col("source"),
      size(toks).cast("long").as("_n_tok"),
      qualityScoreFromToks(toks, t).as("_q"),
      gopherPasses(toks, t).cast("int").as("_pass"),
      ((nPii(EmailPattern) + nPii(UrlPattern) + nPii(Ipv4Pattern) +
        nPii(SsnPattern) + nPii(PhonePattern)) > 0)
        .cast("int").as("_pii"))
    perDoc.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("_n_tok")).as("total_tokens"),
      round(sum(col("_q").cast("decimal(38,18)")).cast("double")
        / count(lit(1)), 6).as("mean_quality"),
      round(sum(col("_pass")).cast("double") / count(lit(1)), 6)
        .as("gopher_pass_rate"),
      round(sum(col("_pii")).cast("double") / count(lit(1)), 6)
        .as("pii_rate"))
  }

  /** Repetition profile: the share of a document's 3-shingles taken by
    * its single most repeated shingle — the boilerplate/spam signal
    * quality filters threshold on. Pure per-row form: sort the doc's
    * 64-bit shingle hashes and take the longest equal run (equal hashes
    * are adjacent after the sort, so the max run length IS the max
    * per-hash count) — NO explode, NO shuffle, embarrassingly parallel.
    * The earlier explode + double-groupBy form shuffled one row per
    * distinct (doc, shingle) — mostly-unique shingles made that nearly
    * the whole explode volume (5.2 s at sf0.1 vs ~1 s for this form).
    * Hashing before the sort keeps 8-byte comparisons AND oracle
    * exactness: both dialects share the hash, so collisions collide
    * identically and counts match bit-for-bit.
    */
  def repetitionStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toksAttr = TextOps.attrBarrier(docs, Seq("doc_id"), "_toks",
      TextOps.tokens(col(textCol)))
    val hsAttr = TextOps.attrBarrier(toksAttr, Seq("doc_id"), "_hs",
      array_sort(transform(TextOps.shingles(col("_toks"), 3),
        s => TextOps.hash64(s))))
    // longest equal run via a sequential fold over the sorted hashes:
    // state = (prev hash, current run, best run); run>0 doubles as the
    // has-previous flag (hashes are non-negative, runs start at 1)
    val maxRun = aggregate(col("_hs"),
      struct(lit(0L).as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run2 = when(acc.getField("run") > 0 && acc.getField("prev") === x,
          acc.getField("run") + 1).otherwise(lit(1L))
        struct(x.as("prev"), run2.as("run"),
          greatest(acc.getField("best"), run2).as("best"))
      },
      acc => acc.getField("best"))
    hsAttr.select(col("doc_id"),
      size(col("_hs")).cast("long").as("n_shingles"),
      size(array_distinct(col("_hs"))).cast("long").as("n_distinct_shingles"),
      maxRun.as("max_shingle_count"),
      round(maxRun.cast("double") / size(col("_hs")), 6)
        .as("repetition_ratio"))
  }

  /** Deterministic domain mixing: each source keeps a target share of
    * its documents, selected by content-hash bucket — the corpus
    * re-weighting step of a training mix. Content bucketing makes the
    * sample stable across runs/engines/re-shards (and duplicate texts
    * are kept or dropped together); the per-source rate here is derived
    * from the source name (10–90%) so the operator needs no side-channel
    * config — a real pipeline passes its mixture map instead.
    */
  def domainMixture(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val rate = TextOps.hash64(col("source")) % 81 + 10
    val keep = TextOps.hash64(TextOps.normText(col(textCol))) % 100 < rate
    docs.groupBy(col("source"))
      .agg(max(rate).as("target_pct"),
        count(lit(1)).as("n_total"),
        sum(when(keep, 1L).otherwise(0L)).as("n_kept"))
  }

  /** Stratified sampling by a key column (e.g. rebalancing languages),
    * seeded for reproducibility within a Spark version.
    */
  def stratifiedSample(docs: DataFrame, stratumCol: String,
                       fractions: Map[String, Double],
                       seed: Long = 42L): DataFrame =
    docs.stat.sampleBy(stratumCol, fractions, seed)

  /** Per-language rollup — the aggregate view a corpus curator reads. */
  def langStats(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(TextOps.tokens(col(textCol)))).as("total_tokens"),
        round(avg(length(col(textCol))), 2).as("avg_chars"))

  /** Winnowing-style rolling sketch: hash every character k-gram of the
    * normalized text, keep the bottom-m hashes — a containment sketch
    * robust to local edits (two documents sharing most k-grams share
    * most of the sketch). Inline expression form; prefer
    * [[winnowingSketchAgg]] at corpus scale (referencing the normalized
    * text inside the per-gram lambda re-evaluates the regex chain per
    * gram — higher-order lambdas sit outside subexpression elimination;
    * measured ~10×).
    */
  def charKgramSketch(text: Column, k: Int = 8, m: Int = 8): Column = {
    val norm = TextOps.normText(text)
    val n = length(norm)
    val grams = transform(sequence(lit(1), n - (k - 1)),
      i => TextOps.hash64(norm.substr(i, lit(k))))
    when(n >= k, slice(array_sort(grams), 1, m))
      .otherwise(array(TextOps.hash64(norm)))
  }

  /** Corpus-scale form of [[charKgramSketch]]: normalize ONCE into an
    * attribute (generator barrier — the inline form's per-gram lambda
    * captured the regex chain and re-ran it per gram, measured ~10×),
    * then hash/sort/slice per row. NO explode of the grams and NO
    * shuffle — the earlier explode + collect_list form pushed every
    * gram hash through an exchange (~len(text) rows per doc) just to
    * sort them back per doc. A doc shorter than k contributes one
    * truncated gram — `substr` past the end returns the whole text, so
    * values equal the inline form's whole-text-hash fallback. Returns
    * (doc_id, sketch array).
    */
  def winnowingSketchAgg(docs: DataFrame, textCol: String = "text",
                         k: Int = 8, m: Int = 8): DataFrame = {
    val base = TextOps.attrBarrier(docs, Seq("doc_id"), "_ntext",
      TextOps.normText(col(textCol)))
    base.select(col("doc_id"),
      slice(array_sort(transform(
        sequence(lit(1), greatest(length(col("_ntext")) - (k - 1), lit(1))),
        i => TextOps.hash64(col("_ntext").substr(i, lit(k))))), 1, m)
        .as("sketch"))
  }

  /** Content fingerprints: md5 of normalized text, the 1-permutation
    * min-shingle hash (cheap containment sketch), and the 32-bit SimHash.
    * One generator barrier carries (normalized text, tokens, distinct
    * token hashes) as a struct ATTRIBUTE, then everything is a per-row
    * projection — no explode, no shuffle, no join. The earlier form ran
    * a separate explode+aggregate SimHash and joined it back (one
    * shuffle each side); with the hashes behind the barrier the 32 vote
    * folds read an attribute, so the md5s run once per token, not 32×.
    */
  def fingerprints(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val base = TextOps.attrBarrier(docs, Seq("doc_id"), "_b",
      struct(
        TextOps.normText(col(textCol)).as("nt"),
        TextOps.tokens(col(textCol)).as("toks"),
        transform(array_distinct(TextOps.tokens(col(textCol))),
          t => TextOps.hash64(t)).as("hh")))
    base.select(
      col("doc_id"),
      md5(col("_b").getField("nt")).as("content_md5"),
      array_min(transform(TextOps.shingles(col("_b").getField("toks"), 3),
        s => TextOps.hash64(s))).as("min_shingle_hash"),
      Dedup.simHash32FromHashes(col("_b").getField("hh")).as("simhash32"))
  }

  /** Boilerplate n-gram detection: 3-shingles that recur across many
    * documents of the SAME source (site headers, license footers,
    * navigation chrome — the text near-dedup never removes because the
    * documents differ, yet a trained model memorizes first). A shingle
    * is boilerplate for a source when it appears in ≥ `minDocs`
    * documents AND ≥ `minFrac` of the source's documents — the absolute
    * floor keeps tiny sources from flagging noise, the fraction keeps
    * the rule scale-stable as sources grow.
    *
    * Shape at 100 TB: explode distinct shingles → one partial-aggregated
    * count per (source, shingle) — the dominant shuffle carries one row
    * per distinct (source, shingle), not per occurrence — joined to a
    * tiny per-source doc-count frame (broadcast).
    */
  def boilerplateNgrams(docs: DataFrame, minDocs: Int = 5,
                        minFrac: Double = 0.2,
                        textCol: String = "text"): DataFrame = {
    val perSource = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("_n_docs_src"))
    // tokens cross a generator barrier first: shingling's slice lambda
    // captures the token column, and a non-attribute capture re-runs
    // the split+regex per shingle (the O(tokens²) trap — measured 5.9s
    // → 1.6s at sf0.1 on this very query)
    val shingleDf =
      TextOps.attrBarrier(docs.select(col("doc_id"), col("source"),
          col(textCol)), Seq("doc_id", "source"), "_toks",
          TextOps.tokens(col(textCol)))
        .select(col("doc_id"), col("source"),
          explode(array_distinct(
            TextOps.shingles(col("_toks"), 3))).as("sh"))
        .groupBy(col("source"), col("sh"))
        // array_distinct above guarantees each doc contributes each
        // shingle at most once, so every doc_id in a (source, sh) group
        // is unique — plain count equals countDistinct(doc_id) without
        // the Expand-based distinct aggregate (one less exchange phase)
        .agg(count(lit(1)).as("n_docs"))
    shingleDf.join(broadcast(perSource), "source")
      .filter(col("n_docs") >= minDocs &&
        col("n_docs").cast("double") >=
          col("_n_docs_src").cast("double") * minFrac)
      .select(col("source"), col("sh"), col("n_docs"))
  }

  /** Deterministic stratified sampling: per-stratum keep-rates (percent)
    * applied by bucketing the CONTENT hash — the language-rebalancing
    * step of corpus mixing (downsample the dominant language, keep the
    * rest). Content bucketing (not ids, not `rand()`) makes the sample
    * reproducible across runs, engines, and re-partitioning, and sends
    * every copy of a duplicated text to the same side of the cut. The
    * `salt` decorrelates this decision from every other content-bucketed
    * decision (train/test split, other sample passes) — identical salt
    * would sample exactly the training split's docs.
    *
    * Pure per-row filter: no shuffle, no state — the one sampling shape
    * that is free at 100 TB.
    */
  def stratifiedContentSample(docs: DataFrame, ratePct: Map[String, Int],
                              defaultPct: Int, salt: String = "strat1",
                              strataCol: String = "lang",
                              textCol: String = "text"): DataFrame = {
    require(ratePct.values.forall(r => r >= 0 && r <= 100) &&
      defaultPct >= 0 && defaultPct <= 100, "rates are percentages")
    val rate = ratePct.foldLeft(lit(defaultPct)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    val bucket =
      TextOps.hash64(concat(lit(salt + "|"),
        TextOps.normText(col(textCol)))) % 100
    docs.filter(bucket < rate)
      .select(col("doc_id"), col(strataCol), bucket.as("bucket"))
  }

  /** Per-domain quota: keep at most `quota` documents per source, best
    * quality first (deterministic tiebreak on doc_id) — the cap every
    * curation pipeline places on over-represented domains so one site
    * cannot dominate the mixture. One rank-window per source partition;
    * the window state is bounded by the source's documents, and skewed
    * mega-sources are exactly what [[boilerplateNgrams]]' fraction rule
    * and this cap exist to bound.
    *
    * Audit column (the d14 `cluster_leaks` discipline — every sampler
    * prices what a naive implementation would have done wrong):
    * `displaces_better` is true where this kept row's quality is BELOW
    * the best document the quota dropped from some other source — the
    * inversion a naive global top-K selector would never make, i.e.
    * exactly the diversity the per-source cap buys. Computed without
    * materializing the dropped set: within a source the highest-quality
    * dropped doc sits at rank quota+1, so ranking to quota+1 (the
    * `rank <= quota+1` filter still plans as WindowGroupLimit — one
    * extra row per source through the shuffle, asserted in ScaleSpec)
    * and MAXing the boundary row's quality gives the global dropped
    * maximum as a 1-row broadcast.
    */
  def domainQuota(docs: DataFrame, quota: Int,
                  textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality_score").desc, col("doc_id").asc)
    // both consumers below share this exact subtree, so its exchange
    // is planned once (ReusedExchange) — deliberately NOT pinned: a
    // checkpoint would hide the WindowGroupLimit pushdown the quota
    // rides at 100 TB (ScaleSpec asserts it stays in the plan)
    val ranked = docs.select(col("source"), col("doc_id"),
        qualityScoreExpr(col(textCol)).as("quality_score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= quota + 1)
    val maxDropped = ranked.filter(col("rank") === quota + 1)
      .agg(max(col("quality_score")).as("_mdq"))
    ranked.filter(col("rank") <= quota)
      .crossJoin(broadcast(maxDropped))
      .select(col("source"), col("doc_id"), col("quality_score"),
        col("rank"),
        coalesce(col("quality_score") < col("_mdq"), lit(false))
          .as("displaces_better"))
  }

  /** Deterministic sharded training order: each epoch re-orders the
    * corpus by an epoch-salted content-id hash into `shards` shards,
    * positions dense within each shard — the "global shuffle" a trainer
    * consumes shard-by-shard. Sharding is the scale design: a single
    * global row_number is one window partition (serial), while per-shard
    * positions parallelize and match how training data is actually laid
    * out (N shard files, deterministic order within each). Everything
    * derives from (epoch, doc_id), so any worker can recompute any
    * shard independently — no global sort, no driver state.
    */
  def trainOrder(docs: DataFrame, epochs: Int = 2,
                 shards: Int = 8): DataFrame = {
    require(epochs >= 1 && shards >= 1, "epochs and shards are positive")
    val byEpoch = (0 until epochs).map { e =>
      docs.select(lit(e).as("epoch"), col("doc_id"),
        TextOps.hash64(
          concat(lit(s"ord$e|"), col("doc_id").cast("string"))).as("_h"))
    }.reduce(_ unionByName _)
    val w = Window.partitionBy(col("epoch"), col("shard"))
      .orderBy(col("_h").asc, col("doc_id").asc)
    byEpoch.withColumn("shard", col("_h") % shards)
      .withColumn("shard_pos", row_number().over(w).cast("long"))
      .select("epoch", "doc_id", "shard", "shard_pos")
  }

  /** KMV (k-minimum-values) distinct-token cardinality per language
    * (t24): the sketch a 100 TB corpus-stats job uses where an exact
    * `COUNT(DISTINCT token)` would shuffle the whole vocabulary. Keep
    * the k smallest of the (deterministic) 56-bit token hashes per
    * language; with the k-th smallest at fraction U of the hash space,
    * the estimator is (k-1)/U (Bar-Yossef et al. 2002, the classic
    * bottom-k sketch). Unlike HLL, the sketch is exactly reproducible
    * cross-engine — both sides hash with the md5-derived
    * [[TextOps.hash64]], so the estimate itself is oracle-gated.
    *
    * 100 TB shape: the sketch runs as the native bottom-k aggregate
    * [[graft.functions.KmvMins]] over the RAW token-hash stream — each
    * map task folds its partition into an O(k) buffer, the shuffle
    * moves ≤ k longs per (language, partition), and merges are bottom-k
    * unions (the shard-union property proven in `CorpusStatsSpec`).
    * Nothing materializes or sorts a vocabulary anywhere on the sketch
    * path. `n_exact` (the full distinct count, for the accuracy
    * readout) is the test-scale luxury the sketch replaces at 100 TB;
    * production drops that column — and with it the only
    * vocabulary-sized shuffle in the query.
    */
  def kmvCardinality(docs: DataFrame, k: Int = 256,
                     textCol: String = "text"): DataFrame = {
    require(k >= 2, "KMV needs k >= 2 for the (k-1)/U estimator")
    // pinned: the sketch and the n_exact readout both consume the raw
    // (lang, hash) stream — without the pin each branch re-scans and
    // re-tokenizes the corpus (2x the dominant cost; plan-audited)
    val hashes = graft.std.Materialize.once(docs
      .select(col("lang"), explode(TextOps.tokens(col(textCol))).as("_tok"))
      .select(col("lang"), TextOps.hash64(col("_tok")).as("_h")))
    val kth = hashes.groupBy(col("lang"))
      .agg(org.apache.spark.sql.GraftColumns.kmvMins(col("_h"), k)
        .as("_mins"))
      .select(col("lang"),
        element_at(col("_mins"), size(col("_mins"))).as("_kth"),
        size(col("_mins")).cast("long").as("k_used"))
    val exact = hashes.distinct()
      .groupBy(col("lang")).agg(count(lit(1)).as("n_exact"))
    // hash-space fraction of the k-th minimum; 2^56 is exact in double
    // and the 56-bit -> double conversion rounds identically (IEEE) in
    // both engines, so the estimate hash-compares exactly
    val frac = col("_kth").cast("double") / lit(math.pow(2.0, 56))
    val est = round(
      when(col("k_used") < k, col("k_used").cast("double"))
        .otherwise((col("k_used") - lit(1)).cast("double") / frac), 3)
    kth.join(exact, Seq("lang"))
      .select(col("lang"), col("k_used"), col("n_exact"),
        est.as("est_distinct"),
        round((est - col("n_exact").cast("double")) /
          col("n_exact").cast("double"), 6).as("rel_err"))
  }

  /** Temperature-based domain resampling plan (t26): the data-mixing
    * step between corpus stats and training. Per-source sampling rates
    * reweight the observed token-mass mixture p_i to p_i^α (α = 0.5 —
    * the exponent-smoothing multilingual training uses to upweight
    * rare domains), normalized and scaled so the expected kept mass is
    * `targetFrac` of the corpus; each document then keeps or drops by
    * comparing its content-hash uniform against its source's rate —
    * deterministic, re-runnable, no RNG state.
    *
    * 100 TB shape: two tiny aggregations (per-source mass, then the
    * |sources|-row normalizer) and one broadcast join of the rate table
    * back onto the corpus — the fact side never shuffles. Determinism:
    * α = 0.5 is `sqrt` (IEEE-exact cross-engine, unlike libm `pow`),
    * the weight normalizer sums 9 dp-rounded weights in DECIMAL, and
    * every derived double repeats the same operation order both sides.
    */
  def temperatureResample(docs: DataFrame, targetFrac: Double = 0.5,
                          textCol: String = "text"): DataFrame = {
    // pinned: the thin (id, source, mass, uniform) frame feeds the
    // mass rollup AND the final keep/drop join — unpinned, the corpus
    // is scanned and tokenized once per consumer (plan-audited)
    val perDoc = graft.std.Materialize.once(
      docs.select(col("doc_id"), col("source"),
        size(TextOps.tokens(col(textCol))).cast("long").as("_m"),
        ((TextOps.hash64(TextOps.normText(col(textCol))) % 1000000L)
          .cast("double") / lit(1e6)).as("_u")))
    val bySrc = perDoc.groupBy(col("source")).agg(
      count(lit(1)).as("n_total"), sum(col("_m")).as("mass_tokens"))
    val tot = bySrc.agg(sum(col("mass_tokens")).as("_tot"))
    val withW = bySrc.crossJoin(broadcast(tot))
      .withColumn("_p",
        col("mass_tokens").cast("double") / col("_tot").cast("double"))
      .withColumn("_w", round(sqrt(col("_p")), 9))
    val norm = withW.agg(sum(col("_w").cast("decimal(28,9)")).as("_norm"))
    // the PUBLISHED 6 dp rate is the plan's contract (applyResamplePlan
    // enforces it), so the keep/drop readout here must use the same
    // rounded value — filtering on the raw rate would let n_kept
    // disagree with what applying the plan actually keeps
    val rates = withW.crossJoin(broadcast(norm))
      .withColumn("_rate", round(least(lit(1.0),
        (lit(targetFrac) * col("_tot").cast("double")) *
          (col("_w") / col("_norm").cast("double")) /
          col("mass_tokens").cast("double")), 6))
    perDoc.join(broadcast(rates), Seq("source"))
      .groupBy(col("source"))
      .agg(
        max(col("n_total")).as("n_total"),
        max(col("mass_tokens")).as("mass_tokens"),
        round(max(col("_p")) * 100, 4).as("mix_pct"),
        max(col("_w")).as("weight"),
        max(col("_rate")).as("rate"),
        sum(when(col("_u") < col("_rate"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("_u") < col("_rate"), col("_m")).otherwise(0L))
          .as("kept_tokens"),
        // audit (the d14 cluster_leaks discipline): what NAIVE uniform
        // downsampling at the same targetFrac would have kept — same
        // uniform lane, flat rate — so the readout prices the
        // temperature: head sources keep less than naive, tail more
        // (rate > targetFrac ⟹ n_kept ≥ naive_n_kept, monotone in u)
        sum(when(col("_u") < lit(targetFrac), 1L).otherwise(0L))
          .as("naive_n_kept"),
        sum(when(col("_u") < lit(targetFrac), col("_m")).otherwise(0L))
          .as("naive_kept_tokens"))
  }

  /** Token-budget epoch allocation (t63): given a training-token
    * budget and the α=0.5 temperature mixture over sources ([[
    * temperatureResample]]'s weight chain, reused verbatim), the
    * per-source decision table a data-constrained training run needs:
    * allocated tokens, implied EPOCHS (allocated / available — above
    * 1 the source repeats), and the `over_repeated` flag at the ~4
    * epoch knee where repeating stops paying (Muennighoff et al.
    * 2023, "Scaling Data-Constrained Language Models"). t26 decides
    * WHICH documents survive a downsample; this prices what the
    * budget implies for each source BEFORE anyone trains.
    *
    * 100 TB shape: one partial-agg shuffle to |sources| rows; the
    * total and the weight normalizer are 1-row broadcasts. Nothing
    * else moves.
    *
    * Determinism: token counts are exact longs; the weight chain is
    * t26's (9-dp sqrt, DECIMAL(28,9) normalizer); epochs divide a
    * floor-exact long by an exact long and round once (6 dp); the
    * flag compares the ROUNDED value so the boolean matches the
    * printed number.
    *
    * Returns (source, n_docs, available_tokens, weight,
    * allocated_tokens, epochs, over_repeated).
    */
  def epochAllocation(docs: DataFrame, budgetTokens: Long,
                      textCol: String = "text"): DataFrame = {
    require(budgetTokens >= 1, "need a positive token budget")
    val perSrc = docs.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(size(TextOps.tokens(col(textCol))).cast("long"))
        .as("available_tokens"))
    val tot = perSrc.agg(sum(col("available_tokens")).as("_tot"))
    val withW = perSrc.crossJoin(broadcast(tot))
      .withColumn("_w", round(sqrt(
        col("available_tokens").cast("double") /
          col("_tot").cast("double")), 9))
    val norm = withW.agg(sum(col("_w").cast("decimal(28,9)")).as("_norm"))
    withW.crossJoin(broadcast(norm))
      .withColumn("weight",
        round(col("_w") / col("_norm").cast("double"), 9))
      .withColumn("allocated_tokens",
        floor(col("weight") * lit(budgetTokens.toDouble)).cast("long"))
      .withColumn("epochs",
        round(col("allocated_tokens").cast("double") /
          col("available_tokens").cast("double"), 6))
      .withColumn("over_repeated", col("epochs") > 4.0)
      .select(col("source"), col("n_docs"), col("available_tokens"),
        col("weight"), col("allocated_tokens"), col("epochs"),
        col("over_repeated"))
  }

  /** Count-Min-sketch heavy hitters (t27): token frequencies estimated
    * from a fixed `depth × width` counter grid (Cormode & Muthukrishnan
    * 2005) — the frequency-sketch companion to t24's cardinality
    * sketch. Each occurrence increments one cell per row (cell =
    * seeded-hash mod width); a point estimate is the MIN over rows of
    * the token's cells, always ≥ the true count (one-sided error). The
    * readout estimates the exact top-`topK` tokens and emits the
    * overestimate, so sketch accuracy is itself oracle-gated — the
    * seeded hashes are md5-derived ([[TextOps.hash64Seeded]]), making
    * every cell index, and therefore every estimate, identical in
    * DuckDB.
    *
    * 100 TB shape: the sketch is `depth × width` counters regardless of
    * corpus size — the grid aggregation groups on (row, cell) with
    * map-side combine into ≤ 4096 cells, and the estimate join touches
    * |topK| × depth rows. Nothing vocabulary-sized exists on the sketch
    * path; the exact `true_count` readout is the test-scale accuracy
    * luxury (same caveat as t24's `n_exact`).
    */
  /** The CMS counter grid over a (token) frame — shared by the batch
    * heavy-hitters readout and the streaming form. The aggregation keys
    * on (row, cell) with at most depth × width groups, so the SAME code
    * runs under Structured Streaming (update/complete mode) with
    * permanently bounded state and no watermark — this grid aggregation
    * IS the streaming sketch (proven grid-equal to batch in
    * `StreamingSpec`); a consumer reads point estimates off the stored
    * grid exactly as [[cmsHeavyHitters]]'s readout does.
    */
  def cmsCells(tokens: DataFrame, width: Int = 1024,
               depth: Int = 4): DataFrame =
    tokens.select(posexplode(array((0 until depth).map(r =>
        pmod(TextOps.hash64Seeded(r, col("token")), lit(width.toLong))): _*))
        .as(Seq("r", "cell")))
      .groupBy(col("r"), col("cell")).agg(count(lit(1)).as("_cnt"))

  /** [[cmsCells]] from a documents frame (batch or streaming). */
  def cmsCellsOfDocs(docs: DataFrame, width: Int = 1024, depth: Int = 4,
                     textCol: String = "text"): DataFrame =
    cmsCells(docs.select(explode(TextOps.tokens(col(textCol))).as("token")),
      width, depth)

  def cmsHeavyHitters(docs: DataFrame, width: Int = 1024, depth: Int = 4,
                      topK: Int = 20, textCol: String = "text"): DataFrame = {
    require(width >= 2 && depth >= 1 && topK >= 1,
      "CMS needs positive width/depth/topK")
    // pinned: the token stream feeds the sketch build and the exact
    // top-k readout (one scan, two consumers)
    val stream = graft.std.Materialize.once(
      docs.select(explode(TextOps.tokens(col(textCol))).as("token")))
    def cellOf(r: Int, tok: Column): Column =
      pmod(TextOps.hash64Seeded(r, tok), lit(width.toLong))
    val cells = cmsCells(stream, width, depth)
    val top = stream.groupBy(col("token"))
      .agg(count(lit(1)).as("true_count"))
      .orderBy(col("true_count").desc, col("token").asc).limit(topK)
    // one pass over top: a depth-way union would embed the
    // vocabulary-sized groupBy+sort subtree once per branch (exchange
    // reuse across union branches is not guaranteed under AQE)
    val probes = top.select(col("token"), col("true_count"),
      posexplode(array((0 until depth).map(r =>
        cellOf(r, col("token"))): _*)).as(Seq("r", "cell")))
    probes.join(cells, Seq("r", "cell"))
      .groupBy(col("token"), col("true_count"))
      .agg(min(col("_cnt")).as("cms_estimate"))
      .select(col("token"), col("true_count"), col("cms_estimate"),
        (col("cms_estimate") - col("true_count")).as("overestimate"))
  }

  /** Apply a published [[temperatureResample]] plan to a document
    * frame: the plan (per-source `rate`) is computed once on a corpus
    * snapshot; enforcement is a pure per-row decision — the document's
    * content-hash uniform against its source's broadcast rate — with no
    * state and no fact-side shuffle. Stateless, so the SAME function
    * serves batch backfill and the live ingest stream (the production
    * split: plan on snapshots, enforce on arrival; proven batch ≡
    * stream in `StreamingSpec`). The plan's published 6 dp `rate`
    * column is the authoritative contract here — re-deriving rates
    * per batch would let the mixture drift with arrival order.
    */
  def applyResamplePlan(docs: DataFrame, plan: DataFrame,
                        textCol: String = "text"): DataFrame = {
    val u = (TextOps.hash64(TextOps.normText(col(textCol))) % 1000000L)
      .cast("double") / lit(1e6)
    docs.join(broadcast(plan.select(col("source"), col("rate"))),
        Seq("source"))
      .filter(u < col("rate"))
      .drop("rate")
  }

  /** Corpus-unigram-LM document scoring (t25): every document scored by
    * the average log-probability of its tokens under the corpus' own
    * unigram distribution — the operator shape of a CCNet/KenLM-style
    * perplexity quality filter (rare-token-heavy documents score low,
    * boilerplate scores high). Self-scoring keeps the query closed over
    * the test tables; production swaps `vocab` for a pre-trained LM
    * table, which changes nothing structurally.
    *
    * 100 TB shape: the LM table is vocabulary-sized (≪ corpus) and the
    * doc-side join is a token equi-join — shuffle bounded by the
    * per-doc term-frequency frame (`groupBy(doc_id, token)` first, so
    * the join and final rollup move one row per distinct token per doc,
    * not one per occurrence). Determinism: log-probs are rounded to
    * 9 dp (libm `ln` agrees cross-engine at that grain — verified over
    * 3×10^5 corpus-realistic ratios, bit-differences in 0.09% of raw
    * values, zero after rounding) and the per-doc sum runs in DECIMAL:
    * rounded-double → DECIMAL(28,9) recovers the exact 9 dp value, and
    * decimal × integer count and decimal addition are exact in both
    * engines, so summation order cannot move the total.
    */
  def unigramLogprob(docs: DataFrame, textCol: String = "text"): DataFrame = {
    // pinned: the per-doc term-frequency frame feeds the vocab rollup,
    // the total, and the scoring join — unpinned, each consumer re-scans
    // and re-tokenizes the corpus (3 scans; plan-audited)
    val dtf = graft.std.Materialize.once(docs
      .select(col("doc_id"), explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("_cnt_d")))
    val vocab = dtf.groupBy(col("token")).agg(sum(col("_cnt_d")).as("_cnt"))
    val total = vocab.agg(sum(col("_cnt")).as("_n_total"))
    // vocabulary-sized LM table; only the 1-row total broadcasts — at
    // 100 TB the vocab itself may exceed broadcast limits, the token
    // equi-join below handles either regime
    val lm = vocab.crossJoin(broadcast(total))
      .select(col("token"),
        round(log(col("_cnt").cast("double") /
          col("_n_total").cast("double")), 9).as("_lp"))
    dtf.join(lm, Seq("token"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("_cnt_d")).as("n_tokens"),
        round(
          sum(col("_lp").cast("decimal(28,9)") *
            col("_cnt_d").cast("decimal(9,0)")).cast("double") /
            sum(col("_cnt_d")).cast("double"), 6).as("avg_logprob"),
        min(col("_lp")).as("min_logprob"))
  }

  /** CCNet-style perplexity bucketing (t62): score every document
    * with the corpus' own unigram LM ([[unigramLogprob]]) and split
    * the corpus into HEAD / MIDDLE / TAIL by exact avg-logprob
    * tertiles — the Wenzek et al. (CCNet, 2020) curation readout,
    * where head (lowest perplexity ≈ highest avg logprob) feeds
    * training as-is, middle is kept under quota, and tail is dropped
    * or re-filtered. Reported per source so a crawl whose documents
    * sink disproportionately into the tail is visible as a source
    * problem, not an average.
    *
    * Tertile boundaries use [[Features.equalFreqBins]]'s discipline:
    * exact interpolated percentiles rounded to 6 dp, bucket = a pure
    * (value, bounds) function — never a global-rank window. Empty
    * documents ride t25's contract (the "" pseudo-token scores like
    * any other vocabulary entry), so every document lands in exactly
    * one bucket — filtering empties is t17's job, not this report's.
    *
    * 100 TB shape: scoring is t25's shuffle (per-doc term-frequency
    * frame, vocabulary-sized LM); the boundary aggregate collapses to
    * 2 doubles broadcast back; the rollup is one partial-agg shuffle
    * to |sources| × 3 rows, and the share window runs over that tiny
    * frame. Determinism: avg_logprob is t25's 6-dp pinned value;
    * bucket edges compare 6-dp doubles with `>=`; shares and averages
    * round once (6 dp), the per-bucket logprob average summing in
    * DECIMAL first.
    *
    * Returns (source, bucket, n_docs, share, avg_logprob) — share of
    * the SOURCE's scored documents in each bucket.
    */
  def perplexityBuckets(docs: DataFrame,
                        textCol: String = "text"): DataFrame = {
    val scored = unigramLogprob(docs, textCol)
      .select(col("doc_id"), col("avg_logprob"))
    val withSrc = docs.select(col("doc_id"), col("source"))
      .join(scored, Seq("doc_id"))
    val binned = Features.equalFreqBins(withSrc, "avg_logprob", 3)
    // bin counts boundaries ≤ value: bin 2 = highest avg logprob =
    // lowest perplexity = CCNet's head
    val bucket = when(col("bin") === 2, "head")
      .when(col("bin") === 1, "middle").otherwise("tail")
    val bySource = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
    binned.groupBy(col("source"), bucket.as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("avg_logprob").cast("decimal(28,6)")).cast("double")
          / count(lit(1)), 6).as("avg_logprob"))
      .withColumn("share",
        round(col("n_docs").cast("double") /
          sum(col("n_docs")).over(bySource).cast("double"), 6))
      .select(col("source"), col("bucket"), col("n_docs"), col("share"),
        col("avg_logprob"))
  }

  /** Bigram-LM document scoring (t31): every document scored by the
    * average log-probability of its token SEQUENCE under the corpus'
    * own bigram model — `ln P(w1) + Σ ln P(wi | wi-1)`, averaged over
    * n_tokens. The contextual-fluency upgrade of [[unigramLogprob]]:
    * unigram scoring cannot see scrambled word order, a bigram LM
    * punishes it (the two operators bracket the CCNet-style LM-filter
    * family). Self-scoring keeps every bigram in-vocabulary, so no
    * backoff path is needed; production swaps the two LM frames for
    * pre-trained tables.
    *
    * 100 TB shape: the per-doc bigram frame `(doc_id, w1, w2, cnt)` is
    * the only corpus-sized shuffle; the bigram LM rolls up from it
    * (corpus-bigram-sized, ≪ data) and scoring is equi-joins on
    * `(w1, w2)` / `w1` — no cross joins, the 1-row total broadcasts.
    * Determinism is t25's discipline: each `ln` rounds to 9 dp, term
    * contributions sum in DECIMAL (order-free), the average rounds to
    * 6 dp.
    */
  def bigramLogprob(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val base = graft.std.Materialize.once(TextOps.attrBarrier(
      docs.select(col("doc_id"), col(textCol)),
      Seq("doc_id"), "_toks", TextOps.tokens(col(textCol))))
    // (doc_id, w1, w2, cnt): element_at past the end is null (ANSI
    // off), so the i = n pair self-filters — no when/otherwise typing
    // dance for 1-token docs
    val dbg = graft.std.Materialize.once(base
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("_toks"))),
        i => struct(element_at(col("_toks"), i).as("w1"),
          element_at(col("_toks"), i + 1).as("w2")))).as("_bg"))
      .filter(col("_bg.w2").isNotNull)
      .groupBy(col("doc_id"), col("_bg.w1").as("w1"),
        col("_bg.w2").as("w2"))
      .agg(count(lit(1)).as("_cnt")))
    val uni = graft.std.Materialize.once(base
      .select(col("doc_id"), explode(col("_toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("_c1")))
    val total = uni.agg(sum(col("_c1")).as("_n"))
    val bgLm = dbg.groupBy(col("w1"), col("w2"))
      .agg(sum(col("_cnt")).as("_c12"))
    val bgScore = dbg
      .join(bgLm, Seq("w1", "w2"))
      .join(uni.withColumnRenamed("w", "w1"), Seq("w1"))
      .select(col("doc_id"),
        (round(log(col("_c12").cast("double") / col("_c1").cast("double")), 9)
          .cast("decimal(28,9)") *
          col("_cnt").cast("decimal(9,0)")).as("_contrib"))
    val headScore = base
      .select(col("doc_id"), element_at(col("_toks"), 1).as("w"))
      .join(uni, Seq("w"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        round(log(col("_c1").cast("double") / col("_n").cast("double")), 9)
          .cast("decimal(28,9)").as("_contrib"))
    val nTok = base.select(col("doc_id"),
      size(col("_toks")).cast("long").as("n_tokens"))
    bgScore.unionByName(headScore)
      .groupBy(col("doc_id")).agg(sum(col("_contrib")).as("_s"))
      .join(nTok, Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("_s").cast("double") / col("n_tokens").cast("double"), 6)
          .as("avg_logprob"))
  }

  /** Hashed-feature linear classifier scoring (t32): every document
    * scored by a linear model over HASHED n-gram features — the
    * fastText-style quality/domain filter every LLM pipeline runs
    * (features = unigrams + token 2-shingles, hashed into `dim`
    * buckets; score = count-weighted sum of bucket weights; keep =
    * positive logit). The weights here are a deterministic STUB
    * (md5-derived, exact multiples of 0.001 — the [[Media]] stub
    * discipline): a real deployment broadcast-joins a `dim`-row
    * pretrained weight table, which changes the plan from
    * zero-shuffle to one broadcast join and nothing else.
    *
    * 100 TB shape: with hash-derived weights the ENTIRE operator is a
    * per-row expression behind one generator barrier — no explode, no
    * join, no shuffle, whole-stage codegen; feature hashing is what
    * makes the model table O(dim) instead of O(vocabulary), which is
    * the reason production filters hash in the first place.
    * Determinism: weights are exact milli-units summed in LONG
    * (order-free, overflow-safe); the logit converts once to double,
    * divides by the feature count, and rounds to 6 dp.
    */
  def hashedClassifier(docs: DataFrame, dim: Int = 4096,
                       textCol: String = "text"): DataFrame = {
    require(dim >= 2, "need at least two buckets")
    // stub weights are exact multiples of 0.001, so they sum as LONG
    // milli-units — order-free and overflow-safe (|w| ≤ 1000 milli ×
    // docs' feature counts), no decimal-widening fights with aggregate()
    val milliWeightOf = (f: Column) =>
      (TextOps.hash64(concat(lit("w|"),
        (TextOps.hash64(f) % dim).cast("string"))) % 2001L) - 1000L
    classifierScore(classifierFeatures(docs, textCol), milliWeightOf)
  }

  /** [[hashedClassifier]] scored against a PRETRAINED weight table —
    * the production form of t32, proving the design claim on the stub:
    * swapping real weights in changes the plan from zero-shuffle to ONE
    * broadcast (nested-loop, 1-row build side) join and nothing else.
    *
    * `weights` must hold `(bucket, weight_milli)` for every bucket in
    * `[0, dim)` exactly once (weights in exact milli-units, the same
    * LONG-summation discipline as the stub). The table is packed into a
    * single dense bucket-ordered array row — O(dim) bytes broadcast
    * once, so the per-row kernel does an array index per feature, never
    * a per-feature join probe. A malformed table (missing/duplicate/
    * out-of-range buckets) fails loudly via `raise_error` naming the
    * defect, not with silently-zero weights.
    */
  def hashedClassifierWithWeights(docs: DataFrame, weights: DataFrame,
                                  dim: Int = 4096,
                                  textCol: String = "text"): DataFrame = {
    require(dim >= 2, "need at least two buckets")
    val packed = weights
      .select(col("bucket").cast("long").as("bucket"),
        col("weight_milli").cast("long").as("weight_milli"))
      .agg(
        count(lit(1)).as("_n"),
        count_distinct(col("bucket")).as("_nd"),
        min(col("bucket")).as("_lo"),
        max(col("bucket")).as("_hi"),
        transform(
          array_sort(collect_list(struct(col("bucket"), col("weight_milli")))),
          s => s.getField("weight_milli")).as("_wraw"))
      .select(
        when(col("_n") === dim && col("_nd") === dim &&
            col("_lo") === 0 && col("_hi") === dim - 1, col("_wraw"))
          .otherwise(raise_error(concat(
            lit(s"hashedClassifierWithWeights: weight table must hold " +
              s"buckets 0..${dim - 1} exactly once; got rows="),
            col("_n").cast("string"),
            lit(" distinct="), col("_nd").cast("string"),
            lit(" range=["), col("_lo").cast("string"),
            lit(","), col("_hi").cast("string"), lit("]"))))
          .as("_w"))
    val milliWeightOf = (f: Column) =>
      element_at(col("_w"), (TextOps.hash64(f) % dim).cast("int") + 1)
    classifierScore(
      classifierFeatures(docs, textCol).crossJoin(broadcast(packed)),
      milliWeightOf)
  }

  /** The t32 stub weight table AS a `(bucket, weight_milli)` DataFrame —
    * bucket `b` carries the identical md5-derived milli-weight the
    * inline stub computes, so
    * `hashedClassifierWithWeights(docs, stubWeights(spark, dim), dim)`
    * must equal `hashedClassifier(docs, dim)` row-for-row (the spec
    * asserts it). A real deployment replaces this frame with its
    * pretrained weights and nothing else changes.
    */
  def stubWeights(spark: org.apache.spark.sql.SparkSession,
                  dim: Int = 4096): DataFrame =
    spark.range(dim.toLong).select(
      col("id").as("bucket"),
      ((TextOps.hash64(concat(lit("w|"), col("id").cast("string")))
        % 2001L) - 1000L).as("weight_milli"))

  /** t32's doc→hashed-feature-array frame. TWO barriers: tokens first
    * (else the shingle slice-lambda captures the raw tokenize chain and
    * re-runs it per bigram — the O(tokens²) trap), then the feature
    * array itself (else the weight lambda re-runs the shingle transform
    * per feature). NULL text coalesces to '' up front — the t28 rule: a
    * null must survive as an accounted row, and size(null) = -1 would
    * poison n_features.
    */
  private def classifierFeatures(docs: DataFrame, textCol: String): DataFrame = {
    val toksB = TextOps.attrBarrier(
      docs.select(col("doc_id"),
        coalesce(col(textCol), lit("")).as(textCol)),
      Seq("doc_id"), "_toks", TextOps.tokens(col(textCol)))
    TextOps.attrBarrier(toksB, Seq("doc_id"), "_feats",
      concat(col("_toks"), TextOps.shingles(col("_toks"), 2)))
  }

  /** Count-weighted milli-unit sum over `_feats` → per-token logit. */
  private def classifierScore(base: DataFrame,
                              milliWeightOf: Column => Column): DataFrame = {
    val sumMilli =
      TextOps.foldSumLong(transform(col("_feats"), milliWeightOf))
    base.select(col("doc_id"),
        size(col("_feats")).cast("long").as("n_features"),
        sumMilli.as("_milli"))
      .select(col("doc_id"), col("n_features"),
        round((col("_milli").cast("double") / 1000.0) /
          col("n_features").cast("double"), 6).as("logit"))
      .withColumn("keep", col("logit") > 0)
  }

  /** Segment-level dedup (t28): remove fixed-width token segments that
    * recur across more than `maxDocs` documents and rebuild the cleaned
    * text — the *removal* counterpart of [[boilerplateNgrams]] (which
    * only reports chrome) and the CCNet line-dedup shape (their "line"
    * is our `segTokens`-token segment, since this corpus is single-line
    * text). Surgical by construction: document-level near-dedup never
    * touches these documents (the bodies differ), yet the repeated
    * header/footer segments are exactly what a trained model memorizes.
    *
    * 100 TB shape: tokens cross a generator barrier once; segments
    * shuffle as 64-bit hashes, never text — the count pass partial-aggs
    * `(hash → n_docs)` map-side and the filter frame that joins back is
    * vocabulary-of-segments sized. The rebuild is one `groupBy(doc_id)`
    * whose state is the document's own segments (bounded by doc length).
    * Every doc survives with `n_segments`/`n_removed` accounting; a doc
    * that was ALL boilerplate comes back as an empty string, not a
    * dropped row.
    *
    * Determinism: segment order is restored by sorting `(seg_idx, seg)`
    * structs — `seg_idx` is unique per doc, so the rebuild order is
    * total and the DuckDB twin's `string_agg(... ORDER BY seg_idx)`
    * matches exactly. `array_distinct` before the count means a segment
    * repeated WITHIN one doc still counts that doc once.
    */
  def segmentDedup(docs: DataFrame, segTokens: Int = 8, maxDocs: Int = 3,
                   textCol: String = "text"): DataFrame = {
    require(segTokens >= 1 && maxDocs >= 1, "positive segment width/cap")
    // NULL text → '' (one empty segment), not a vanished doc_id: a null
    // tokenizes to a null array, posexplode emits no row, and the doc
    // would silently drop from the output — breaking the every-doc-
    // survives contract the accounting columns promise
    val base = TextOps.attrBarrier(
      docs.select(col("doc_id"), coalesce(col(textCol), lit("")).as(textCol)),
      Seq("doc_id"), "_toks", TextOps.tokens(col(textCol)))
    // (doc_id, seg_idx, seg): consecutive segTokens-wide slices; the
    // last segment keeps the remainder (slice past the end truncates)
    val segs = graft.std.Materialize.once(base.select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0),
            floor((size(col("_toks")) - 1) / lit(segTokens)).cast("int")),
          i => concat_ws(" ",
            slice(col("_toks"), i * segTokens + 1, lit(segTokens))))))
      .select(col("doc_id"), col("pos").as("seg_idx"),
        TextOps.hash64(col("col")).as("_h"), col("col").as("seg")))
    // docs-per-segment on the 64-bit hash — one shingle-free shuffle of
    // (hash) keys with map-side partial counts; count(distinct) is safe
    // to flatten because each (doc, hash) pair enters once per doc via
    // the groupBy below
    val counts = segs.select(col("doc_id"), col("_h")).distinct()
      .groupBy(col("_h")).agg(count(lit(1)).as("_n_docs"))
    segs.join(counts, Seq("_h"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(when(col("_n_docs") > maxDocs, 1L).otherwise(0L))
          .as("n_removed"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("_n_docs") <= maxDocs,
            struct(col("seg_idx"), col("seg"))))),
          s => s.getField("seg"))).as("clean_text"))
      .select(col("doc_id"), col("clean_text"), col("n_segments"),
        col("n_removed"))
  }

  /** Sliding-span exact-substring dedup (t77): remove from every
    * document ANY duplicated token span of at least `minTokens` tokens,
    * wherever it starts — the ExactSubstr shape of Lee et al.
    * ("Deduplicating Training Data Makes Language Models Better") that
    * [[segmentDedup]] (t28) cannot express: t28's fixed segment grid
    * only catches spans that happen to be segment-aligned, while a
    * quote shifted by one token slips through. Here EVERY token offset
    * opens a window, so a recurring span is caught at any alignment,
    * and overlapping duplicated windows merge into one maximal removed
    * span by offset arithmetic (a 12-token recurring run is 5
    * overlapping 8-token windows → ONE island covering all 12 tokens).
    *
    * Divergence from the paper, on purpose: Lee et al. keep one copy of
    * each duplicated span; keeping "the first" requires a global total
    * order over occurrences (a corpus-wide sort on a 100 TB run for a
    * tie-break no downstream consumer observes). This removes ALL
    * copies of any span occurring more than `maxOcc` times corpus-wide
    * (within-doc repeats count — self-plagiarized chrome is chrome) —
    * the same all-copies boilerplate-removal semantics t28 already
    * established, fully parallel and deterministic.
    *
    * 100 TB shape, linear in tokens: windows shuffle as 56-bit md5-lane
    * hashes, never text (one (hash → occurrences) partial agg, one
    * hash join back). Island merge is a per-document sort of DUPLICATED
    * window offsets only (two ints per row, empty for clean docs —
    * the window function's partition is doc-sized, not corpus-sized).
    * The rebuild touches each doc once; the per-position coverage probe
    * scans the doc's own island list (bounded by doc length / L).
    * Every doc survives with accounting — an all-duplicate doc comes
    * back as an empty string, not a dropped row (the t28 contract).
    *
    * Returns (doc_id, clean_text, n_tokens, n_spans, n_removed_tokens).
    */
  def spanDedup(docs: DataFrame, minTokens: Int = SpanMinTokens,
                maxOcc: Int = SpanMaxOcc,
                textCol: String = "text"): DataFrame = {
    require(minTokens >= 2, "a span is at least 2 tokens")
    require(maxOcc >= 1, "a span always occurs at least once")
    val L = minTokens
    val base = spanBase(docs, textCol)
    val wins = graft.std.Materialize.once(spanWindowHashes(base, L))
    // corpus-wide occurrence count per window hash — positions count,
    // not distinct docs: a span repeated twice inside ONE doc is dup
    val counts = wins.groupBy(col("_h"))
      .agg(count(lit(1)).as("_occ"))
    val dups = wins.join(counts.filter(col("_occ") > maxOcc), Seq("_h"))
      .select(col("doc_id"), col("off"))
    spanRebuild(base, dups, L)
  }

  /** (doc_id, off, _h) window-hash frame over a [[spanBase]] frame:
    * one window per token offset, 1-based; docs shorter than L open no
    * windows (nothing that short can span-dup). Fingerprints come from
    * the native prefix-polynomial kernel
    * ([[graft.functions.SpanWindowHashes]], r21): the expression-tree
    * form built one L-token string + md5 per window — O(L) string work
    * each — where the kernel emits every window in O(1) from one
    * prefix pass. Internal equality keys only (see the kernel's
    * contract note); shared by [[spanDedup]], [[spanIndex]], and
    * [[spanDedupIncrement]] so the three sides of the incremental
    * contract hash the identical window expression.
    */
  private def spanWindowHashes(base: DataFrame, L: Int): DataFrame =
    base.select(col("doc_id"),
      posexplode(org.apache.spark.sql.GraftColumns
        .spanWindowHashes(col("_toks"), L)))
      .select(col("doc_id"), (col("pos") + 1).as("off"),
        col("col").as("_h"))

  /** The span INDEX a production t77 pipeline persists between crawls:
    * corpus-wide occurrence counts per L-token window hash —
    * [[spanDedup]]'s `counts` stage materialized as standing state, so
    * an increment can be span-cleaned against the standing corpus
    * without re-scanning it ([[spanDedupIncrement]]). 100 TB shape:
    * the index is |corpus windows| rows of (56-bit hash, count) — at
    * scale it lives as a hash-bucketed table so the increment-side
    * lookup prunes buckets instead of scanning; here it rides a
    * session-memoized checkpoint.
    *
    * Returns (span_h, occ).
    */
  def spanIndex(docs: DataFrame, minTokens: Int = SpanMinTokens,
                textCol: String = "text"): DataFrame =
    spanWindowHashes(spanBase(docs, textCol), minTokens)
      .groupBy(col("_h")).agg(count(lit(1)).as("occ"))
      .select(col("_h").as("span_h"), col("occ"))

  /** Incremental t77: span-dedup an INCREMENT against a standing
    * corpus's [[spanIndex]]. A window is duplicated when its total
    * occurrences across standing + increment exceed `maxOcc` — which
    * is EXACTLY the count a full rebuild over standing ∪ increment
    * computes for any window occurring in the increment, so the
    * increment's cleaned text equals the full rebuild's for the same
    * doc ids (spec-proven on the v2 crawl fixture). The standing
    * corpus's own cleaning is FROZEN by contract: its artifacts
    * shipped with the previous crawl, and a fixture whose increment
    * introduces no new ≥L-token verbatim run into standing text (the
    * realistic shape — new crawls mutate, they don't replay old text
    * verbatim off-chrome) leaves the full rebuild's standing rows
    * unchanged too, making the freeze exact rather than approximate
    * (also spec-asserted).
    *
    * 100 TB shape: O(increment) window explode + one partial agg over
    * increment hashes, then one lookup join against the standing index
    * (bucket-pruned at scale, see [[spanIndex]]); island merge and
    * rebuild are t77's per-doc kernels over increment docs only.
    *
    * Returns (doc_id, clean_text, n_tokens, n_spans, n_removed_tokens).
    */
  def spanDedupIncrement(docs: DataFrame, standingIndex: DataFrame,
                         minTokens: Int = SpanMinTokens,
                         maxOcc: Int = SpanMaxOcc,
                         textCol: String = "text"): DataFrame = {
    require(minTokens >= 2, "a span is at least 2 tokens")
    require(maxOcc >= 1, "a span always occurs at least once")
    val L = minTokens
    val base = spanBase(docs, textCol)
    val wins = graft.std.Materialize.once(spanWindowHashes(base, L))
    val dups = wins.join(incrementDupHashes(wins, standingIndex, maxOcc),
        Seq("_h"))
      .select(col("doc_id"), col("off"))
    spanRebuild(base, dups, L)
  }

  /** Tokenized per-doc frame shared by the span-dedup family:
    * (doc_id, _toks, _n). NULL text → '' (one empty token), not a
    * vanished doc_id — the every-doc-survives contract (t28 rule).
    */
  private def spanBase(docs: DataFrame, textCol: String): DataFrame =
    TextOps.attrBarrier(
      docs.select(col("doc_id"), coalesce(col(textCol), lit("")).as(textCol)),
      Seq("doc_id"), "_toks", TextOps.tokens(col(textCol)))
      .select(col("doc_id"), col("_toks"),
        size(col("_toks")).as("_n"))

  /** The span-dedup island merge + rebuild shared by [[spanDedup]]
    * (exact windows) and [[nearDupSpanDedup]] (1-mismatch windows):
    * merge flagged window offsets into maximal islands per doc, then
    * rebuild each doc keeping only uncovered positions.
    */
  private def spanRebuild(base: DataFrame, dups: DataFrame,
                          L: Int): DataFrame = {
    // island merge: windows at o1 < o2 cover contiguously iff
    // o2 <= o1 + L (coverage [o, o+L-1]); a running break-flag sum
    // numbers the maximal islands (offsets are per-doc sorted here,
    // so the previous offset's coverage end is the running max)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("off"))
    val prev = lag(col("off"), 1).over(w)
    val islands = dups
      .withColumn("_brk",
        when(prev.isNull || col("off") > prev + L, 1).otherwise(0))
      .withColumn("_isl", sum(col("_brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("_isl"))
      .agg(min(col("off")).as("_s"),
        (max(col("off")) + (L - 1)).as("_e"))
    val perDoc = islands.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("_e") - col("_s") + 1).as("n_removed_tokens"),
        collect_list(struct(col("_s"), col("_e"))).as("_iv"))
    // rebuild: keep positions covered by no island. The isNull branch
    // is load-bearing twice over — it skips the probe entirely for
    // clean docs (the common case), and `exists` over a NULL island
    // list would yield NULL, which `filter` reads as drop-everything.
    val kept = filter(sequence(lit(1), col("_n")),
      p => !exists(col("_iv"),
        iv => p >= iv.getField("_s") && p <= iv.getField("_e")))
    base.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("_iv").isNull, concat_ws(" ", col("_toks")))
          .otherwise(concat_ws(" ",
            transform(kept, p => element_at(col("_toks"), p))))
          .as("clean_text"),
        col("_n").cast("long").as("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_removed_tokens"), lit(0L)).cast("long")
          .as("n_removed_tokens"))
  }

  /** Near-duplicate span dedup (t79): the NearDup half of Lee et al.
    * at SPAN grain — [[spanDedup]] (t77) removes token spans recurring
    * VERBATIM at any alignment, but syndicated text with per-feed
    * tweaks (one substituted token per copy: a tracking token, a feed
    * name, an `_$i` suffix) never repeats verbatim and slips through.
    * Here a window is duplicated if it recurs up to ONE substituted
    * token: every L-token window emits L "leave-one-out" fingerprints
    * (slot i + the window with token i removed, hashed on the shared
    * 56-bit md5 lane), and two windows differing only at position p
    * collide exactly on the slot-p fingerprint — detection is
    * DETERMINISTIC (no banding recall curve), and exact duplicates
    * collide on all L fingerprints, so t79's flagged set is a strict
    * superset of t77's at the same L/maxOcc. Flagged offsets then run
    * the same island merge + rebuild as t77.
    *
    * Why not per-window SimHash + banded Hamming (the d3/s4 kernels):
    * a SimHash bit is a ±1 vote margin over the window's L features,
    * and with L = 8 a one-token substitution flips each bit with
    * probability ≈ P(|vote| ≤ 2)/4 ≈ 0.25 — expected Hamming ≈ 14 of
    * 56, so banded Hamming at any usable threshold is either wildly
    * lossy (4×14 bands: P(one band clean) ≈ 2%) or quadratic (wide
    * thresholds force pair verification). Vote margins concentrate
    * only when windows are long; at short-window grain the exact
    * leave-one-out kernel is both cheaper and replayable move-for-move
    * in the DuckDB twin. The trade is scope: ONE substitution per
    * window, by construction. An insertion/deletion shifts alignment
    * mid-window and is out of scope (its flanks, if ≥ L tokens, are
    * exact spans t77 already removes). Boundary behavior, by the same
    * definition: a window holding L−1 shared tokens plus ONE
    * doc-unique neighbor IS a 1-mismatch dup across copies, so removal
    * bleeds exactly one token of unique text into each flank of a
    * shared run (asserted in the adversarial spec) — acceptable for
    * boilerplate removal, where the boundary token is chrome-adjacent
    * by definition.
    *
    * 100 TB shape, linear in tokens × L: fingerprints shuffle as
    * 56-bit hashes, never text (one (hash → occurrences) partial agg,
    * one hash join back, one distinct at (doc, off) grain — L× t77's
    * shuffle rows, same discipline); the island merge and rebuild are
    * t77's own per-doc kernels, unchanged.
    *
    * Returns (doc_id, clean_text, n_tokens, n_spans, n_removed_tokens).
    */
  def nearDupSpanDedup(docs: DataFrame, minTokens: Int = SpanMinTokens,
                       maxOcc: Int = SpanMaxOcc,
                       textCol: String = "text"): DataFrame = {
    require(minTokens >= 2, "a span is at least 2 tokens")
    require(maxOcc >= 1, "a span always occurs at least once")
    val L = minTokens
    val base = spanBase(docs, textCol)
    val loo = graft.std.Materialize.once(looFingerprints(base, L))
    val counts = loo.groupBy(col("_h"))
      .agg(count(lit(1)).as("_occ"))
    // a window is near-dup if ANY of its fingerprints recurs; the
    // distinct collapses multi-slot matches to one (doc, off) row
    val dups = loo.join(counts.filter(col("_occ") > maxOcc), Seq("_h"))
      .select(col("doc_id"), col("off")).distinct()
    spanRebuild(base, dups, L)
  }

  /** (doc_id, off, _h) leave-one-out fingerprint frame over a
    * [[spanBase]] frame: L slot-keyed fingerprints per window (slot i
    * + the window minus token i+1). The slot is keyed IN so windows
    * can only collide slot-for-slot (same substituted position).
    * Fingerprints come from the native prefix-polynomial kernel
    * ([[graft.functions.LooSpanHashes]], r21): the expression-tree
    * form built L leave-one-out strings + md5s per window — this was
    * the single hottest kernel in the suite (60 s of task time on one
    * warm sf0.1 curation pipeline) — where the kernel emits each
    * fingerprint in O(1) from one prefix pass. Internal equality keys
    * only (see the kernel's contract note); shared by
    * [[nearDupSpanDedup]], [[nearDupSpanIndex]], and
    * [[nearDupSpanDedupIncrement]] so the three sides of the
    * incremental contract hash the identical fingerprint expression.
    * The kernel's array is window-major (entry w·L + s), so `off` is
    * the window index `pos div L`, 1-based.
    */
  private def looFingerprints(base: DataFrame, L: Int): DataFrame =
    base.select(col("doc_id"),
        posexplode(org.apache.spark.sql.GraftColumns
          .looSpanHashes(col("_toks"), L)))
      .select(col("doc_id"),
        (expr(s"pos div $L") + 1).cast("int").as("off"),
        col("col").as("_h"))

  /** The standing index a production t79 pipeline persists between
    * crawls: corpus-wide occurrence counts per leave-one-out
    * fingerprint — [[nearDupSpanDedup]]'s `counts` stage materialized
    * as standing state (the t79 analogue of [[spanIndex]], same
    * (span_h, occ) shape, L× the rows). At scale it lives as a
    * hash-bucketed table so the increment-side lookup prunes buckets.
    */
  def nearDupSpanIndex(docs: DataFrame, minTokens: Int = SpanMinTokens,
                       textCol: String = "text"): DataFrame =
    looFingerprints(spanBase(docs, textCol), minTokens)
      .groupBy(col("_h")).agg(count(lit(1)).as("occ"))
      .select(col("_h").as("span_h"), col("occ"))

  /** Incremental t79: near-dup span-dedup an INCREMENT against a
    * standing corpus's [[nearDupSpanIndex]]. A window is flagged when
    * ANY of its leave-one-out fingerprints totals more than `maxOcc`
    * occurrences across standing + increment — exactly the count a
    * full rebuild over standing ∪ increment computes for any
    * fingerprint occurring in the increment, so increment cleaning is
    * EXACT (the same argument as [[spanDedupIncrement]], fingerprint
    * lane swapped). 100 TB shape: O(increment · L) explode + one
    * partial agg over increment fingerprints + one lookup join against
    * the standing index; island merge and rebuild are per-doc kernels
    * over increment docs only.
    */
  def nearDupSpanDedupIncrement(docs: DataFrame, standingIndex: DataFrame,
                                minTokens: Int = SpanMinTokens,
                                maxOcc: Int = SpanMaxOcc,
                                textCol: String = "text"): DataFrame = {
    require(minTokens >= 2, "a span is at least 2 tokens")
    require(maxOcc >= 1, "a span always occurs at least once")
    val L = minTokens
    val base = spanBase(docs, textCol)
    val loo = graft.std.Materialize.once(looFingerprints(base, L))
    val dups = loo.join(incrementDupHashes(loo, standingIndex, maxOcc),
        Seq("_h"))
      .select(col("doc_id"), col("off")).distinct()
    spanRebuild(base, dups, L)
  }

  /** Advance a standing fingerprint index by one shipped crawl:
    * occurrence counts are ADDITIVE over disjoint doc sets, so
    * merge(index(A), index(B)) == index(A ∪ B) exactly — for all three
    * index kinds ([[spanIndex]], [[nearDupSpanIndex]],
    * [[cdcSegmentIndex]]: same (span_h, occ) shape; CDC segment
    * boundaries are per-doc, so B's segments are the union's). This is
    * the index-update half of the incremental contract: after a crawl
    * ships, the NEXT crawl must count against standing ∪ increment,
    * and the merge costs one co-partitioned sum over index rows — text
    * is never re-scanned (at 100 TB both sides live hash-bucketed on
    * span_h, making this a bucket-local upsert).
    */
  def indexMerge(standing: DataFrame, incIndex: DataFrame): DataFrame =
    standing.unionByName(incIndex)
      .groupBy(col("span_h")).agg(sum(col("occ")).as("occ"))

  /** The incremental duplication rule shared by the three *Increment
    * kernels: total occurrences per fingerprint = the increment's own
    * count + the standing index's count (absent → 0), flagged when the
    * total exceeds `maxOcc` — which is exactly what a full rebuild over
    * standing ∪ increment counts for any fingerprint occurring in the
    * increment. Returns the flagged `_h` set (one partial agg over
    * increment fingerprints + one lookup join against the index).
    */
  private def incrementDupHashes(fps: DataFrame, standingIndex: DataFrame,
                                 maxOcc: Int): DataFrame = {
    val own = fps.groupBy(col("_h")).agg(count(lit(1)).as("_inc_occ"))
    own.join(standingIndex, own("_h") === standingIndex("span_h"), "left")
      .select(own("_h"),
        (col("_inc_occ") + coalesce(col("occ"), lit(0L))).as("_occ"))
      .filter(col("_occ") > maxOcc)
      .select(col("_h"))
  }

  /** Content-defined chunk dedup (t80): the storage-dedup / CDC kernel
    * at token grain — segment boundaries are ANCHOR TOKENS (content
    * hash lands in 1/`avgSegTokens` of the seeded lane), segments are
    * the runs between anchors, and a segment recurring more than
    * `maxOcc` times corpus-wide is removed wherever it appears.
    * Because boundaries derive from CONTENT, not position, an
    * insertion in one copy re-segments only the chunk containing it;
    * every other chunk of a shared run still matches — alignment-free
    * like t77, but at ~1/avgSegTokens the fingerprint count.
    *
    * Where it sits in the dedup matrix: t28 = fixed grid (cheapest,
    * alignment-fragile), t80 = content-defined chunks (cheap,
    * alignment-free, chunk-granular), t77 = every-offset windows
    * (exact to the token, avgSegTokens× the hashes), t79 = 1-mismatch
    * windows (near-dup). t80's flagged positions are a PROVABLE
    * subset of t77's at the same minTokens (a duplicated ≥ L-token
    * segment contains duplicated L-windows — asserted on random
    * corpora in the spec): it is the under-approximation a 100 TB run
    * chooses when t77's per-offset fingerprint volume exceeds budget.
    * The granularity trade, documented: spans shorter than a segment,
    * and the partial chunks at a shared run's boundaries (up to one
    * segment each side), are missed.
    *
    * 100 TB shape: one token explode, one per-(doc, segment) partial
    * agg whose shuffle carries (pos, 56-bit token hash) pairs — never
    * text (the segment fingerprint is the md5 lane over the ORDERED
    * token-hash CSV, replayed identically in DuckDB), one
    * (fingerprint → occurrences) agg over ~tokens/avgSegTokens rows,
    * and the t77 island merge/rebuild over dup positions only.
    * Segments shorter than `minTokens` never participate (the CDC
    * min-chunk rule — a 2-token segment between close anchors would
    * collide on common phrases).
    *
    * Returns (doc_id, clean_text, n_tokens, n_spans, n_removed_tokens).
    */
  def cdcSegmentDedup(docs: DataFrame, minTokens: Int = SpanMinTokens,
                      maxOcc: Int = SpanMaxOcc,
                      avgSegTokens: Int = CdcAvgSegTokens,
                      textCol: String = "text"): DataFrame = {
    require(minTokens >= 2, "a removable segment is at least 2 tokens")
    require(maxOcc >= 1, "a segment always occurs at least once")
    require(avgSegTokens >= 2, "anchor rate must leave room for chunks")
    val base = spanBase(docs, textCol)
    val segs = cdcSegFrame(base, minTokens, avgSegTokens)
    val counts = segs.groupBy(col("_h")).agg(count(lit(1)).as("_occ"))
    val dups = segs.join(counts.filter(col("_occ") > maxOcc), Seq("_h"))
      .select(col("doc_id"),
        explode(sequence(col("_s"), col("_e"))).as("off"))
    // L = 1: dup positions are explicit intervals already — the island
    // merge degenerates to contiguous-position interval union
    spanRebuild(base, dups, 1)
  }

  /** (doc_id, _s, _e, _h) content-defined segment frame over a
    * [[spanBase]] frame: anchor tokens on the seeded `cdc|` lane open
    * segments, the fingerprint is the md5 lane over the ORDERED
    * token-hash CSV (struct sort by position — the x41 total-order
    * rule), segments under `minTokens` never participate (the CDC
    * min-chunk rule). Shared by [[cdcSegmentDedup]],
    * [[cdcSegmentIndex]], and [[cdcSegmentDedupIncrement]] so the
    * three sides of the incremental contract segment and hash
    * identically — and because boundaries derive from each doc's OWN
    * content, an increment doc's segments are the same frame a full
    * rebuild would compute for it.
    */
  private def cdcSegFrame(base: DataFrame, minTokens: Int,
                          avgSegTokens: Int): DataFrame = {
    val toks = base
      .select(col("doc_id"), posexplode(col("_toks")))
      .select(col("doc_id"), (col("pos") + 1).as("_p"),
        TextOps.hash64(col("col")).as("_th"),
        when(TextOps.hash64(concat(lit("cdc|"), col("col")))
          % avgSegTokens === 0, 1).otherwise(0).as("_a"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("_p"))
    val seg = toks.withColumn("_seg", sum(col("_a")).over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    seg.groupBy(col("doc_id"), col("_seg"))
      .agg(min(col("_p")).as("_s"), max(col("_p")).as("_e"),
        TextOps.hash64(concat_ws(",",
          transform(array_sort(collect_list(struct(col("_p"), col("_th")))),
            x => x.getField("_th")))).as("_h"))
      .filter(col("_e") - col("_s") + 1 >= minTokens)
  }

  /** The standing index a production t80 pipeline persists between
    * crawls: corpus-wide occurrence counts per content-defined segment
    * fingerprint — [[cdcSegmentDedup]]'s `counts` stage materialized as
    * standing state (the t80 analogue of [[spanIndex]], same
    * (span_h, occ) shape at ~1/avgSegTokens the rows).
    */
  def cdcSegmentIndex(docs: DataFrame, minTokens: Int = SpanMinTokens,
                      avgSegTokens: Int = CdcAvgSegTokens,
                      textCol: String = "text"): DataFrame =
    cdcSegFrame(spanBase(docs, textCol), minTokens, avgSegTokens)
      .groupBy(col("_h")).agg(count(lit(1)).as("occ"))
      .select(col("_h").as("span_h"), col("occ"))

  /** Incremental t80: CDC segment-dedup an INCREMENT against a
    * standing corpus's [[cdcSegmentIndex]]. Segment boundaries derive
    * from each doc's own content ([[cdcSegFrame]]), so an increment
    * doc's segments ARE the full rebuild's; a segment is removed when
    * its fingerprint totals more than `maxOcc` occurrences across
    * standing + increment — the full rebuild's count for any segment
    * occurring in the increment, making increment cleaning EXACT (the
    * [[spanDedupIncrement]] argument at segment grain). 100 TB shape:
    * one O(increment) token explode + per-(doc, segment) partial agg +
    * one lookup join against the standing index.
    */
  def cdcSegmentDedupIncrement(docs: DataFrame, standingIndex: DataFrame,
                               minTokens: Int = SpanMinTokens,
                               maxOcc: Int = SpanMaxOcc,
                               avgSegTokens: Int = CdcAvgSegTokens,
                               textCol: String = "text"): DataFrame = {
    require(minTokens >= 2, "a removable segment is at least 2 tokens")
    require(maxOcc >= 1, "a segment always occurs at least once")
    require(avgSegTokens >= 2, "anchor rate must leave room for chunks")
    val base = spanBase(docs, textCol)
    val segs = graft.std.Materialize.once(
      cdcSegFrame(base, minTokens, avgSegTokens))
    val dups = segs.join(incrementDupHashes(segs, standingIndex, maxOcc),
        Seq("_h"))
      .select(col("doc_id"),
        explode(sequence(col("_s"), col("_e"))).as("off"))
    spanRebuild(base, dups, 1)
  }

  /** Per-source span-duplication pressure (t78): [[spanDedup]] rolled
    * up to SOURCE grain — what share of each feed's tokens sit inside
    * corpus-duplicated spans. The decision readout over t77's
    * mechanism: t77 says WHICH tokens to cut, this says WHICH FEEDS
    * are chrome (a source whose removed share is high is syndication/
    * boilerplate to de-prioritize at ingestion — the t74 drop-the-feed
    * question answered by span evidence instead of shingle overlap).
    * Verdicts: `chrome_heavy` ≥ 30% of tokens removed, `clean` ≤ 5%,
    * else `mixed` — exact fixed-point shares, never float drift.
    *
    * 100 TB shape: the t77 chain unchanged (hash-only shuffles) plus
    * one doc_id equi-join to recover the source column and ONE
    * |sources|-row partial agg — nothing new materializes at corpus
    * grain.
    *
    * Returns (source, n_docs, n_tokens, n_spans, n_removed_tokens,
    * removed_share_e9, verdict).
    */
  def sourceSpanPressure(docs: DataFrame, minTokens: Int = SpanMinTokens,
                         maxOcc: Int = SpanMaxOcc): DataFrame = {
    val cleaned = spanDedup(docs, minTokens, maxOcc)
    cleaned.join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_spans")).as("n_spans"),
        sum(col("n_removed_tokens")).as("n_removed_tokens"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("n_spans"), col("n_removed_tokens"),
        // the t71 overflow guard: a 100 TB feed holds tens of billions
        // of tokens, and a bare BIGINT multiply by 1e9 wraps negative
        // (ANSI off) where DuckDB errors — widen before the multiply
        expr("CAST(CAST(n_removed_tokens AS DECIMAL(38,0)) " +
          "* 1000000000 div n_tokens AS BIGINT)")
          .as("removed_share_e9"))
      .withColumn("verdict",
        when(col("removed_share_e9") >= 300000000L, lit("chrome_heavy"))
          .when(col("removed_share_e9") <= 50000000L, lit("clean"))
          .otherwise(lit("mixed")))
  }

  /** Repeated n-gram span fraction (t49): for every document, the
    * share of its `n`-token windows whose content also occurs in at
    * least one OTHER document — the corpus-level exact-substring
    * duplication signal (Lee et al., "Deduplicating Training Data
    * Makes Language Models Better": memorized spans survive document
    * near-dedup because the containing documents differ). Documents
    * with a high `repeated_frac` are candidates for span-level
    * removal; t28's segment dedup is the surgical follow-up.
    *
    * Differs from [[boilerplateNgrams]] in grain and scope: per-DOC
    * fractions (not per-source shingle lists), every window position
    * counted (not distinct shingles), corpus-wide (not within-source).
    *
    * 100 TB shape: windows travel as 56-bit md5-lane hashes, never
    * text. Three bounded shuffles on 16-byte rows: (doc, gram) →
    * occurrence counts; gram → document frequency; the pair frame
    * re-keyed by gram for the DF join, then a per-doc rollup.
    * `n_windows` comes straight from the token count — the explode
    * never needs re-counting. A gram hash collision (2^-56) would
    * merge two windows; acceptable for a scoring signal, and the
    * oracle hashes identically so the scores still match.
    */
  def repeatedNgramSpans(docs: DataFrame, n: Int = 5,
                         textCol: String = "text"): DataFrame = {
    require(n >= 2, "window size must be at least 2 tokens")
    val b = TextOps.attrBarrier(
      docs.select(col("doc_id"), col(textCol)),
      Seq("doc_id"), "_toks", TextOps.tokens(col(textCol)))
    val base = b.select(col("doc_id"),
      greatest(coalesce(size(col("_toks")) - (n - 1), lit(0)), lit(0))
        .cast("long").as("n_windows"))
    // native prefix-poly window fingerprints (internal equality keys —
    // see SpanHash's contract note); the transform form additionally
    // ran its md5 INSIDE the lambda, i.e. interpreted per window
    val grams = b.select(col("doc_id"),
      explode(org.apache.spark.sql.GraftColumns
        .spanWindowHashes(col("_toks"), n)).as("g"))
    // diamond: the pair frame feeds both the gram-DF aggregate and the
    // DF join — pinned so the token explode runs once (Materialize doc)
    val pairs = graft.std.Materialize.once(
      grams.groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("_c")))
    val dfg = pairs.groupBy(col("g")).agg(count(lit(1)).as("_n_docs"))
    val rep = pairs.join(dfg.filter(col("_n_docs") >= 2), Seq("g"))
      .groupBy(col("doc_id")).agg(sum(col("_c")).as("_rep"))
    base.join(rep, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_windows"),
        coalesce(col("_rep"), lit(0L)).as("n_repeated"),
        when(col("n_windows") > 0,
          round(coalesce(col("_rep"), lit(0L)).cast("double") /
            col("n_windows").cast("double"), 6)).as("repeated_frac"))
  }

  /** DSIR-style importance weighting (t52): score every candidate
    * document by how much more likely its hashed-n-gram profile is
    * under a small TARGET corpus than under the candidate pool — the
    * "Data Selection via Importance Resampling" recipe (Xie et al.,
    * NeurIPS 2023): features are unigram+bigram counts hashed into `b`
    * buckets, both corpora fit add-1-smoothed bag-of-buckets models,
    * and a document's weight is the average per-n-gram log-likelihood
    * ratio. High weight = looks like the target domain; the selection
    * step is then "keep the top mass by weight" (the report returns
    * the top 100 with a total deterministic order).
    *
    * 100 TB shape: the per-doc bucket-count frame is the single
    * corpus-sized shuffle (map-side combined; ≤ `b` rows per doc);
    * both corpus models roll up from it to ≤ `b` rows, the log-ratio
    * table broadcasts, and scoring is one partial-aggregated rollup
    * keyed by doc. Nothing corpus-sized crosses the wire twice and no
    * text leaves the scan — n-grams travel as bucket ids.
    *
    * Determinism is t25's discipline: each `ln` rounds to 9 dp, the
    * two model terms subtract as DECIMAL(28,9) (exact), per-doc sums
    * run in DECIMAL, and the final average rounds to 6 dp. Ties in
    * the top-100 cut break by `doc_id`.
    */
  def dsirWeights(docs: DataFrame, targetSources: Seq[String],
                  buckets: Int = 1024, topK: Int = 100,
                  textCol: String = "text"): DataFrame = {
    val b = lit(buckets)
    val base = TextOps.attrBarrier(
      docs.select(col("doc_id"), col("source"), col(textCol)),
      Seq("doc_id", "source"), "_toks", TextOps.tokens(col(textCol)))
    val bigrams = when(size(col("_toks")) >= 2,
      transform(sequence(lit(1), size(col("_toks")) - 1),
        i => concat(element_at(col("_toks"), i), lit(" "),
          element_at(col("_toks"), i + 1))))
      .otherwise(array().cast("array<string>"))
    // the one corpus-sized frame: (doc, bucket) counts, ≤ `buckets`
    // rows per doc; feeds both corpus models and the scoring rollup
    val feat = graft.std.Materialize.once(base
      .select(col("doc_id"), col("source"),
        explode(concat(col("_toks"), bigrams)).as("_ng"))
      .select(col("doc_id"), col("source"),
        (TextOps.hash64(col("_ng")) % b).as("_b"))
      .groupBy(col("doc_id"), col("source"), col("_b"))
      .agg(count(lit(1)).as("_cnt")))
    val isTarget = col("source").isin(targetSources: _*)
    val tgt = feat.filter(isTarget)
      .groupBy(col("_b")).agg(sum(col("_cnt")).as("_ct"))
    val nt = tgt.agg(coalesce(sum(col("_ct")), lit(0L)).as("_nt"))
    val raw = feat.filter(!isTarget)
      .groupBy(col("_b")).agg(sum(col("_cnt")).as("_cr"))
    val nr = raw.agg(sum(col("_cr")).as("_nr"))
    // ≤ `buckets` rows: candidate-pool buckets left-joined to the
    // target model (absent target bucket → count 0, add-1 smoothed)
    val lam = raw.join(tgt, Seq("_b"), "left_outer")
      .crossJoin(broadcast(nt)).crossJoin(broadcast(nr))
      .select(col("_b"),
        (round(log((coalesce(col("_ct"), lit(0L)) + 1).cast("double") /
          (col("_nt") + b).cast("double")), 9).cast("decimal(28,9)") -
          round(log((col("_cr") + 1).cast("double") /
            (col("_nr") + b).cast("double")), 9).cast("decimal(28,9)"))
          .as("_lam"))
    feat.filter(!isTarget)
      .join(broadcast(lam), Seq("_b"))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("_cnt")).as("n_ngrams"),
        round(sum(col("_lam") * col("_cnt").cast("decimal(9,0)"))
          .cast("double") / sum(col("_cnt")).cast("double"), 6)
          .as("dsir_weight"))
      .orderBy(col("dsir_weight").desc, col("doc_id"))
      .limit(topK)
  }

  /** Corpus-level duplicated-span detection (t55) — the exact-substring
    * dedup shape (Lee et al., "Deduplicating Training Data Makes
    * Language Models Better"): find every maximal run of tokens that is
    * covered by `n`-token shingles occurring MORE THAN ONCE in the
    * whole corpus (cross-document boilerplate and within-document
    * repeats alike), and emit one row per (doc, merged span). The
    * suffix-array pass of the paper re-expressed relationally: a
    * shingle occurring twice is exactly a duplicated n-token substring,
    * and overlapping/adjacent duplicated shingles merge into the
    * paper's maximal duplicated span.
    *
    * Span positions are 0-based token indices, both ends inclusive;
    * `span_tokens` = covered run length. Downstream removal is a
    * per-doc `slice`/`filter` on the token array — kept separate so
    * the span report itself stays auditable.
    *
    * 100 TB shape: one tokenize pass behind an [[TextOps.attrBarrier]]
    * (the documented t1 trap — the shingling lambda must capture an
    * attribute); shingles travel as 64-bit hashes, never text; dup
    * detection is one hash-shuffled count (map-side partials); the
    * span merge windows partition by doc_id, bounded by document
    * length. The shingle frame feeds the count AND the cover join, so
    * it is pinned ([[graft.std.Materialize]]) — one shingling pass
    * total. Nothing is quadratic; nothing collects.
    */
  def duplicateSpans(docs: DataFrame, n: Int = 8,
                     textCol: String = "text"): DataFrame = {
    require(n >= 2, "need shingles of at least 2 tokens")
    val b = TextOps.attrBarrier(docs.select(col("doc_id"), col(textCol)),
      Seq("doc_id"), "_toks", TextOps.tokens(col(textCol)))
    // entry i (0-based after posexplode) covers tokens [i, i+n); the
    // native prefix-poly kernel replaces the per-window string+md5
    // build (internal equality keys — see SpanHash's contract note)
    val hashes =
      org.apache.spark.sql.GraftColumns.spanWindowHashes(col("_toks"), n)
    val sh = graft.std.Materialize.once(
      b.filter(col("_toks").isNotNull)
        .select(col("doc_id"), posexplode(hashes).as(Seq("pos", "h"))))
    val dups = sh.groupBy(col("h")).agg(count(lit(1)).as("_n"))
      .filter(col("_n") > 1).select(col("h"))
    val cov = sh.join(dups, Seq("h"))
      .select(col("doc_id"), col("pos").cast("long").as("_s"),
        (col("pos") + (n - 1)).cast("long").as("_e"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("_s"))
    val prevMax = max(col("_e"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val marked = cov.withColumn("_brk",
      when(col("_s") > coalesce(prevMax, lit(-2L)) + 1, 1L)
        .otherwise(0L))
    marked
      .withColumn("_grp",
        sum(col("_brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("_grp"))
      .agg(min(col("_s")).as("span_start"), max(col("_e")).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"))
  }

  /** PMI collocations (t66): the top-`k` adjacent bigrams by pointwise
    * mutual information `ln(p(w1w2) / (p(w1)·p(w2)))` with corpus
    * count ≥ `minCount` — the phrase-mining readout a tokenizer/vocab
    * decision reads ("new york" scores high because its parts rarely
    * occur apart; "of the" scores low despite its raw count). The
    * count floor is the standard PMI guard: without it the metric's
    * low-frequency bias ranks hapax pairs first.
    *
    * Plan shape: one exploded pass feeds the unigram table, one
    * bigram pass partial-aggregates to the |corpus bigrams| frame
    * (both ≪ data after map-side combine); scoring is two equi-joins
    * on `w1`/`w2` against the unbounded vocabulary (NO broadcast
    * hint — the t14 rule: AQE broadcasts from runtime stats when it
    * fits) plus two 1-row broadcast totals; the top-k is
    * `TakeOrderedAndProject` on the (pmi desc, w1, w2) total order.
    * Determinism: the PMI argument is pure IEEE division over exact
    * longs (bit-identical cross-engine), the single `ln` rounds to
    * 9 dp (the t31 discipline — libm's last ulp is not portable).
    */
  def pmiCollocations(docs: DataFrame, minCount: Long = 5, k: Int = 100,
                      textCol: String = "text"): DataFrame = {
    val toks = graft.std.Materialize.once(TextOps.attrBarrier(
      docs.select(col("doc_id"), col(textCol)),
      Seq("doc_id"), "_toks", TextOps.tokens(col(textCol))))
    val uni = graft.std.Materialize.once(toks
      .select(explode(col("_toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("_c")))
    val tot = uni.agg(sum(col("_c")).as("_n"))
    val bgc = graft.std.Materialize.once(toks
      .select(explode(transform(
        sequence(lit(1), size(col("_toks"))),
        i => struct(element_at(col("_toks"), i).as("w1"),
          element_at(col("_toks"), i + 1).as("w2")))).as("_bg"))
      .filter(col("_bg.w2").isNotNull)
      .groupBy(col("_bg.w1").as("w1"), col("_bg.w2").as("w2"))
      .agg(count(lit(1)).as("c12")))
    val nb = bgc.agg(sum(col("c12")).as("_nb"))
    bgc.filter(col("c12") >= minCount)
      .join(uni.select(col("w").as("w1"), col("_c").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("_c").as("c2")), Seq("w2"))
      .crossJoin(broadcast(tot)).crossJoin(broadcast(nb))
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
        round(log(
          (col("c12").cast("double") / col("_nb").cast("double")) /
            ((col("c1").cast("double") / col("_n").cast("double")) *
              (col("c2").cast("double") / col("_n").cast("double")))), 9)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
      .limit(k)
  }

  /** Per-document duplication-density profile (t68): what fraction of
    * a document's distinct 3-shingles is corpus-UNIQUE (df = 1 — text
    * appearing nowhere else) vs corpus-COMMON (df ≥ `commonDf` — the
    * shared boilerplate mass). The per-doc complement of
    * [[boilerplateNgrams]] (which reports the offending n-grams
    * corpus-wide) and the profile d2/t28 act on: a near-dup cluster
    * member scores low unique share, a template page scores high
    * common share, and fresh prose scores `novel` — the
    * memorization-risk / content-freshness readout curation ranks on.
    *
    * Verdict bands on truncating 1e-9 fixed-point shares (both engines
    * divide the same longs): `novel` at unique ≥ 0.8, else
    * `boilerplate_heavy` at common ≥ 0.5, else `mixed`.
    *
    * 100 TB shape: shingle text collapses to 64-bit hashes BEFORE any
    * shuffle (the d2 discipline) — the df aggregation and the join
    * back both move (doc_id, hash) pairs only; `array_distinct` at the
    * explode means df needs no Expand-based distinct. The hash frame
    * is pinned once and feeds both sides of the self-join. NULL texts
    * are excluded up front (no shingles to profile).
    */
  def dupDensity(docs: DataFrame, commonDf: Int = 5,
                 textCol: String = "text"): DataFrame = {
    require(commonDf >= 2, "commonDf below 2 would flag unique text")
    val hashed = graft.std.Materialize.once(
      TextOps.attrBarrier(
          docs.filter(col(textCol).isNotNull)
            .select(col("doc_id"), col(textCol)),
          Seq("doc_id"), "_toks", TextOps.tokens(col(textCol)))
        .select(col("doc_id"), explode(array_distinct(
          TextOps.shingles(col("_toks"), 3))).as("sh"))
        .select(col("doc_id"), TextOps.hash64(col("sh")).as("h")))
    val dfreq = hashed.groupBy(col("h"))
      .agg(count(lit(1)).as("df"))
    val agg = hashed.join(dfreq, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"),
        sum(when(col("df") >= commonDf, 1L).otherwise(0L))
          .as("n_common"))
    agg.select(col("doc_id"), col("n_shingles"), col("n_unique"),
        col("n_common"),
        expr("CAST(n_unique * 1000000000 div n_shingles AS BIGINT)")
          .as("unique_share_e9"),
        expr("CAST(n_common * 1000000000 div n_shingles AS BIGINT)")
          .as("common_share_e9"))
      .withColumn("verdict",
        when(col("unique_share_e9") >= 800000000L, lit("novel"))
          .when(col("common_share_e9") >= 500000000L,
            lit("boilerplate_heavy"))
          .otherwise(lit("mixed")))
  }

  /** Per-doc novelty vs a reference corpus (t76): for every BATCH
    * document, the share of its distinct 3-shingles absent from the
    * REFERENCE corpus — the "what does this crawl actually add"
    * readout. d6/d7 make the keep/drop decision against the corpus
    * state; this is the same question at SCORE grain, before the
    * drop: a batch averaging near-zero novelty is a re-crawl to skip
    * wholesale (the t74 verdict at doc grain), a high-novelty slice
    * is where the new data lives, and the score is the natural
    * curriculum/priority key for ingestion order.
    *
    * Shingles travel as md5-lane hashes (the d2/t72 digests-shuffle
    * discipline); per doc the DISTINCT shingle set is scored (a doc
    * repeating one novel phrase 100× is not 100× novel). The
    * batch⋈reference membership join is hash-keyed — at 100 TB the
    * d9 bloom prefilter composes in front of it unchanged (digests
    * are already the join key), cutting the probe to the
    * probably-present minority.
    *
    * Returns (doc_id, n_shingles, n_novel, novelty_e9, verdict) —
    * verdict `novel` ≥ 0.8, `redundant` ≤ 0.2, else `mixed`.
    */
  def noveltyScore(batch: DataFrame, reference: DataFrame,
                   n: Int = 3): DataFrame = {
    require(n >= 1, "need a positive shingle width")
    def docShingles(docs: DataFrame): DataFrame = {
      val b = TextOps.attrBarrier(
        docs.filter(col("text").isNotNull)
          .select(col("doc_id"), col("text")),
        Seq("doc_id"), "_shs",
        TextOps.shingles(TextOps.tokens(col("text")), n))
      b.select(col("doc_id"), explode(col("_shs")).as("_sh"))
        .select(col("doc_id"), TextOps.hash64(col("_sh")).as("_h"))
        .distinct()
    }
    val refSh = graft.std.Materialize.once(
      docShingles(reference).select(col("_h")).distinct()
        .withColumn("_seen", lit(1L)))
    val scored = docShingles(batch)
      .join(refSh, Seq("_h"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("_seen").isNull, 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        expr("n_novel * 1000000000 div n_shingles").as("novelty_e9"))
    scored.withColumn("verdict",
      when(col("novelty_e9") >= 800000000L, lit("novel"))
        .when(col("novelty_e9") <= 200000000L, lit("redundant"))
        .otherwise(lit("mixed")))
  }

  /** Readability scores (t75): Flesch reading ease and Flesch–Kincaid
    * grade per document — the classic complexity axis of the quality
    * shelf (t4 measures junk, t35 measures Gopher-rule hygiene, t25
    * measures LM surprise; none says "this parses like a legal
    * contract" — readability filters and curriculum buckets do, and
    * mixing readability BANDS is a standard curriculum lever).
    * Deterministic proxies, same in both engines: sentences = runs of
    * `[.!?]+` (min 1), words = `[a-z]+` runs of the lowercased text,
    * syllables = vowel-group (`[aeiouy]+`) runs per word, min 1 per
    * word (the no-vowel abbreviation still costs a syllable — the
    * standard convention).
    *
    * Determinism: counts are exact longs; the two scores are one
    * double expression each over exact-long ratios, rounded once at
    * 6 dp — identical IEEE ops in both engines (the s1 cosine
    * argument). A wordless doc scores NULL (band `unscored`), never a
    * division error; a null-text doc is dropped outright (unscorable,
    * not zero-length — the sibling-scorer convention).
    *
    * 100 TB shape: pure per-row expressions — embarrassingly
    * parallel, no shuffle at all; the per-word syllable fold is a
    * codegen'd higher-order aggregate whose element work is
    * independent (no shared subexpression to lose CSE on).
    *
    * Returns (doc_id, n_sentences, n_words, n_syllables, flesch,
    * fk_grade, band).
    */
  def readability(docs: DataFrame): DataFrame = {
    // null text is unscorable, not zero-length: without the filter the
    // legacy size(NULL) = -1 convention yields n_words = -1 here while
    // the DuckDB twin COALESCEs to 0 — a latent engine divergence every
    // sibling scorer already guards against the same way (r16 advice).
    val scorable = docs.filter(col("text").isNotNull)
    val words = regexp_extract_all(lower(col("text")),
      lit("[a-z]+"), lit(0))
    val nS = greatest(lit(1L),
      size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0)))
        .cast("long"))
    val nW = size(words).cast("long")
    val nSyl = aggregate(words, lit(0L), (acc, w) =>
      acc + greatest(lit(1L),
        size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0)))
          .cast("long")))
    val base = scorable.select(col("doc_id"),
      nS.as("n_sentences"), nW.as("n_words"), nSyl.as("n_syllables"))
    val wps = col("n_words").cast("double") /
      col("n_sentences").cast("double")
    val spw = col("n_syllables").cast("double") /
      col("n_words").cast("double")
    base
      .withColumn("flesch", when(col("n_words") > 0,
        round(lit(206.835) - lit(1.015) * wps - lit(84.6) * spw, 6)))
      .withColumn("fk_grade", when(col("n_words") > 0,
        round(lit(0.39) * wps + lit(11.8) * spw - lit(15.59), 6)))
      .withColumn("band",
        when(col("flesch").isNull, lit("unscored"))
          .when(col("flesch") >= 70.0, lit("easy"))
          .when(col("flesch") >= 50.0, lit("standard"))
          .when(col("flesch") >= 30.0, lit("difficult"))
          .otherwise(lit("very_difficult")))
  }

  /** Cross-source shingle-overlap matrix (t74): for every SOURCE
    * pair, how much of their 3-shingle vocabularies they share —
    * Jaccard plus BOTH containments (a small source mirrored inside a
    * big one has tiny Jaccard but containment ≈ 1, which is exactly
    * the mirror case) and a verdict. The provenance diagnostic at
    * pair grain: t72 says a source repeats ITSELF, this says two
    * sources repeat EACH OTHER (mirrors, syndication, scraped
    * re-uploads) — the corpus-level question a dedup pass answers
    * per-document and this answers per-feed, before deciding which
    * feed to drop wholesale.
    *
    * Shingles travel as md5-lane hashes (digests shuffle, never text
    * — the d2/t72 discipline). `maxSources` drops shingles present in
    * more than that many sources BEFORE pairing: they are boilerplate
    * background carrying no mirror signal, and they are also exactly
    * the keys whose pair fan-out (≤ |sources|² rows per hash) would
    * otherwise skew the self-join — one cap, both jobs (the t68
    * commonDf discipline). Sizes and shares are all computed over the
    * same filtered universe so the ratios stay coherent.
    *
    * 100 TB shape: one (source, hash) distinct collapse, one |vocab|
    * df filter, ONE hash equi-self-join whose per-key fan-out is
    * capped at maxSources², one pair partial agg; the report frame is
    * |sources|² rows (zero-overlap pairs included via the tiny size
    * cross join).
    *
    * Returns (source_a, source_b, n_shared, n_a, n_b, jaccard_e9,
    * containment_a_e9, containment_b_e9, verdict).
    */
  def sourceOverlapMatrix(docs: DataFrame, n: Int = 3,
                          maxSources: Int = 64): DataFrame = {
    require(n >= 1, "need a positive shingle width")
    require(maxSources >= 2, "a shared shingle spans at least 2 sources")
    val b = TextOps.attrBarrier(
      docs.filter(col("text").isNotNull && col("source").isNotNull)
        .select(col("doc_id"), col("source"), col("text")),
      Seq("doc_id", "source"), "_shs",
      TextOps.shingles(TextOps.tokens(col("text")), n))
    val sh = graft.std.Materialize.once(
      b.select(col("source"), explode(col("_shs")).as("_sh"))
        .select(col("source"), TextOps.hash64(col("_sh")).as("_h"))
        .distinct())
    val keep = sh.groupBy(col("_h")).agg(count(lit(1)).as("_ds"))
      .filter(col("_ds") <= maxSources)
      .select(col("_h"))
    val shf = graft.std.Materialize.once(sh.join(keep, Seq("_h")))
    val sizes = graft.std.Materialize.once(
      shf.groupBy(col("source")).agg(count(lit(1)).as("n_distinct")))
    val shared = shf.select(col("source").as("source_a"), col("_h"))
      .join(shf.select(col("source").as("source_b"), col("_h")),
        Seq("_h"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    val pairs = sizes.select(col("source").as("source_a"),
        col("n_distinct").as("n_a"))
      .crossJoin(broadcast(sizes.select(col("source").as("source_b"),
        col("n_distinct").as("n_b"))))
      .filter(col("source_a") < col("source_b"))
    val scored = pairs
      .join(shared, Seq("source_a", "source_b"), "left_outer")
      .select(col("source_a"), col("source_b"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        col("n_a"), col("n_b"))
      .select(col("source_a"), col("source_b"), col("n_shared"),
        col("n_a"), col("n_b"),
        expr("n_shared * 1000000000 div (n_a + n_b - n_shared)")
          .as("jaccard_e9"),
        expr("n_shared * 1000000000 div n_a").as("containment_a_e9"),
        expr("n_shared * 1000000000 div n_b").as("containment_b_e9"))
    val top = greatest(col("jaccard_e9"), col("containment_a_e9"),
      col("containment_b_e9"))
    scored.withColumn("verdict",
      when(top >= 500000000L, lit("mirror"))
        .when(top >= 100000000L, lit("overlapping"))
        .otherwise(lit("distinct")))
  }

  /** TF-IDF top terms per document (t73): classic keyword extraction
    * — per doc, the `topK` terms by `tf · ln(N/df)`, the written
    * artifact a corpus ships next to its documents (faceted search
    * keys, topic drill-downs, weak labels for the t32/t67 classifier
    * tier, dedup explanations). t29's BM25 scores documents against a
    * QUERY at read time; this scores terms against the CORPUS at
    * write time — same statistics, opposite direction.
    *
    * Determinism: tf is an exact long; idf is `round(ln(N/df), 9)`
    * (the t56 rounded-log discipline — a term in every doc scores
    * exactly 0); the product rounds once more at 9 dp; rank breaks
    * ties on the term string, ascending.
    *
    * 100 TB shape: one (doc, term) partial-agg shuffle (the tf
    * collapse — tokens never leave their scan partition unaggregated),
    * one |vocab| partial agg for df, one equi-join on term (broadcast
    * when the vocabulary is small, shuffle otherwise — Catalyst's
    * call), one per-doc window bounded by the doc's distinct terms.
    * No corpus-sized sort, no driver state.
    *
    * Returns (doc_id, term, rank, tf, tfidf) — topK rows per doc.
    */
  def tfidfTopTerms(docs: DataFrame, topK: Int = 5): DataFrame = {
    require(topK >= 1, "need a positive report size")
    val ex = docs.select(col("doc_id"),
      explode(graft.ext.TextOps.tokens(col("text"))).as("term"))
    val tf = graft.std.Materialize.once(
      ex.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf")))
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("_n"))
    val scored = tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"), col("tf"),
        round(col("tf") *
          round(log(col("_n").cast("double") / col("df").cast("double")),
            9), 9).as("tfidf"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("doc_id"), col("term"), col("rank"), col("tf"),
        col("tfidf"))
  }
}
