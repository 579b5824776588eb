package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Unit tests for the round-9 corpus-statistics operators: the KMV
  * distinct-cardinality sketch (t24), the unigram-LM document scorer
  * (t25), and the centroid-distance embedding outliers (s7).
  */
class CorpusStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("KMV is exact below k and within sketch error above it") {
    // below k: 40 distinct tokens, k=64 → the sketch IS the exact count
    val small = Seq((1L, "en", (1 to 40).map(i => s"tok$i").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val sRow = TextAnalysis.kmvCardinality(small, k = 64).collect().head
    assert(sRow.getAs[Long]("k_used") == 40L)
    assert(sRow.getAs[Long]("n_exact") == 40L)
    assert(sRow.getAs[Double]("est_distinct") == 40.0)
    assert(sRow.getAs[Double]("rel_err") == 0.0)

    // above k: 5000 distinct tokens, k=256 → (k-1)/U estimate; the
    // standard error of the bottom-k estimator is ~1/sqrt(k-2) ≈ 6.3%,
    // so 25% (4σ) is a deterministic-safe bound for this fixed corpus
    val big = (1 to 50).map(d =>
        (d.toLong, "en", ((d - 1) * 100 + 1 to d * 100)
          .map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val bRow = TextAnalysis.kmvCardinality(big, k = 256).collect().head
    assert(bRow.getAs[Long]("k_used") == 256L)
    assert(bRow.getAs[Long]("n_exact") == 5000L)
    val est = bRow.getAs[Double]("est_distinct")
    assert(math.abs(est - 5000.0) / 5000.0 < 0.25,
      s"KMV estimate $est too far from 5000")
  }

  test("native KMV aggregate equals a global sort's bottom-k") {
    val docs = (1 to 30).map(d =>
        (d.toLong, if (d % 2 == 0) "en" else "de",
          ((d - 1) * 50 + 1 to d * 50).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    // reference: exact bottom-k via a plain global sort per lang
    val hashes = docs
      .select(col("lang"), explode(TextOps.tokens(col("text"))).as("t"))
      .select(col("lang"), TextOps.hash64(col("t")).as("h")).distinct()
    val expected = hashes.collect().groupBy(_.getString(0)).map {
      case (lang, rows) =>
        val mins = rows.map(_.getLong(1)).sorted.take(256)
        lang -> (mins.last, mins.length)
    }
    TextAnalysis.kmvCardinality(docs, k = 256).collect().foreach { r =>
      val lang = r.getAs[String]("lang")
      val (kthRef, kUsedRef) = expected(lang)
      assert(r.getAs[Long]("k_used") == kUsedRef.toLong)
      // re-derive the estimate from the reference kth minimum
      val frac = kthRef.toDouble / math.pow(2.0, 56)
      val estRef = BigDecimal((kUsedRef - 1).toDouble / frac)
        .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("est_distinct") == estRef,
        s"$lang: aggregate kth != global-sort kth")
    }
  }

  test("KMV sketches merge: bottom-k of shard bottom-ks = corpus bottom-k") {
    // the distributed-union property that makes the sketch 100-TB-able:
    // merging per-shard sketches must equal sketching the whole corpus
    val docs = (1 to 40).map(d =>
        (d.toLong, "en", ((d - 1) * 40 + 1 to d * 40)
          .map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    def bottomK(df: org.apache.spark.sql.DataFrame): Seq[Long] = df
      .select(explode(TextOps.tokens(col("text"))).as("t"))
      .select(TextOps.hash64(col("t")).as("h")).distinct()
      .collect().map(_.getLong(0)).sorted.take(256).toSeq
    val shardA = bottomK(docs.filter(col("doc_id") % 2 === 0))
    val shardB = bottomK(docs.filter(col("doc_id") % 2 =!= 0))
    val merged = (shardA ++ shardB).distinct.sorted.take(256)
    val whole = bottomK(docs)
    assert(merged == whole, "sketch union != whole-corpus sketch")
    // and the query's estimate derives from exactly that kth minimum
    val row = TextAnalysis.kmvCardinality(docs, k = 256).collect().head
    val estRef = BigDecimal(255.0 / (merged.last.toDouble / math.pow(2.0, 56)))
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Double]("est_distinct") == estRef)
  }

  test("temperature resample upweights rare domains toward target mass") {
    // skewed corpus: 'big' has 16x the token mass of 'small'
    val docs = ((1 to 32).map(i => (i.toLong, "big",
        (1 to 50).map(j => s"b$i-$j").mkString(" "))) ++
      (33 to 34).map(i => (i.toLong, "small",
        (1 to 50).map(j => s"s$i-$j").mkString(" "))))
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.temperatureResample(docs, targetFrac = 0.5)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val big = out("big"); val small = out("small")
    assert(big.getAs[Long]("mass_tokens") == 1600L)
    assert(small.getAs[Long]("mass_tokens") == 100L)
    // α=0.5 compresses the mixture: the rare domain's sampling rate
    // must exceed the common domain's (upweighting), and every rate
    // stays within [0, 1]
    assert(small.getAs[Double]("rate") > big.getAs[Double]("rate"))
    out.values.foreach { r =>
      val rate = r.getAs[Double]("rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_total"))
    }
    // with no rate capped at 1, the rates are calibrated so the
    // EXPECTED kept mass is targetFrac of the corpus
    if (out.values.forall(_.getAs[Double]("rate") < 1.0)) {
      val expected = out.values.map(r =>
        r.getAs[Double]("rate") * r.getAs[Long]("mass_tokens")).sum
      assert(math.abs(expected - 0.5 * 1700) < 1.0,
        s"rate calibration off: expected kept mass $expected vs 850")
    }
    // audit columns: naive uniform keep at the same targetFrac shares
    // the uniform lane, so the comparison is monotone and exact —
    // the upweighted rare domain keeps AT LEAST what naive would
    // (rate 1.0 > 0.5 ⟹ {u<0.5} ⊆ {u<rate}), the downweighted common
    // domain keeps AT MOST (rate 0.425 < 0.5)
    assert(small.getAs[Long]("n_kept") >= small.getAs[Long]("naive_n_kept"))
    assert(big.getAs[Long]("n_kept") <= big.getAs[Long]("naive_n_kept"))
    assert(small.getAs[Long]("naive_kept_tokens") <=
      small.getAs[Long]("mass_tokens"))
  }

  test("CMS estimates are one-sided and exact without collisions") {
    // tiny vocab (3 tokens ≪ 1024 cells): near-certainly collision-free,
    // so every estimate equals the true count; with md5-derived cells
    // this is deterministic for this fixed corpus, not flaky
    val docs = Seq((1L, "alpha alpha beta"), (2L, "alpha gamma"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.cmsHeavyHitters(docs, topK = 3).collect()
      .map(r => r.getAs[String]("token") ->
        (r.getAs[Long]("true_count"), r.getAs[Long]("cms_estimate"))).toMap
    graft.std.Materialize.releaseAll()
    assert(out("alpha") == ((3L, 3L)))
    assert(out("beta") == ((1L, 1L)))
    assert(out("gamma") == ((1L, 1L)))

    // on the real corpus: the one-sided guarantee (estimate >= true)
    // holds for every probed token, by construction of the MIN readout
    val real = ExtQueries.cmsHeavyHitters(spark, "/root/testdata/sf0.001")
      .collect()
    graft.std.Materialize.releaseAll()
    assert(real.length == 20)
    assert(real.forall(_.getAs[Long]("overestimate") >= 0L))
    assert(real.exists(_.getAs[Long]("true_count") > 100L),
      "top-20 of the corpus should contain genuinely heavy tokens")
  }

  test("unigram logprob: hand-computed scores, boilerplate ranks highest") {
    // corpus: "the the the a" ×1 and "rare" ×1 → counts: the=3, a=1,
    // rare=1, total=5
    val docs = Seq((1L, "the the the a"), (2L, "rare"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogprob(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("avg_logprob"),
          r.getAs[Double]("min_logprob"))).toMap
    def lp(c: Int) = BigDecimal(math.log(c / 5.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val exp1 = ((lp(3) * 3 + lp(1)) / 4)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp2 = lp(1).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L)._1 == 4L)
    assert(out(1L)._2 == exp1)
    assert(out(1L)._3 == lp(3).toDouble.min(lp(1).toDouble))
    assert(out(2L)._1 == 1L)
    assert(out(2L)._2 == exp2)
    // the common-token doc scores strictly higher than the rare-token doc
    assert(out(1L)._2 > out(2L)._2)
  }

  test("unigram logprob covers every token (self-trained LM has no OOV)") {
    val docs = Seq((1L, "x y z"), (2L, "x x"), (3L, "q"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogprob(docs)
    assert(out.count() == 3)
    assert(out.agg(sum("n_tokens")).head.getLong(0) == 6L)
  }

  test("centroid outliers: the antipodal vector is flagged, others not") {
    // 12 vectors near +e1, one vector at -e1 (the outlier); a second
    // language with too few vectors exercises the null-z path
    val near = (1 to 12).map { i =>
      (i.toLong, Array(1.0f, 0.01f * i, 0.0f, 0.0f))
    }
    val out = Seq((13L, Array(-1.0f, 0.0f, 0.0f, 0.0f)))
    val lone = Seq((14L, Array(0.5f, 0.5f, 0.0f, 0.0f)))
    val docs = ((1 to 13).map(i => (i.toLong, "en")) :+ (14L -> "de"))
      .toDF("doc_id", "lang")
    val vecs = (near ++ out ++ lone).toDF("vec_id", "embedding")
    val res = Similarity.centroidOutliers(docs, vecs).collect()
      .map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(res(13L).getAs[Boolean]("is_outlier"),
      "antipodal vector not flagged")
    (1 to 12).foreach { i =>
      assert(!res(i.toLong).getAs[Boolean]("is_outlier"),
        s"inlier $i flagged")
    }
    // single-vector language: no distribution → null z, not flagged
    assert(res(14L).isNullAt(res(14L).fieldIndex("z_score")))
    assert(!res(14L).getAs[Boolean]("is_outlier"))
    // the outlier's cosine to the centroid is strongly negative, the
    // inliers' strongly positive
    assert(res(13L).getAs[Double]("cos_centroid") < -0.9)
    assert(res(1L).getAs[Double]("cos_centroid") > 0.9)
  }

  test("centroid drift: identical halves stable, moved half drifts") {
    // lang "en": identical vectors in both halves -> cos 1, l2 0.
    // lang "de": the odd half is the even half rotated 90° -> cos 0.
    val docs = Seq(
      (0L, "en"), (1L, "en"), (2L, "de"), (3L, "de"))
      .toDF("doc_id", "lang")
    val vecs = Seq(
      (0L, Array(1.0, 0.0)), (1L, Array(1.0, 0.0)),
      (2L, Array(0.0, 1.0)), (3L, Array(1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val out = Similarity.centroidDrift(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1), vecs)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out("en") == ((1.0, 0.0, false)))
    val (cosDe, l2De, driftedDe) = out("de")
    assert(cosDe == 0.0 && driftedDe)
    assert(math.abs(l2De - math.sqrt(2.0)) < 1e-6)
  }

  test("source entropy: uniform vocab -> 1, one-token spam -> 0") {
    val docs = Seq(
      (1L, "diverse", "a b c d"),          // 4 tokens, all distinct
      (2L, "diverse", "e f g h"),          // 8 distinct over 8 tokens
      (3L, "spam", "buy buy buy buy buy"), // one token repeated
      (4L, "tiny", "x"))                   // single token: H = 0, d = 1
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.sourceEntropy(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val (nT, nD, h, nh) = out("diverse")
    assert(nT == 8 && nD == 8)
    assert(math.abs(h - math.log(8.0)) < 1e-6) // uniform: H = ln(d)
    assert(math.abs(nh - 1.0) < 1e-6)
    assert(out("spam") == ((5L, 1L, 0.0, 0.0)))
    assert(out("tiny") == ((1L, 1L, 0.0, 0.0)))
  }

  test("repeated n-gram spans: shared windows flag, short docs zero") {
    val docs = Seq(
      // docs 1 and 2 share the 5-token prefix "a b c d e" (their only
      // common 5-gram run: windows [a..e] and [b..f] differ at f/g)
      (1L, "a b c d e f"),
      (2L, "a b c d e g"),
      (3L, "h i j k l m n"),   // unique: 3 windows, none repeated
      (4L, "x y"),             // shorter than the window: 0 windows
      (5L, null.asInstanceOf[String])) // null text: 0 windows
      .toDF("doc_id", "text")
    val out = TextAnalysis.repeatedNgramSpans(docs, n = 5).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))).toMap
    graft.std.Materialize.releaseAll()
    assert(out(1L) == ((2L, 1L, 0.5)))
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((3L, 0L, 0.0)))
    assert(out(4L)._1 == 0L && out(4L)._2 == 0L && out(4L)._3.isNaN)
    assert(out(5L)._1 == 0L && out(5L)._2 == 0L && out(5L)._3.isNaN)
    assert(out.size == 5)
  }

  test("repeated n-gram spans count every occurrence, not distinct grams") {
    // doc 6 contains the shared window TWICE (positions 1 and 6);
    // both window positions count toward n_repeated
    val docs = Seq(
      (6L, "a b c d e a b c d e"), // windows: 6, the repeated gram at 2 positions
      (7L, "a b c d e z z z z z"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.repeatedNgramSpans(docs, n = 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    graft.std.Materialize.releaseAll()
    // doc 6: "a b c d e" appears at positions 1 and 6 (and in doc 7);
    // those 2 of its 6 windows are corpus-repeated
    assert(out(6L) == ((6L, 2L)))
    // doc 7's first window is the shared gram; "z z z z z" etc. are
    // unique to doc 7 (single doc -> not repeated)
    assert(out(7L) == ((6L, 1L)))
  }

  /** Oracle-in-miniature for the deflate gate: DuckDB has no zlib, so
    * the exact-parity check against a direct `java.util.zip.Deflater`
    * run IS the gate (the BPE precedent for non-SQL-expressible ops).
    */
  private def zlibRatio(s: String): Double = {
    val raw = s.getBytes("UTF-8")
    val d = new java.util.zip.Deflater(6)
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length + 64)
    var n = 0L
    while (!d.finished()) n += d.deflate(buf)
    d.end()
    java.math.BigDecimal.valueOf(n.toDouble / raw.length)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  test("deflate ratio: exact java.util.zip parity and the band verdicts") {
    val repetitive = "spam ham " * 200                  // boilerplate
    val prose = "The quarterly revenue grew modestly across the " +
      "northern region while operating costs declined, a pattern the " +
      "finance team attributes to seasonal demand and slow hiring. " * 3
    // deterministic high-entropy text: chained MD5 hex (~4 bits/char,
    // zlib ratio ≈ 0.55 — no repeats for LZ77 to exploit)
    val md = java.security.MessageDigest.getInstance("MD5")
    val noise = (1 to 25).map(i =>
      md.digest(s"seed$i".getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString).mkString
    val docs = Seq(
      (1L, repetitive), (2L, prose), (3L, noise),
      (4L, ""), (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")

    // explicit band: hex noise carries ~4 bits/char, so its ratio
    // (~0.55) sits under the production default hi (0.95, tuned for
    // binary-in-text); the band semantics are what's under test
    val res = TextAnalysis.compressionStats(docs, lo = 0.25, hi = 0.5)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

    // exact parity with a direct Deflater run, through codegen
    for ((id, s) <- Seq(1L -> repetitive, 2L -> prose, 3L -> noise))
      assert(res(id).getAs[Double]("deflate_ratio") == zlibRatio(s),
        s"doc $id ratio != direct zlib")
    // the ordering the gate exists for
    val (r1, r2, r3) = (zlibRatio(repetitive), zlibRatio(prose),
      zlibRatio(noise))
    assert(r1 < r2 && r2 < r3, s"expected $r1 < $r2 < $r3")
    assert(res(1L).getAs[Boolean]("r_too_repetitive"))
    assert(!res(1L).getAs[Boolean]("passes"))
    assert(res(2L).getAs[Boolean]("passes"))
    assert(res(3L).getAs[Boolean]("r_too_random"))
    assert(!res(3L).getAs[Boolean]("passes"))
    // empty + null text: null ratio, fails the band, trips no flag
    for (id <- Seq(4L, 5L)) {
      assert(res(id).isNullAt(res(id).fieldIndex("deflate_ratio")))
      assert(!res(id).getAs[Boolean]("passes"))
      assert(!res(id).getAs[Boolean]("r_too_repetitive"))
      assert(!res(id).getAs[Boolean]("r_too_random"))
    }
  }

  test("deflate ratio: SQL surface and interpreted/codegen agreement") {
    org.apache.spark.sql.GraftColumns.registerFunctions(spark)
    val s = "alpha beta gamma " * 40
    Seq(Tuple1(s)).toDF("t").createOrReplaceTempView("deflate_in")
    val sqlVal = spark.sql(
      "SELECT graft_deflate_ratio(t) AS r FROM deflate_in")
      .head().getDouble(0)
    assert(sqlVal == zlibRatio(s))
    // interpreted path (eval, no codegen) matches
    val interp = graft.functions.DeflateRatio(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)))
      .eval(null).asInstanceOf[Double]
    assert(interp == sqlVal)
  }

  test("duplicate spans: cross-doc cover merges; unique docs emit nothing") {
    val docs = Seq(
      (1L, "a b c d e x y z"),
      (2L, "a b c d e q r s"), // shares grams abc/bcd/cde with doc 1
      (3L, "m n o p q r s t")) // qrs/rst NOT shared (doc2 ends at s)
      .toDF("doc_id", "text")
    val out = TextAnalysis.duplicateSpans(docs, n = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
    graft.std.Materialize.releaseAll()
    // "q r s" occurs in docs 2 and 3 -> each also covers that run
    assert(out.toMap == Map(
      1L -> ((0L, 4L, 5L)), 2L -> ((0L, 7L, 8L)), 3L -> ((4L, 6L, 3L))))
  }

  test("duplicate spans: within-doc repeats split on gaps, merge when adjacent") {
    val gap = Seq((10L, "p q r t1 t2 t3 p q r"))
      .toDF("doc_id", "text")
    val g = TextAnalysis.duplicateSpans(gap, n = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    graft.std.Materialize.releaseAll()
    // "p q r" at positions 0 and 6; the middle is untouched
    assert(g == Set((10L, 0L, 2L, 3L), (10L, 6L, 8L, 3L)))
    val adj = Seq(
      (11L, "a b c d e f"),    // abc shared with 12, def with 13
      (12L, "z a b c x"),
      (13L, "d e f h1 h2 h3")).toDF("doc_id", "text")
    val a = TextAnalysis.duplicateSpans(adj, n = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    graft.std.Materialize.releaseAll()
    // doc 11's covers [0,2] and [3,5] are adjacent -> ONE merged span
    assert(a == Set((11L, 0L, 5L, 6L), (12L, 1L, 3L, 3L),
      (13L, 0L, 2L, 3L)))
  }

  test("duplicate spans: null and short texts produce no rows") {
    val docs = Seq((20L, "a b"), (21L, null.asInstanceOf[String]),
      (22L, "a b")).toDF("doc_id", "text")
    // both real docs are SHORTER than the shingle -> no windows at all,
    // even though their texts are identical
    val out = TextAnalysis.duplicateSpans(docs, n = 3).collect()
    graft.std.Materialize.releaseAll()
    assert(out.isEmpty)
  }

  test("epoch allocation: hand-computed weights, floors, and the knee") {
    // A: 9 tokens, B: 16 → shares 9/25, 16/25; sqrt weights 0.6, 0.8
    // normalize to 0.428571429 / 0.571428571; at budget 100:
    // A gets floor(42.857…) = 42 → 42/9 = 4.666667 epochs (> 4, flag)
    // B gets floor(57.142…) = 57 → 57/16 = 3.5625 (under the knee)
    val docs = Seq(
      (1L, "A", (1 to 9).map(i => s"a$i").mkString(" ")),
      (2L, "B", (1 to 16).map(i => s"b$i").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val r = TextAnalysis.epochAllocation(docs, 100L).collect()
      .map(x => x.getString(0) ->
        (x.getLong(2), x.getDouble(3), x.getLong(4), x.getDouble(5),
          x.getBoolean(6))).toMap
    assert(r("A") == ((9L, 0.428571429, 42L, 4.666667, true)))
    assert(r("B") == ((16L, 0.571428571, 57L, 3.5625, false)))
  }

  test("t68 dup density: hand-counted shares and verdict bands") {
    // A == B share both shingles; "a b c" also opens D (df 3).
    // With commonDf = 3: A/B read common 1 of 2 (0.5 -> heavy), C is
    // all-unique (novel), D is 3 unique / 1 common of 4 (mixed), the
    // short doc contributes its whole text as ONE unique shingle, and
    // the NULL text vanishes.
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c d"), (3L, "x y z w v"),
      (4L, "a b c z1 z2 z3"), (5L, "hi"), (6L, null))
      .toDF("doc_id", "text")
    val r = TextAnalysis.dupDensity(docs, commonDf = 3)
      .collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getLong(5), x.getString(6))))
      .toMap
    graft.std.Materialize.releaseAll()
    assert(r.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(r(1L) == ((2L, 0L, 1L, 0L, 500000000L, "boilerplate_heavy")))
    assert(r(1L) == r(2L))
    assert(r(3L) == ((3L, 3L, 0L, 1000000000L, 0L, "novel")))
    assert(r(4L) == ((4L, 3L, 1L, 750000000L, 250000000L, "mixed")))
    assert(r(5L) == ((1L, 1L, 0L, 1000000000L, 0L, "novel")))
  }

  test("source shingle diversity: a template farm collapses, a " +
    "diverse source reads 1.0, short docs fall back whole") {
    val docs = Seq(
      // template farm: same page, only the slug differs — 6 tokens
      // give 4 shingles each: [a b c][b c d][c d page] shared,
      // [d page N] slug-bearing
      (1L, "farm", "a b c d page one"),
      (2L, "farm", "a b c d page two"),
      (3L, "farm", "a b c d page three"),
      // diverse source: no shingle repeats anywhere
      (4L, "org", "alpha beta gamma delta"),
      (5L, "org", "epsilon zeta eta theta"),
      // short doc: fewer than 3 tokens contributes its whole text
      (6L, "tiny", "hi there"))
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.sourceShingleDiversity(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // farm: 3 docs x 4 shingles = 12 total; distinct = 3 shared
    // ([a b c][b c d][c d page]) + 3 slug-bearing ([d page N]) = 6
    assert(out("farm") == ((3L, 12L, 6L, 500000000L)), s"got $out")
    // org: 2 docs x 2 shingles, all distinct -> exactly 1.0
    assert(out("org") == ((2L, 4L, 4L, 1000000000L)), s"got $out")
    // tiny: one whole-text fallback shingle
    assert(out("tiny") == ((1L, 1L, 1L, 1000000000L)), s"got $out")
  }
}
