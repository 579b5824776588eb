package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.queries.{BiQueries, Merged}
import graft.sources.Tables

/** Unit tests for the round-3 pipeline operators: pivot/unpivot,
  * percentiles, chunking, sequence packing, centroids, and the
  * content-bucketed split's no-leakage guarantee.
  */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("pivot→unpivot round-trips to the long-form group-by") {
    val merged = Merged.cleaned(spark, sfDir)
    val viaUnpivot = BiQueries.revenueUnpivotByRegion(merged)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val region = graft.std.SchemaOps
      .findRegionColumn(merged.columns.toIndexedSeq).get
    val direct = merged
      .filter(col(region).isin(BiQueries.RegionPivotValues: _*))
      .groupBy(col("fin_month_label"),
        lower(regexp_replace(col(region), " ", "_")).as("region_key"))
      .agg(round(sum("total_line_price"), 2).as("revenue"))
      .filter(col("revenue").isNotNull)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(viaUnpivot == direct)
    assert(viaUnpivot.nonEmpty)
  }

  test("exact percentile interpolates like quantile_cont (type 7)") {
    val df = Seq(("en", 1L), ("en", 2L), ("en", 3L), ("en", 4L))
      .toDF("lang", "n_chars")
    val row = TextAnalysis.charPercentiles(df).collect().head
    assert(row.getDouble(row.fieldIndex("p25")) == 1.75)
    assert(row.getDouble(row.fieldIndex("p50")) == 2.5)
    assert(row.getDouble(row.fieldIndex("p75")) == 3.25)
  }

  test("chunking covers each document exactly, with the configured overlap") {
    val docs = Seq((1L, ""), (2L, "x" * 100), (3L, "y" * 200), (4L, "z" * 350))
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // every doc yields ≥1 chunk; starts advance by the stride; the last
    // chunk reaches the end of the text
    assert(out(1L).map(c => (c._2, c._3)).toSeq == Seq((1L, 0L)))
    assert(out(2L).map(c => (c._2, c._3)).toSeq == Seq((1L, 100L)))
    assert(out(3L).map(c => (c._2, c._3)).toSeq == Seq((1L, 200L)))
    // 350 chars: [1..200], [151..350] — the start at 301 is suppressed
    // (chunk 2 already reaches the end)
    assert(out(4L).map(c => (c._2, c._3)).toSeq ==
      Seq((1L, 200L), (151L, 200L)))
    assert(out(4L).map(c => c._2 + c._3 - 1).max == 350L)
  }

  test("chunking invariants hold for every length 0..450") {
    val docs = (0 to 450).map(n => (n.toLong, "x" * n)).toDF("doc_id", "text")
    val byDoc = TextAnalysis.chunkDocs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(c => (c._2, c._3)).toSeq)
      .toMap
    (0 to 450).foreach { n =>
      val chunks = byDoc(n.toLong)
      assert(chunks.head._1 == 1L, s"len $n: first chunk not at 1")
      // starts advance by exactly the stride
      chunks.map(_._1).sliding(2).foreach {
        case Seq(a, b) => assert(b - a == 150L, s"len $n: stride $a→$b")
        case _ => ()
      }
      // full coverage: the last chunk reaches the end of the text
      assert(chunks.map(c => c._1 + c._2 - 1).max == math.max(n.toLong, 0L)
        || (n == 0 && chunks == Seq((1L, 0L))), s"len $n: coverage gap")
      // every chunk extends coverage beyond the previous one (no
      // fully-redundant tail chunks)
      chunks.sliding(2).foreach {
        case Seq((s1, l1), (s2, l2)) =>
          assert(s2 + l2 - 1 > s1 + l1 - 1, s"len $n: redundant chunk at $s2")
        case _ => ()
      }
    }
  }

  test("sequence packing conserves tokens and numbers packs contiguously") {
    val out = TextAnalysis.sequencePacking(
      Tables.documents(spark, sfDir)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byLang = out.groupBy(_._1)
    val totals = Tables.documents(spark, sfDir)
      .select(col("lang"),
        size(graft.ext.TextOps.tokens(col("text"))).cast("long").as("n"))
      .groupBy("lang").agg(sum("n").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang.foreach { case (lang, packs) =>
      // token conservation: every token lands in exactly one pack
      assert(packs.map(_._4).sum == totals(lang), s"$lang: token loss")
      // pack ids are contiguous from 0
      val ids = packs.map(_._2).sorted.toSeq
      assert(ids == (0L until ids.length).map(identity),
        s"$lang: pack gap in $ids")
    }
  }

  test("sequence packing assigns docs to token-budget bins in id order") {
    // 4-token docs against a budget of 10: cumulative starts 0,4,8,12 →
    // packs 0,0,0,1
    val docs = Seq(
      (1L, "en", "a b c d"), (2L, "en", "a b c d"),
      (3L, "en", "a b c d"), (4L, "en", "a b c d"),
      (5L, "fr", "a b")).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.sequencePacking(docs, budget = 10).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out == Map(
      ("en", 0L) -> ((3L, 12L, 1L)),
      ("en", 1L) -> ((1L, 4L, 4L)),
      ("fr", 0L) -> ((1L, 2L, 5L))))
  }

  test("language centroids match the brute-force mean") {
    val got = Similarity.langCentroids(
      Tables.documents(spark, sfDir), Tables.embeddings(spark, sfDir))
      .filter(col("dim") === 0)
      .collect()
      .map(r => r.getString(0) -> r.getDouble(r.fieldIndex("centroid"))).toMap
    val expect = Tables.documents(spark, sfDir).select("doc_id", "lang")
      .join(Tables.embeddings(spark, sfDir),
        col("doc_id") === col("vec_id"))
      .select(col("lang"),
        element_at(col("embedding").cast("array<double>"), 1).as("v0"))
      .groupBy("lang").agg(avg("v0").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == expect.keySet && got.nonEmpty)
    got.foreach { case (lang, c) =>
      assert(math.abs(c - expect(lang)) < 1e-6, s"$lang: $c vs ${expect(lang)}")
    }
  }

  test("PII scrub redacts emails and URLs and counts them") {
    val docs = Seq(
      (1L, "mail me at a.user+x@ex-ample.co.uk or b@x.io thanks"),
      (2L, "see https://a.example/path?q=1 and http://b.example now"),
      (3L, "nothing sensitive here")).toDF("doc_id", "text")
    val out = TextAnalysis.piiScrub(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(1L -> ((2L, 0L)), 2L -> ((0L, 2L)), 3L -> ((0L, 0L))))
    // redaction removes every match (scrubbed text of doc 1 has no '@')
    val scrubbed = docs.filter(col("doc_id") === 1)
      .select(regexp_replace(regexp_replace(col("text"),
        TextAnalysis.UrlPattern, "<URL>"),
        TextAnalysis.EmailPattern, "<EMAIL>"))
      .head().getString(0)
    assert(!scrubbed.contains("@") && scrubbed.contains("<EMAIL>"))
  }

  test("repetition ratio flags the boilerplate document") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"), // one shingle repeated 4x
      (2L, "a b c d e f g")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(3),
          r.getDouble(r.fieldIndex("repetition_ratio")))).toMap
    assert(out(1L) == ((4L, 4L, 1.0)))   // all 4 shingles identical
    assert(out(2L)._3 == 0.2)            // 5 distinct shingles, max 1
  }

  test("top tokens rank by count with an alphabetical tiebreak") {
    val docs = Seq(
      (1L, "zz aa zz"), (2L, "aa bb")).toDF("doc_id", "text")
    val got = TextAnalysis.topTokens(docs, k = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // aa and zz both occur 2x → aa first alphabetically
    assert(got == Seq(("aa", 2L, 2L), ("zz", 2L, 1L)))
  }

  test("tf-idf ranks a doc's distinctive term above the shared one") {
    val docs = Seq(
      (1L, "common rare1 rare1"), (2L, "common rare2"),
      (3L, "common filler")).toDF("doc_id", "text")
    val top1 = TextAnalysis.tfIdfTopTerms(docs, k = 1).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(top1 == Map(1L -> "rare1", 2L -> "rare2", 3L -> "filler"))
  }

  test("contamination profile counts shared distinct shingles") {
    val corpus = Seq(
      (1L, Seq("a b c", "b c d")),          // both contaminated
      (2L, Seq("x y z", "y z w", "z w v")), // clean
      (3L, Seq("a b c", "q r s"))           // half contaminated
    ).toDF("doc_id", "sh")
    val bench = Seq((99L, Seq("a b c", "b c d", "m n o")))
      .toDF("doc_id", "sh")
    val out = Dedup.contaminationProfile(corpus, bench).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(r.fieldIndex("contamination_ratio")))).toMap
    assert(out == Map(
      1L -> ((2L, 2L, 1.0)),
      2L -> ((3L, 0L, 0.0)),
      3L -> ((2L, 1L, 0.5))))
  }

  test("13-gram decontamination: interior quote flags, 12-token " +
       "overlap and short-quote blindness don't") {
    // 13 tokens the quoting doc embeds behind a prefix (interior
    // grams survive); doc 2 shares only the first 12 tokens (no
    // 13-gram in common); doc 3 quotes a SHORT bench doc (< 13
    // tokens -> whole-text gram, prefix changes it -> blind)
    val quote = (1 to 13).map(i => s"w$i").mkString(" ")
    val bench = Seq(
      (90L, quote),
      (91L, "short secret passage")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, s"a doc saying $quote and more"),
      (2L, (1 to 12).map(i => s"w$i").mkString(" ") + " different"),
      (3L, "quoting short secret passage here")
    ).toDF("doc_id", "text")
    val out = Dedup.ngramDecontamination(corpus, bench).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(4))).toMap
    assert(out(1L)._2 && out(1L)._1 >= 1L, s"quote missed: $out")
    assert(!out(2L)._2 && !out(3L)._2, s"false positives: $out")
  }

  test("dedup token savings: copies bill to the uploading source") {
    // source A uploads a 4-token doc; source B uploads an exact copy
    // (different whitespace — normText collapses it) plus a unique
    // 2-token doc. Keeper is the smallest doc_id (A's), so B's copy
    // tokens are the saved ones.
    val tk = Seq(
      (1L, "A", "a b c d"),
      (2L, "B", "a  b   c d"),
      (3L, "B", "x y")).toDF("doc_id", "source", "text")
    // exercise the exact aggregation via a tiny corpus: reuse the
    // operator body through a local temp parquet + the sfDir contract
    val dir = java.nio.file.Files.createTempDirectory("t71").toString
    tk.withColumn("lang", lit("en")).withColumn("n_chars", lit(7L))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = ExtQueries.dedupTokenSavings(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    // doc 1 mirrors to +200000 (doc_id % 5 == 0? 1%5!=0; none of 1,2,3
    // mirror except doc_id 0 — so corpus == base here)
    assert(out("A") == ((1L, 1L, 4L, 4L, 0L)))
    // B: copy dropped (4 tokens saved of 6): 666666666 in e9
    assert(out("B") == ((2L, 1L, 6L, 2L, 666666666L)))
  }

  test("domain mixture keeps within-rate shares and is deterministic") {
    val docs = Tables.documents(spark, sfDir)
    val a = TextAnalysis.domainMixture(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val b = TextAnalysis.domainMixture(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(a == b && a.nonEmpty)            // same assignment every run
    a.foreach { case (src, (pct, total, kept)) =>
      assert(pct >= 10 && pct <= 90, s"$src rate $pct out of range")
      assert(kept <= total, s"$src kept $kept of $total")
    }
  }

  test("content-bucketed split puts exact duplicates in the same split") {
    val docs = Seq(
      (1L, "the same document text"), (999999L, "the same document text"),
      (2L, "THE  SAME   document text"), // normalizes identically
      (3L, "a different text entirely")).toDF("doc_id", "text")
    val splits = TextAnalysis.trainTestSplit(docs).collect()
      .map(r => r.getLong(0) -> r.getString(r.fieldIndex("split"))).toMap
    assert(splits(1L) == splits(999999L))
    assert(splits(1L) == splits(2L))
  }

  test("hashed classifier: per-row shape, deterministic, feature count") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha"),
      (3L, "alpha beta gamma")).toDF("doc_id", "text")
      .unionByName(Seq(4L).toDF("doc_id")
        .withColumn("text", lit(null).cast("string")))
    val out = TextAnalysis.hashedClassifier(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    // n tokens → n unigrams + (n-1) bigrams; 1 token → token twice
    // (the whole-text shingle fallback)
    assert(out(1L)._1 == 5L)
    assert(out(2L)._1 == 2L)
    assert(out(3L) == out(1L)) // same text, same score — content-pure
    // null text coalesces to '': one token + the whole-text fallback
    // shingle, a real accounted row (never n_features = -1)
    assert(out(4L)._1 == 2L)
    assert(out.values.forall(v => v._2 >= -1.0 && v._2 <= 1.0))
    assert(out.values.forall(v => v._3 == (v._2 > 0)))
    // the stub weights are centered: a larger corpus keeps roughly half
    val big = TextAnalysis.hashedClassifier(
      graft.sources.Tables.documents(spark, sfDir))
    val keepFrac = big.filter(col("keep")).count().toDouble / big.count()
    assert(keepFrac > 0.2 && keepFrac < 0.8, s"keep fraction $keepFrac")
  }

  test("weight-table classifier ≡ stub; one broadcast join, no shuffle") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val viaTable = TextAnalysis.hashedClassifierWithWeights(
      docs, TextAnalysis.stubWeights(spark))
    // the design claim: swapping the inline stub for a pretrained
    // (bucket, weight_milli) table changes NOTHING about the scores
    val stub = TextAnalysis.hashedClassifier(docs).collect().toSet
    assert(viaTable.collect().toSet == stub)
    // …and the only plan delta is one broadcast of the packed 1-row
    // weight array: no extra exchange on the corpus side
    val plan = viaTable.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"weight table not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"weight join shuffled the corpus:\n$plan")
    val corpusExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(corpusExchanges == 0,
      s"corpus side grew $corpusExchanges hash exchanges:\n$plan")
  }

  test("weight-table classifier rejects a malformed table loudly") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    // bucket 7 missing → counts/range named in the error, not silent zeros
    val holey = TextAnalysis.stubWeights(spark).filter(col("bucket") =!= 7)
    val e = intercept[Exception](
      TextAnalysis.hashedClassifierWithWeights(docs, holey).collect())
    val msg = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(m => Option(m.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(msg.contains("buckets 0..4095") && msg.contains("rows=4095"),
      s"expected a descriptive weight-table error, got: $msg")
  }

  test("bigram LM scores match hand computation; word order matters") {
    def r(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramLogprob(docs).collect()
      .map(row => row.getLong(0) -> ((row.getLong(1), row.getDouble(2))))
      .toMap
    // uni: a=3 b=2 c=1, N=6; bigrams: (a,b)=2, (a,c)=1; C(a)=3
    def avg(terms: Double*) = r(
      terms.map(t => BigDecimal(r(t, 9).toString)).sum.toDouble / terms.size,
      6)
    assert(got(1L) == ((2L, avg(math.log(3.0 / 6), math.log(2.0 / 3)))))
    assert(got(2L) == got(1L))
    assert(got(3L) == ((2L, avg(math.log(3.0 / 6), math.log(1.0 / 3)))))
    // the fluency property t25's unigram model cannot have: a scrambled
    // doc shares its unigram score but loses its bigram score
    val corpus = Seq((1L, "x y x y x y"), (2L, "x y x y x y"),
      (3L, "y y x x y x")).toDF("doc_id", "text")
    val scores = TextAnalysis.bigramLogprob(corpus).collect()
      .map(row => row.getLong(0) -> row.getDouble(2)).toMap
    assert(scores(3L) < scores(1L))
  }

  test("segment dedup removes cross-doc chrome, keeps within-doc repeats") {
    val hdr = "a b c d e f g h" // exactly one 8-token segment
    val docs = Seq(
      (1L, s"$hdr one two three four five six seven eight nine"),
      (2L, s"$hdr ten eleven twelve"),
      (3L, s"$hdr unique3"),
      (4L, s"$hdr unique4"),
      (5L, "free standing text with no chrome"),
      (6L, hdr), // all boilerplate → empty survivor
      (7L, "p q r s t u v w p q r s t u v w") // self-repeat, one doc
    ).toDF("doc_id", "text")
      // null text must survive as an accounted empty row, not vanish
      .unionByName(Seq(8L).toDF("doc_id")
        .withColumn("text", lit(null).cast("string")))
    val out = TextAnalysis.segmentDedup(docs, segTokens = 8, maxDocs = 3)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // header is in docs 1,2,3,4,6 = 5 docs > cap 3 → removed everywhere
    assert(out(1L) ==
      (("one two three four five six seven eight nine", 3L, 1L)))
    assert(out(2L) == (("ten eleven twelve", 2L, 1L)))
    assert(out(5L) == (("free standing text with no chrome", 1L, 0L)))
    assert(out(6L) == (("", 1L, 1L)))
    // the repeated segment lives in ONE doc (distinct-doc count = 1):
    // both copies survive, in order
    assert(out(7L) == (("p q r s t u v w p q r s t u v w", 2L, 0L)))
    assert(out(8L) == (("", 1L, 0L))) // null text: kept, one '' segment
    assert(out.size == 8) // every doc survives with accounting
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("extended PII redaction masks IPs, phones and SSN-shaped ids") {
    val docs = Seq(
      (1L, "ping 10.0.0.1 or call 555-123-4567"),
      (2L, "ssn 987-65-4320 mail c@d.io at https://x.example/y"),
      (3L, "plain text"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TextAnalysis.piiRedact(docs).collect().map { r =>
      r.getLong(0) -> ((r.getLong(r.fieldIndex("n_ips")),
        r.getLong(r.fieldIndex("n_phones")),
        r.getLong(r.fieldIndex("n_ids")),
        r.getLong(r.fieldIndex("n_emails")),
        r.getLong(r.fieldIndex("n_urls")),
        r.getString(r.fieldIndex("redacted_md5"))))
    }.toMap
    assert(out(1L)._1 == 1 && out(1L)._2 == 1 && out(1L)._3 == 0)
    // the 3-2-4 SSN shape is NOT also counted as a 3-3-4 phone
    assert(out(2L) == ((0L, 0L, 1L, 1L, 1L,
      md5Hex("ssn <ID> mail <EMAIL> at <URL>"))))
    assert(out(1L)._6 == md5Hex("ping <IP> or call <PHONE>"))
    assert(out(3L)._6 == md5Hex("plain text"))
    // null text: zero counts + the empty digest, not -1s (t28 rule)
    assert(out(4L) == ((0L, 0L, 0L, 0L, 0L, md5Hex(""))))
  }

  test("credit-card audit: Luhn separates cards from long order ids") {
    val docs = Seq(
      // classic valid test numbers: 16-digit, 16-digit, 13-digit
      (1L, "pay 4539578763621486 now"),
      (2L, "visa 4111111111111111 or old 4222222222222"),
      // off-by-one checksum: card-shaped but NOT a card
      (3L, "order 4539578763621487 shipped"),
      // 17 digits: no 13-16 run on word boundaries matches at all
      (4L, "tracking 12345678901234567 ok"),
      (5L, "plain text"),
      (6L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TextAnalysis.ccAudit(docs).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))
    }.toMap
    assert(out(1L) == ((1L, 1L, md5Hex("pay <CC> now"))))
    assert(out(2L) == ((2L, 2L, md5Hex("visa <CC> or old <CC>"))))
    // the shape gate fires, the checksum gate refuses — text untouched
    assert(out(3L) ==
      ((1L, 0L, md5Hex("order 4539578763621487 shipped"))))
    assert(out(4L) == ((0L, 0L, md5Hex("tracking 12345678901234567 ok"))))
    assert(out(5L) == ((0L, 0L, md5Hex("plain text"))))
    assert(out(6L) == ((0L, 0L, md5Hex(""))))
  }

  test("redaction stays on candidate boundaries: no bleed into longer runs") {
    // the valid card also occurs as a PREFIX of a 17-digit tracking
    // run that never matched as a candidate — \b-anchored replacement
    // redacts only the standalone match (a bare substring replace
    // would also mangle the tracking number)
    val docs = Seq(
      (1L, "card 4539578763621486 ref 45395787636214869 end"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.ccAudit(docs).collect()(0)
    assert(r.getLong(1) == 1L && r.getLong(2) == 1L)
    assert(r.getString(3) ==
      md5Hex("card <CC> ref 45395787636214869 end"),
      "redaction bled into the 17-digit run")
  }

  test("luhnValid agrees with a reference implementation on 400 random runs") {
    def luhnRef(s: String): Boolean = {
      val terms = s.reverse.map(_ - '0').zipWithIndex.map { case (d, i) =>
        if (i % 2 == 0) d else { val t = d * 2; if (t > 9) t - 9 else t }
      }
      terms.sum % 10 == 0
    }
    val rnd = new scala.util.Random(42) // deterministic corpus
    val runs = (1 to 400).map { i =>
      val len = 13 + rnd.nextInt(4)
      (i.toLong, (1 to len).map(_ => rnd.nextInt(10)).mkString)
    }
    val got = runs.toDF("id", "cc")
      .select(col("id"), TextAnalysis.luhnValid(col("cc")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    runs.foreach { case (id, cc) =>
      assert(got(id) == luhnRef(cc), s"luhn mismatch on $cc")
    }
    // ~10% of random runs should pass — sanity that both sides are
    // actually discriminating, not constant
    val passes = got.values.count(identity)
    assert(passes > 10 && passes < 100, s"$passes/400 passed")
  }

  test("gopher rules fire independently and conjoin into passes") {
    val good = (Seq.fill(5)(
      "the quick brown fox jumps over a lazy dog and runs to it")
      .mkString(" "))                          // 60 words, 4 stopwords
    val numeric = (Seq.fill(60)("12345") ++ Seq("the", "a"))
      .mkString(" ")                           // alpha frac 2/62
    val symbols = (Seq.fill(10)("#") ++ Seq.fill(10)("word"))
      .mkString(" ")                           // symbol ratio 0.5
    val docs = Seq(
      (1L, good), (2L, "short doc"), (3L, numeric), (4L, symbols),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs).collect().map { r =>
      r.getLong(0) -> ((r.getBoolean(r.fieldIndex("r_word_count")),
        r.getBoolean(r.fieldIndex("r_mean_len")),
        r.getBoolean(r.fieldIndex("r_alpha")),
        r.getBoolean(r.fieldIndex("r_symbol")),
        r.getBoolean(r.fieldIndex("r_stop")),
        r.getBoolean(r.fieldIndex("passes"))))
    }.toMap
    assert(out(1L) == ((true, true, true, true, true, true)))
    // short: fails word count and stopwords, not the shape rules
    assert(out(2L) == ((false, true, true, true, false, false)))
    // numeric: only the alphabetic-word rule fails
    assert(out(3L) == ((true, true, false, true, true, false)))
    // symbol-heavy: '#' tokens sink the symbol ratio AND alpha fraction
    assert(out(4L)._4 == false && out(4L)._6 == false)
    // null text gates like the empty doc, it does not crash (t28 rule)
    assert(out(5L)._6 == false)
    // the reported measures carry the evidence
    val m = TextAnalysis.gopherRules(docs).collect().map { r =>
      r.getLong(0) -> r.getDouble(r.fieldIndex("alpha_word_frac"))
    }.toMap
    assert(m(3L) < 0.1 && m(1L) == 1.0)
  }

  test("quality budget keeps each source's top fraction by score") {
    val docs = Tables.documents(spark, sfDir)
    val out = TextAnalysis.qualityBudget(docs, frac = 0.5).collect()
    val bySource = out.groupBy(_.getString(1))
    bySource.foreach { case (src, rows) =>
      val kept = rows.filter(_.getBoolean(4))
      val dropped = rows.filterNot(_.getBoolean(4))
      // every kept doc scores >= every dropped doc (ties broken by id)
      if (kept.nonEmpty && dropped.nonEmpty) {
        val minKept = kept.map(_.getDouble(2)).min
        val maxDropped = dropped.map(_.getDouble(2)).max
        assert(minKept >= maxDropped, s"$src: budget order violated")
      }
      // percent_rank <= 0.5 keeps the top half plus the boundary doc
      val n = rows.length
      assert(kept.length >= n / 2 && kept.length <= n / 2 + 2,
        s"$src: kept ${kept.length} of $n")
    }
    // deterministic across runs
    val again = TextAnalysis.qualityBudget(docs, frac = 0.5).collect()
    assert(out.map(_.mkString("|")).sorted.toSeq ==
      again.map(_.mkString("|")).sorted.toSeq)
    // one shuffle: the source-partitioned window, nothing else
    val frame = TextAnalysis.qualityBudget(docs, frac = 0.5)
    frame.collect()
    val shuffles = graft.std.Plans.collect(frame) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.length
    assert(shuffles == 1, s"expected the window shuffle only, saw $shuffles")
  }

  test("source report equals the per-doc operators, in one scan") {
    val docs = graft.ext.ExtQueries.piiCorpusExt(
      Tables.documents(spark, sfDir))
    val rep = TextAnalysis.sourceReport(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    // cross-check one source against the standalone per-doc operators
    val src = rep.keySet.min
    val ofSrc = docs.filter(col("source") === src)
    val n = ofSrc.count()
    assert(rep(src).getLong(1) == n)
    val toks = TextAnalysis.tokenStats(ofSrc)
      .agg(sum("n_tokens")).head().getLong(0)
    assert(rep(src).getLong(2) == toks)
    val qs = TextAnalysis.qualityScore(ofSrc)
      .select("quality_score").collect().map(_.getDouble(0))
    val meanQ = math.rint(qs.sum / n * 1e6) / 1e6
    assert(math.abs(rep(src).getDouble(3) - meanQ) < 1e-6)
    val passRate = TextAnalysis.gopherRules(ofSrc)
      .filter(col("passes")).count().toDouble / n
    assert(rep(src).getDouble(4) == math.rint(passRate * 1e6) / 1e6)
    val piiRate = TextAnalysis.piiRedact(ofSrc)
      .filter(col("n_emails") + col("n_urls") + col("n_ips")
        + col("n_ids") + col("n_phones") > 0).count().toDouble / n
    assert(rep(src).getDouble(5) == math.rint(piiRate * 1e6) / 1e6)
    // the scale claim: ONE aggregation exchange, nothing else
    val exchanges = graft.std.Plans.collect(
      TextAnalysis.sourceReport(docs)) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.length
    assert(exchanges == 1, s"expected 1 shuffle, saw $exchanges")
  }

  test("PMI collocations: hand-counted probabilities, count floor, ties") {
    import spark.implicits._
    // unigrams a=4 b=4 c=2 (n=10); bigrams (a,b)=3 (b,a)=(a,c)=(b,c)
    // =(c,a)=1 (nb=7). Floor 2 keeps ONLY (a,b):
    // pmi = ln((3/7) / ((4/10)*(4/10)))
    val docs = Seq((1L, "a b a b"), (2L, "a c"), (3L, "b c a b"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.pmiCollocations(docs, minCount = 2, k = 10)
      .collect()
    graft.std.Materialize.releaseAll()
    assert(r.length == 1, s"count floor must keep only (a,b): ${r.toSeq}")
    val row = r(0)
    assert((row.getString(0), row.getString(1)) == (("a", "b")))
    assert((row.getLong(2), row.getLong(3), row.getLong(4)) ==
      ((3L, 4L, 4L)))
    val expected = BigDecimal(math.log((3.0 / 7) / ((4.0 / 10) * (4.0 / 10))))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getDouble(5) == expected,
      s"pmi ${row.getDouble(5)} != $expected")
    // floor 1 admits the four singleton bigrams; they share identical
    // counts where symmetric, so the (pmi, w1, w2) total order decides
    val all = TextAnalysis.pmiCollocations(docs, minCount = 1, k = 10)
      .collect().map(x => (x.getString(0), x.getString(1)))
    graft.std.Materialize.releaseAll()
    assert(all.length == 5 && all.distinct.length == 5)
    // (a,b) still tops; (a,c)/(b,c)/(c,a) tie at ln((1/7)/0.08) and
    // resolve on the (w1, w2) tiebreak; (b,a) is negative-PMI last
    assert(all.head == (("a", "b")) && all.last == (("b", "a")) &&
      all.slice(1, 4).toSeq == Seq(("a", "c"), ("b", "c"), ("c", "a")),
      s"total order broke: ${all.toSeq}")
  }
}
