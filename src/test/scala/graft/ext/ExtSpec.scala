package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.Tables

/** Tests for the extension paths the DuckDB oracle can't gate: the
  * probabilistic LSH candidate generation (recall vs brute force), the
  * dedup keep-first operator, and the multimodal plumbing.
  */
class ExtSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("dropExactDuplicates keeps exactly one survivor per text, smallest id") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "c"), (4L, " A  B "))
      .toDF("doc_id", "text")
    val out = Dedup.dropExactDuplicates(docs).collect().map(_.getLong(0)).sorted
    // "a b", "a b", " A  B " normalize identically → survivor 1; plus 3
    assert(out.toSeq == Seq(1L, 3L))
  }

  test("sourceOverlap: shared digests, zero pairs, within-source dups") {
    // s1: {a, b, c}; s2: {a, b} (plus "A  b" normalizing into b — the
    // within-source dup must NOT inflate the distinct set); s3: {z}
    val docs = Seq(
      ("s1", "a"), ("s1", "b"), ("s1", "c"),
      ("s2", "a"), ("s2", "b"), ("s2", " A "), ("s3", "z"))
      .toDF("source", "text")
    val r = Dedup.sourceOverlap(docs).collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4), x.getDouble(5),
          x.getDouble(6)))).toMap
    graft.std.Materialize.releaseAll()
    assert(r.size == 3) // all pairs, including both zero-overlap ones
    // " A " normalizes to "a": s2 still has 2 distinct digests, and
    // shared(s1,s2) = {a, b} = 2; jaccard 2/(3+2-2), overlap 2/min(3,2)
    assert(r(("s1", "s2")) == ((3L, 2L, 2L, 2.0 / 3.0, 1.0)))
    assert(r(("s1", "s3")) == ((3L, 1L, 0L, 0.0, 0.0)))
    assert(r(("s2", "s3")) == ((2L, 1L, 0L, 0.0, 0.0)))
  }

  test("MinHash LSH recall on injected near-dup pairs (probabilistic, ≥90%)") {
    val pairs = ExtQueries.minHashLshPairs(spark, sfDir)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = ExtQueries.jaccardGroundTruth(spark, sfDir)
      .filter(col("jaccard") >= 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty)
    // banding with 4 bands × 2 rows misses a J=0.85 pair with p≈0.6%;
    // demand ≥90% recall, not perfection (the oracle compare stays exact
    // because the DuckDB twin mirrors the banding, misses and all)
    val found = (expected & pairs).size.toDouble / expected.size
    assert(found >= 0.9,
      s"LSH recall $found: missed ${(expected -- pairs).size} of ${expected.size}")
  }

  test("connected components fail loudly when maxIter is too small") {
    // a 5-node path needs 4 propagation rounds + 1 stability round;
    // maxIter=2 must throw, never return partial labels
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("id_a", "id_b")
    val e = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(nodes, edges, maxIter = 2).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("native Md5Lane equals the builtin conv(substring(md5)) chain") {
    // the native kernel replaces the documented cross-engine hash
    // contract's builtin form — any value drift would desync every
    // DuckDB twin, so check all lanes over adversarial inputs
    val rows = Seq("", "a", "plane3|17", "héllo wörld", "0|the quick fox",
      "x" * 10000, "tab\tand\nnewline").toDF("s")
    val checks = rows.select(
      (0 until 8).map { i =>
        val off = (i % 4) * 4
        (org.apache.spark.sql.GraftColumns.md5Lane(col("s"), off, 4) ===
          conv(substring(md5(col("s")), off * 2 + 1, 8), 16, 10)
            .cast("long")).as(s"l$i")
      } :+
        (org.apache.spark.sql.GraftColumns.md5Lane(col("s"), 0, 7) ===
          conv(substring(md5(col("s")), 1, 14), 16, 10).cast("long"))
          .as("h64"): _*)
    assert(checks.collect().forall(r => (0 until 9).forall(r.getBoolean)))
  }

  test("literal-plane LSH buckets equal the expression-derived ones") {
    // the plan-time md5 mirror must reproduce the in-plan hash bits
    // exactly, or the two forms would bucket (and the s4 oracle would
    // hash) differently
    val vecs = Tables(spark, sfDir, "embeddings")
    val expr = Similarity.withLshBuckets(vecs, 16)
      .select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lit = Similarity.withLshBuckets(vecs, 16, dims = Some(64))
      .select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(expr.nonEmpty)
    assert(expr == lit)
  }

  test("lshCandidatePairs maxBucketSize drops boilerplate cliques") {
    // 40 identical texts → identical signatures → one bucket of 40 per
    // band → 780 quadratic candidates; the cap drops the clique (its
    // resolution belongs to exact dedup, not pairwise verification)
    val docs = (1L to 40L).map(i => (i, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val withSh = docs.select(col("doc_id"),
      TextOps.shingles(split(col("text"), " "), 3).as("sh"))
    val sigs = Dedup.minHashSignatures(withSh, 8)
    assert(Dedup.lshCandidatePairs(sigs, 8, 4).count() == 40L * 39 / 2)
    assert(Dedup.lshCandidatePairs(sigs, 8, 4,
      maxBucketSize = Some(10)).count() == 0L)
    // the cap flows through the tuning sweep too: the clique corpus
    // produces zero candidates at EVERY config once capped (coarse
    // membership is a predicate over the capped finest candidate set)
    val truth = Seq((1L, 2L)).toDF("id_a", "id_b")
    val capped = Dedup.lshTuningReport(withSh, sigs, 8, Seq(2, 4, 8), 0.3,
        truth, maxBucketSize = Some(10)).collect()
    graft.std.Materialize.releaseAll()
    assert(capped.length == 3)
    capped.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_candidates")) == 0L)
      assert(r.getLong(r.fieldIndex("n_truth_found")) == 0L)
      assert(r.getLong(r.fieldIndex("n_truth")) == 1L)
    }
  }

  test("lshTuningReport: nested band configs trade precision for recall") {
    // 30 unique docs + 10 mutated copies (every 4th token dropped) —
    // some truth pairs LSH finds only at finer band configs
    val base = (1L to 30L).map { i =>
      (i, (0 until 12).map(t => s"w${i}_$t").mkString(" "))
    }
    val muts = base.take(10).map { case (i, t) =>
      (i + 1000L,
        t.split(" ").zipWithIndex.filter(_._2 % 4 != 0).map(_._1)
          .mkString(" "))
    }
    val docs = (base ++ muts).toDF("doc_id", "text")
    val withSh = Dedup.shingleFrame(docs)
    val sigs = Dedup.minHashSignatures(withSh, 8)
    val truth = (1L to 10L).map(i => (i, i + 1000L)).toDF("id_a", "id_b")
    val rep = Dedup.lshTuningReport(withSh, sigs, 8, Seq(2, 4, 8), 0.3,
        truth).collect()
      .map(r => r.getInt(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))).toMap.toSeq.sortBy(_._1)
    graft.std.Materialize.releaseAll()
    val counts = rep.map(_._2)
    // band boundaries nest (r halves), so the candidate set only grows
    // with more bands — and with it the truth pairs found
    assert(counts.map(_._1) == counts.map(_._1).sorted)
    assert(counts.map(_._4) == counts.map(_._4).sorted)
    counts.foreach { case (nc, nv, nt, nf) =>
      assert(nv <= nc && nf <= nt && nt == 10L)
    }
    // at 8 bands of 1 row a single shared minimum suffices, so the
    // finest config finds most pairs — but NOT all: the ~25% token
    // mutation leaves shingle Jaccard ≈ 0.2, and with 8 lanes
    // P(no lane agrees) ≈ 0.8^8 ≈ 0.17, so a couple of pairs
    // deterministically share no minimum (it's 8 of 10 on this
    // md5-fixed corpus). That gap is exactly what the report exists
    // to surface.
    assert(counts.last._4 >= 8L && counts.last._4 > counts.head._4)
  }

  test("connected components converge correctly on NON-numeric ids") {
    // the DECIMAL label-sum convergence probe nulls out on string labels
    // (cast → null, sum → null) — before the type branch that silently
    // declared convergence after one round with one-hop labels; string
    // ids must take the any-label-changed join probe and still resolve
    // the full chain to its lexicographic min
    val nodes = Seq("d1", "d2", "d3", "d4", "d5").toDF("doc_id")
    val edges = Seq(("d4", "d5"), ("d3", "d4"), ("d2", "d3"), ("d1", "d2"))
      .toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(nodes, edges).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cc == Map("d1" -> "d1", "d2" -> "d1", "d3" -> "d1",
      "d4" -> "d1", "d5" -> "d1"))
  }

  test("star-rounds CC matches min-label propagation on a random graph") {
    val rnd = new scala.util.Random(7)
    val n = 400
    val edges = (1 to 300)
      .map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter(p => p._1 != p._2).toDF("id_a", "id_b")
    val nodes = (0L until n.toLong).toDF("doc_id")
    val expected = Dedup.connectedComponents(nodes, edges, maxIter = 50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Dedup.connectedComponentsStars(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("star-rounds CC resolves a path too deep for the same propagation budget") {
    // a 60-node path has diameter 59: min-label propagation cannot finish
    // in 10 rounds (fails loudly), star contraction needs only O(log² n)
    val n = 60L
    val nodes = (0L until n).toDF("doc_id")
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalArgumentException] {
      Dedup.connectedComponents(nodes, edges, maxIter = 10).collect()
    }
    val labels = Dedup.connectedComponentsStars(nodes, edges, maxIter = 10)
      .collect().map(r => r.getLong(1)).toSet
    assert(labels == Set(0L))
  }

  test("connected components merge transitive chains to the min label") {
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    // chain 1-2-3 (diameter 2), pair 4-5, isolated 6
    val edges = Seq((2L, 3L), (1L, 2L), (4L, 5L)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(nodes, edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L))
  }

  test("semantic clusters (d11): reps are keepers, members point at a " +
       "keeper, near-dup edges land in one cluster") {
    val clusters = ExtQueries.semanticClusters(spark, sfDir)
    val rows = clusters.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    graft.std.Materialize.releaseAll()
    val corpusSize = ExtQueries.nearDupVectors(
      Tables.embeddings(spark, sfDir)).count()
    assert(rows.length == corpusSize, "every vector must be labeled")
    val rep = rows.map(r => r._1 -> r._2).toMap
    // keeper ⇔ vector is its own representative; reps are cluster minima
    rows.foreach { case (id, r, keeper) =>
      assert(keeper == (id == r))
      assert(r <= id, s"rep $r above member $id — not the component min")
      assert(rep(r) == r, s"rep $r of $id is not itself a keeper")
    }
    // the injected near-dups produce at least one non-trivial cluster,
    // and every verified near-dup pair resolves to one representative
    val pairs = Similarity.lshNearDupPairs(ExtQueries.nearDupVectors(
        Tables.embeddings(spark, sfDir)), 0.97, dims = Some(64))
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    graft.std.Materialize.releaseAll()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(rep(a) == rep(b), s"edge ($a,$b) split across clusters")
    }
    assert(rows.count(!_._3) > 0, "injected dups should drop something")
  }

  test("embedding LSH near-dups recall vs brute force") {
    val vecs = ExtQueries.nearDupVectors(Tables.embeddings(spark, sfDir))
    val exact = Similarity.nearDupPairs(vecs, 0.97)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshNearDupPairs(vecs, 0.97, nPlanes = 8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // every LSH pair is exact-verified (precision 1 by construction) …
    assert(lsh.subsetOf(exact))
    // … and 8-plane recall on 0.99-cosine pairs should be high
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low: ${lsh.size}/${exact.size}")
  }

  test("MIPS ranks by magnitude where cosine would not") {
    // q=(1,0): the long 45° vector wins on inner product (10 vs 0.9),
    // the short near-parallel one wins on cosine (0.994 vs 0.707)
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (10L, Seq(10.0f, 10.0f)),
      (20L, Seq(0.9f, 0.1f))).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") === 1L)
    val mips = Similarity.mipsTopK(queries, corpus, 2).collect()
      .sortBy(_.getLong(2)).map(_.getLong(1)).toSeq
    val cos = Similarity.bruteForceTopK(queries, corpus, 2).collect()
      .sortBy(_.getInt(2)).map(_.getLong(1)).toSeq
    assert(mips == Seq(10L, 20L))
    assert(cos == Seq(20L, 10L))
  }

  test("norm-augmented MIPS ANN: recall vs the exact kernel") {
    val vecs = Tables.embeddings(spark, sfDir)
    val queries = vecs.filter(col("vec_id") < 20)
    val exact = Similarity.mipsTopK(queries, vecs, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 4 planes → 16 buckets: wide buckets, decent recall; scores of
    // surfaced candidates are exact dots, so any overlap is correctly
    // ranked by construction
    val ann = Similarity.mipsTopKAnn(queries, vecs, 3, nPlanes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.std.Materialize.releaseAll()
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.4, s"MIPS ANN recall $recall")
    // augmentation must not invent scores: ANN results for a query are
    // a subset of the full exact ranking over its bucket — spot-check
    // one (query, neighbor) score equality
    val exactScores = Similarity.mipsTopK(queries, vecs, Int.MaxValue)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val annScores = Similarity.mipsTopKAnn(queries, vecs, 3, nPlanes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3))
    graft.std.Materialize.releaseAll()
    // .get + contains: a pair missing from the exact ranking must fail
    // the assert readably, not throw NoSuchElementException
    assert(annScores.forall { case (k2, v) =>
      exactScores.get(k2).contains(v)
    })
  }

  test("hubness: a designed hub collects every query's top-1; " +
    "antihubs land in the zero row") {
    // hub [1,0] beats the other query for both probes (1-eps^2/2 vs
    // 1-2eps^2 at eps=0.3); the orthogonal-ish vector is never
    // retrieved at k=1
    val corpus = Seq(
      (100L, Seq(1.0f, 0.0f)),   // the hub
      (1L, Seq(1.0f, 0.3f)),     // probe 1
      (2L, Seq(1.0f, -0.3f)),    // probe 2
      (50L, Seq(0.0f, 1.0f))     // the antihub
    ).toDF("vec_id", "embedding")
    val got = Similarity.hubness(
      corpus.filter(col("vec_id") <= 2), corpus, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // N_1(hub) = 2; probes and antihub never retrieved -> zero row 3
    assert(got == Map(2L -> 1L, 0L -> 3L), s"got $got")
  }

  test("hubness: differential vs a plain-Scala cosine top-k replay " +
    "on random integer vectors") {
    // integer components keep every dot product exact in double, so
    // the 6-dp cosine rounding and the (cosine DESC, id ASC) tie rule
    // replay bit-for-bit
    val rnd = new scala.util.Random(20260815L)
    val vecs = (0L until 20L).map { i =>
      val v = Seq.fill(8)(rnd.nextInt(10).toDouble)
      (i, if (v.forall(_ == 0.0)) v.updated(0, 1.0) else v)
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      r6(d / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum)))
    }
    val panel = vecs.filter(_._1 < 6)
    val k = 3
    val occ = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for ((q, qv) <- panel) {
      val top = vecs.filter(_._1 != q)
        .map { case (i, v) => (i, cos(qv, v)) }
        .sortBy { case (i, c) => (-c, i) }.take(k)
      top.foreach { case (i, _) => occ(i) += 1L }
    }
    val hist = occ.values.groupBy(identity)
      .map { case (c, xs) => c -> xs.size.toLong }
    val expected = hist + (0L -> (vecs.size - occ.size).toLong)
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.hubness(df.filter(col("vec_id") < 6), df, k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, s"got $got\nexp $expected")
  }

  test("hubness: mass conservation on the real corpus — occurrences " +
    "sum to k*|panel|, vectors sum to |corpus|") {
    val vecs = Tables.embeddings(spark, sfDir)
    val panel = vecs.filter(col("vec_id") < 20)
    val got = Similarity.hubness(panel, vecs, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    graft.std.Materialize.releaseAll()
    val nPanel = panel.count()
    val nCorpus = vecs.count()
    assert(got.map { case (k, n) => k * n }.sum == 3L * nPanel,
      s"every query list holds exactly k entries: $got")
    assert(got.map(_._2).sum == nCorpus,
      s"every corpus vector lands in exactly one bucket: $got")
    assert(got.count(_._1 == 0L) == 1, s"one zero row: $got")
  }

  test("brute-force top-k is deterministic and self-free") {
    val vecs = Tables.embeddings(spark, sfDir)
    val out = Similarity.bruteForceTopK(vecs.filter(col("vec_id") < 5), vecs, 3)
      .collect()
    assert(out.length == 15)
    assert(out.forall(r => r.getLong(0) != r.getLong(1)))
    val ranks = out.groupBy(_.getLong(0)).values.map(_.map(_.getInt(2)).sorted.toSeq)
    assert(ranks.forall(_ == Seq(1, 2, 3)))
  }

  test("media: synth → extractMeta round-trips the header") {
    val docs = Tables.documents(spark, sfDir).limit(50)
    val meta = Media.extractMeta(Media.synthCorpus(docs)).collect()
    meta.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == 64 + (id % 192).toInt, "width")
      assert(r.getInt(2) == 64 + (id % 128).toInt, "height")
      assert(r.getInt(3) > 8, "payload has body beyond header")
    }
  }

  test("media: sampleFrames chunks cover the payload exactly") {
    val docs = Tables.documents(spark, sfDir).limit(20)
    val media = Media.synthCorpus(docs)
    val frames = Media.sampleFrames(media, chunkBytes = 32)
    val reassembled = frames.groupBy("doc_id")
      .agg(sum(length(col("frame"))).as("total"),
        count(lit(1)).as("n_frames"))
    val orig = media.select(col("doc_id"), length(col("payload")).as("len"))
    val joined = reassembled.join(orig, "doc_id").collect()
    joined.foreach { r =>
      assert(r.getLong(r.fieldIndex("total")) == r.getInt(r.fieldIndex("len")).toLong)
      assert(r.getLong(r.fieldIndex("n_frames")) ==
        math.ceil(r.getInt(r.fieldIndex("len")) / 32.0).toLong)
    }
  }

  test("media: chunk dedup reclaims from appended-tail re-uploads") {
    // two files sharing a 128-byte prefix, one with an appended tail:
    // whole-file digests differ (m3 reclaims nothing), but both full
    // prefix chunks dedup at the 64-byte grain
    val prefix = "x" * 128
    val media = Seq(
      (1L, prefix.getBytes("UTF-8")),
      (2L, (prefix + " tail").getBytes("UTF-8")),
      (3L, "completely different content".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")
    assert(media.select(md5(col("payload"))).distinct().count() == 3)
    val chunks = Media.chunkDedup(media, chunkBytes = 64).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // the 64-byte "x"*64 chunk appears twice in EACH of docs 1 and 2:
    // one digest, 4 refs; the 5-byte " tail" and doc 3's 28 bytes are
    // singletons
    assert(chunks.values.toSet == Set((4L, 64L), (1L, 5L), (1L, 28L)))
    assert(chunks.size == 3)
    // m6 savings over the same store: logical 4*64+5+28 = 289,
    // physical 64+5+28 = 97, saved 192, ratio 192e9 div 289
    val s = Media.dedupSavings(Media.chunkDedup(media, 64)).collect()(0)
    assert(s.getLong(0) == 3L && s.getLong(1) == 6L)
    assert(s.getLong(2) == 289L && s.getLong(3) == 97L)
    assert(s.getLong(4) == 192L)
    assert(s.getLong(5) == 192L * 1000000000L / 289L)
    // an empty store reports zeros with a null ratio
    val empty = Media.dedupSavings(
      Media.chunkDedup(media.filter(col("doc_id") < 0), 64)).collect()(0)
    assert(empty.getLong(0) == 0L && empty.getLong(2) == 0L &&
      empty.isNullAt(5))
  }

  test("media: near-dup pairs score shared-chunk files, cap popular chunks") {
    // docs 1/2: same two distinct 64-byte chunks + doc 2's extra tail
    // -> jaccard 2/3; doc 3 shares nothing; docs 4..9 all share ONE
    // popular chunk that exceeds maxRefs=4 and must not go quadratic
    val a = "a" * 64; val b = "b" * 64; val p = "p" * 64
    val media = (Seq(
      (1L, a + b),
      (2L, a + b + " tail"),
      (3L, "other content entirely")) ++
      (4L to 9L).map(i => (i, p + i.toString * 3)))
      .map { case (id, s) => (id, s.getBytes("UTF-8")) }
      .toDF("doc_id", "payload")
    val pairs = Media.nearDupPairs(media, chunkBytes = 64,
        threshold = 0.5, maxRefs = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // only the (1, 2) pair: 2 shared of (2 + 3 - 2) = 3 -> 0.666667
    assert(pairs == Map((1L, 2L) -> ((2L, 0.666667))))
  }

  test("media: perceptual hash — hand bits, shift invariance, header skip") {
    // 8-byte header + body "aaaabbbb", grid 4: cells (194,194,196,196),
    // total 780 over n=8 -> bits 0,0,1,1 (exact cross-multiplication:
    // 194*8=1552 < 780*2=1560 < 196*8=1568)
    val mk = (id: Long, s: String) => (id, s.getBytes("UTF-8"))
    val media = Seq(
      mk(1L, "00400040" + "aaaabbbb"),
      // every body byte +1 (the brightness-shift re-encode): every
      // chunk digest changes, the mean-threshold bits cannot
      mk(2L, "00400040" + "bbbbcccc"),
      // different header, same body: signature identical (header
      // bytes are container metadata, not content)
      mk(3L, "0080FF00" + "aaaabbbb"),
      mk(4L, "00400040")) // empty body
      .toDF("doc_id", "payload")
    val got = media.select(col("doc_id"),
        Media.perceptualHash(col("payload"), grid = 4).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "0011", s"hand-computed bits: $got")
    assert(got(2L) == "0011", "byte-shift must not move the signature")
    assert(got(3L) == "0011", "header bytes must not enter the signature")
    assert(got(4L) == "0000", "empty body is all zeros")
  }

  test("media: gradient hash — descending cells read 111, ascending " +
    "000, shift/header invariant, empty body zeros") {
    val mk = (id: Long, s: String) => (id, s.getBytes("UTF-8"))
    val media = Seq(
      mk(1L, "00400040" + "ddccbbaa"), // strictly falling cell means
      mk(2L, "00400040" + "eeddccbb"), // +1 re-encode: same gradient
      mk(3L, "0080FF00" + "ddccbbaa"), // header differs: same bits
      mk(4L, "00400040" + "aabbccdd"), // rising means: no bit fires
      mk(5L, "00400040"))              // empty body
      .toDF("doc_id", "payload")
    val got = media.select(col("doc_id"),
        Media.gradientHash(col("payload"), grid = 4).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "111", s"falling means -> all gradient bits: $got")
    assert(got(2L) == "111", "byte-shift must not move the gradient")
    assert(got(3L) == "111", "header bytes must not enter the bits")
    assert(got(4L) == "000", "rising means -> strict > never fires")
    assert(got(5L) == "000", "empty body is all zeros, grid-1 bits")
  }

  test("media: gradient hash rejects grid < 2 loudly (r14 ADVICE — " +
    "grid=1 would build sequence(0,-1) and throw at element_at time)") {
    val e = intercept[IllegalArgumentException] {
      Media.gradientHash(col("payload"), grid = 1)
    }
    assert(e.getMessage.contains("at least 2 cells"))
  }

  test("media: word-peeled perceptual hash equals the per-byte " +
    "reference on random payloads, every tail length") {
    // the fast form parses 6-byte words with ONE conv and peels bytes
    // arithmetically; it must be bit-identical to the per-byte
    // reference — exercised across n mod 6 = 0..5 tails, high bytes
    // (0x80+: hex is unsigned), and all three production grids
    val rnd = new scala.util.Random(20260814L)
    val rows = (0 until 48).map { i =>
      val bodyLen = i // 0..47 covers every word-tail residue
      val bytes = new Array[Byte](8 + bodyLen)
      rnd.nextBytes(bytes)
      (i.toLong, bytes)
    }
    val media = rows.toDF("doc_id", "payload")
    for (grid <- Seq(4, 8, 16)) {
      val diff = media.select(
          Media.perceptualHash(col("payload"), grid).as("fast"),
          Media.perceptualHashRef(col("payload"), grid).as("ref"))
        .filter(col("fast") =!= col("ref")).count()
      assert(diff == 0L, s"grid=$grid: fast and reference disagree")
    }
  }

  test("media: perceptual dups pair equal signatures, cap heavy buckets") {
    val mk = (id: Long, s: String) => (id, s.getBytes("UTF-8"))
    val media = Seq(
      mk(1L, "00400040" + "aaaabbbb"),
      mk(2L, "00400040" + "bbbbcccc"), // re-encode of 1: sig match
      mk(3L, "00400040" + "bbbbaaaa"), // different signature ("1100")
      mk(5L, "00400040" + "aaaabbbb")) // exact copy of 1
      .toDF("doc_id", "payload")
    val pairs = Media.perceptualDups(media, grid = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(3)).toMap
    // bucket "0011" = {1,2,5}: re-encode pairs digest-mismatch, the
    // exact copy digest-matches; doc 3 pairs with nobody
    assert(pairs == Map((1L, 2L) -> false, (2L, 5L) -> false,
      (1L, 5L) -> true), s"got $pairs")
    // the cap drops the whole 3-member bucket from pair generation
    val capped = Media.perceptualDups(media, grid = 4, maxBucket = 2)
      .collect()
    assert(capped.isEmpty, "over-cap bucket must not generate pairs")
  }

  test("media: temporal alignment finds trimmed+re-encoded duplicates " +
    "at the modal offset") {
    // doc 1: four 8-byte frames with distinct perceptual sigs.
    // doc 2: doc 1 MINUS its first frame, every byte shifted +1 (the
    // m7 re-encode) — every digest differs, yet frames align at
    // offset -1 across 2 of 2 possible windows. doc 3 is unrelated.
    val f1 = "aaaabbbb"; val f2 = "bbbbaaaa"
    val f3 = "aabbaabb"; val f4 = "bbaabbaa"
    def shift(s: String) = s.map(c => (c + 1).toChar)
    val mk = (id: Long, s: String) => (id, s.getBytes("UTF-8"))
    val media = Seq(
      mk(1L, "00400040" + f1 + f2 + f3 + f4),
      mk(2L, "00800080" + shift(f2 + f3 + f4)),
      mk(3L, "00400040" + "abababab" * 4))
      .toDF("doc_id", "payload")
    val got = Media.temporalAlignment(media, frameBytes = 8,
        window = 2, grid = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    graft.std.Materialize.releaseAll()
    assert(got == Map((1L, 2L) -> ((-1L, 2L))),
      s"trimmed re-encode must align at offset -1 with 2 windows: $got")
  }

  test("media: scene cuts fire on signature flips and number scenes; " +
    "re-encode keeps the same boundaries") {
    // frames (8 bytes, grid 4): "aaaabbbb" -> 0011, "bbbbaaaa" -> 1100
    // sequence 0011, 0011, 1100, 1100: deltas null,0,4,0 -> one cut at
    // frame 2, scenes 1,1,2,2
    val f1 = "aaaabbbb"; val f2 = "bbbbaaaa"
    def shift(s: String) = s.map(c => (c + 1).toChar)
    val mk = (id: Long, s: String) => (id, s.getBytes("UTF-8"))
    val media = Seq(
      mk(1L, "00400040" + f1 + f1 + f2 + f2),
      mk(2L, "00800080" + shift(f1 + f1 + f2 + f2))) // m7 re-encode
      .toDF("doc_id", "payload")
    val got = Media.sceneCuts(media, frameBytes = 8, grid = 4,
        cutBits = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((Option(r.get(3)).map(_.asInstanceOf[Long]),
          r.getBoolean(4), r.getLong(5)))).toMap
    for (id <- Seq(1L, 2L)) {
      assert(got((id, 0L)) == ((None, false, 1L)))
      assert(got((id, 1L)) == ((Some(0L), false, 1L)))
      assert(got((id, 2L)) == ((Some(4L), true, 2L)))
      assert(got((id, 3L)) == ((Some(0L), false, 2L)))
    }
  }

  test("media: resizeStub scales metadata and truncates payload") {
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") === 10)
    val media = Media.synthCorpus(docs)
    val resized = Media.resizeStub(media, targetWidth = 32).head()
    val origLen = media.head().getAs[Array[Byte]]("payload").length
    val meta = resized.getStruct(resized.fieldIndex("meta"))
    assert(meta.getInt(0) == 32)
    val w0 = 64 + 10 % 192
    assert(meta.getInt(1) == ((64 + 10 % 128) * (32.0 / w0)).toInt)
    val newLen = resized.getAs[Array[Byte]]("payload").length
    assert(newLen == math.max(9, (origLen * (32.0 / w0)).toInt))
  }

  test("media: decodeFeatureStub is deterministic with stable dims") {
    val docs = Tables.documents(spark, sfDir).limit(10)
    val f1 = Media.featurize(Media.synthCorpus(docs)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val f2 = Media.featurize(Media.synthCorpus(docs)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(f1 == f2)
    assert(f1.values.forall(v => v.length == 8 && v.forall(x => x >= -1 && x <= 1)))
  }

  test("IVF top-k: high recall on clustered data at a fraction of the scan") {
    // deterministic clustered corpus: 8 archetype directions + small
    // perturbations (the driver's embeddings are isotropic random — no
    // cluster structure for ANY coarse quantizer to exploit, so IVF is
    // validated on data where inverted lists mean something)
    def base(c: Int, d: Int): Double = math.sin(c * 13.7 + d * 0.31)
    val rows = for (c <- 0 until 8; i <- 0 until 40) yield {
      val vec = (0 until 16).map(d =>
        (base(c, d) + 0.15 * math.sin(i * 7.3 + d * 1.9)).toFloat).toArray
      (c.toLong * 100 + i, vec, c)
    }
    val corpus = spark.createDataFrame(rows).toDF("vec_id", "embedding", "label")
    val queries = corpus.filter(col("vec_id") % 100 < 3) // 3 per cluster
    val exact = Similarity.bruteForceTopK(queries, corpus, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(queries, corpus, 3, nprobe = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF recall $recall (${(exact & ivf).size}/${exact.size})")
    // every query still gets k results (probed lists are non-empty)
    assert(ivf.size == exact.size)
    // plan shape: the centroid table reaches the probe as a broadcast
    // (never a shuffled join) — the property that keeps the probe
    // corpus-size-free at scale
    val frame = Similarity.ivfTopK(queries, corpus, 3, nprobe = 2)
    frame.collect()
    val bcasts = graft.std.Plans.collect(frame) {
      case b: org.apache.spark.sql.execution.joins
        .BroadcastNestedLoopJoinExec => b
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }.length
    assert(bcasts >= 1, s"expected the centroid broadcast, saw $bcasts")
  }

  test("native DotProductD is bit-identical to the HOF fold") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val both = vecs.select(
      Similarity.dot(col("v"), col("v")).as("native"),
      Similarity.dotFold(col("v"), col("v")).as("fold"))
    // bitwise equality, not approximate: same summation order
    assert(both.filter(col("native") =!= col("fold")).count() == 0)
    assert(both.count() == 500)
  }

  test("edge cases: empty text, zero vector, short docs") {
    import org.apache.spark.sql.functions.{col => c}
    // empty text: normText("") = "" → tokens [""] (documented quirk,
    // mirrored by DuckDB string_split('', ' ') = [''])
    val stats = TextAnalysis.tokenStats(Seq((1L, "")).toDF("doc_id", "text"))
      .head()
    assert(stats.getInt(stats.fieldIndex("n_tokens")) == 1)
    // doc shorter than the shingle width contributes its whole text
    val sh = Seq((1L, "ab cd")).toDF("doc_id", "text")
      .select(TextOps.shingles(TextOps.tokens(c("text")), 3).as("sh"))
      .head().getSeq[String](0)
    assert(sh == Seq("ab cd"))
    // zero vector: cosine guard yields null, not NaN
    val z = Seq((1L, Array(0.0, 0.0), Array(1.0, 2.0)))
      .toDF("id", "a", "b")
      .select(Similarity.cosine(c("a").cast("array<double>"),
        c("b").cast("array<double>")).as("cos"))
      .head()
    assert(z.isNullAt(0))
    // laneHash stays within 32 bits, non-negative
    val lanes = Seq((1L, "token")).toDF("id", "t")
      .select((0 until 8).map(i => Dedup.laneHash(i, c("t")).as(s"h$i")): _*)
      .head()
    (0 until 8).foreach { i =>
      val v = lanes.getLong(i)
      assert(v >= 0 && v < (1L << 32), s"lane $i out of range: $v")
    }
  }

  test("punct counting matches RE2 semantics on unicode/punct text") {
    // the synthetic corpus is pure ASCII words, so the oracle never
    // exercises [^\w\s]; these pin Java-regex counts to the values
    // DuckDB RE2 produces on the same strings (verified out-of-band):
    // both treat \w as ASCII [A-Za-z0-9_], so CJK chars count as punct
    val docs = Seq(
      (1L, "Hello, world! 你好."), // , ! 你 好 . → 5
      (2L, "a_b c-d"),            // - → 1 (_ is \w)
      (3L, "1+1=2")               // + = → 2
    ).toDF("doc_id", "text")
    val got = TextAnalysis.qualityScore(docs).collect()
      .map(r => r.getLong(0) ->
        math.round(r.getDouble(r.fieldIndex("punct_ratio")) *
          Seq("Hello, world! 你好.", "a_b c-d", "1+1=2")(r.getLong(0).toInt - 1).length))
      .toMap
    assert(got == Map(1L -> 5L, 2L -> 1L, 3L -> 2L))
  }

  test("train/test split is deterministic and roughly 80/10/10") {
    val docs = Tables.documents(spark, sfDir)
    val s1 = TextAnalysis.trainTestSplit(docs)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val s2 = TextAnalysis.trainTestSplit(docs)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1 == s2) // same assignment every run
    val total = s1.values.sum.toDouble
    assert(s1("train") / total > 0.7 && s1("train") / total < 0.9)
    assert(s1.keySet == Set("train", "valid", "test"))
  }

  test("stratified sample approximates requested per-language fractions") {
    val docs = Tables.documents(spark, sfDir)
    val sampled = TextAnalysis.stratifiedSample(docs, "lang",
      Map("en" -> 0.5, "fr" -> 1.0, "es" -> 0.0, "de" -> 1.0, "zh" -> 1.0))
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.getOrElse("es", 0L) == 0L)
    assert(byLang("fr") == full("fr") && byLang("zh") == full("zh"))
    val enFrac = byLang("en").toDouble / full("en")
    assert(enFrac > 0.3 && enFrac < 0.7, s"en fraction $enFrac")
  }

  test("approx corpus profile tracks exact counts within sketch error") {
    val docs = Tables.documents(spark, sfDir)
    val prof = TextAnalysis.corpusProfile(docs).head()
    val exactUniq = docs.select(TextOps.normText(col("text"))).distinct().count()
    val approxUniq = prof.getLong(prof.fieldIndex("approx_uniq_texts"))
    assert(math.abs(approxUniq - exactUniq).toDouble / exactUniq < 0.05,
      s"HLL $approxUniq vs exact $exactUniq")
    assert(prof.getLong(prof.fieldIndex("approx_langs")) == 5L)
    val pcts = prof.getSeq[Long](prof.fieldIndex("chars_percentiles"))
    assert(pcts.length == 3 && pcts(0) <= pcts(1) && pcts(1) <= pcts(2))
  }

  test("langid prefers the marker-richest language deterministically") {
    val docs = Seq(
      (1L, "the cat and the dog is a pet"),       // en markers
      (2L, "el la de los y es"),                  // es markers
      (3L, "xyz qwerty")                          // none → und
    ).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
      TextAnalysis.predictedLang(TextOps.tokens(col("text"))).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en"); assert(got(2L) == "es"); assert(got(3L) == "und")
  }

  test("containment flags a snippet inside its source where Jaccard cannot") {
    // doc 2 = strict prefix of doc 1: containment(2→1)=1.0, Jaccard low
    val shingles = Seq(
      (1L, (1 to 20).map(i => s"g$i")),
      (2L, (1 to 5).map(i => s"g$i"))).toDF("doc_id", "sh")
    val cands = Seq((1L, 2L)).toDF("id_a", "id_b")
    val row = Dedup.containmentPairs(cands, shingles, 0.6).collect().head
    assert(row.getDouble(row.fieldIndex("containment")) == 1.0)
    assert(row.getDouble(row.fieldIndex("cont_b")) == 1.0) // snippet side
    assert(row.getDouble(row.fieldIndex("cont_a")) == 0.25)
    // the same pair fails the symmetric check: J = 5/20
    assert(Dedup.verifiedNearDups(cands, shingles, 0.5).isEmpty)
  }

  test("incremental dedup statuses partition the batch correctly") {
    val out = ExtQueries.incrementalDedup(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    graft.std.Materialize.releaseAll()
    // each batch doc exactly once
    assert(out.map(_._1).distinct.length == out.length)
    val byStatus = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    // every injected exact copy (+300000) is flagged exact_dup
    val exactInjected = out.map(_._1).filter(_ >= 300000L).filter(_ < 400000L)
    assert(exactInjected.nonEmpty &&
      exactInjected.forall(byStatus("exact_dup").contains))
    // mutated copies (+400000): dropping every 11th token leaves
    // J ≈ 0.6, where 4×2 banding honestly misses ~15% of pairs —
    // demand a 70% floor; the misses are deterministic (same hashes)
    // so the DuckDB twin reproduces them exactly and the oracle stays
    // green while this asserts the operator actually catches the bulk
    val mutated = out.map(_._1).filter(_ >= 400000L)
    val caught = mutated.count(byStatus("near_dup").contains)
    assert(mutated.nonEmpty && caught.toDouble / mutated.length >= 0.7)
    // every mutated doc is caught, an (LSH-miss) 'new', or — when the
    // source doc had < 11 tokens so the mutation dropped nothing — a
    // correctly-detected exact_dup
    assert(mutated.forall(id => byStatus("near_dup").contains(id) ||
      byStatus("new").contains(id) || byStatus("exact_dup").contains(id)))
    // organic batch docs (no injected twin in existing) are 'new'
    assert(byStatus("new").nonEmpty)
  }

  test("bloom-prefiltered incremental classify ≡ exact classify") {
    val docs = Tables.documents(spark, sfDir)
    val existing = docs.filter(col("doc_id") % 3 === 0)
    // batch: fresh docs + exact copies of corpus docs (new ids) —
    // exercises both sides of the bloom cut (definitely-new skips the
    // digest join; maybe-seen goes through it)
    val batch = docs.filter(col("doc_id") % 3 === 1)
      .unionByName(existing.limit(50)
        .select((col("doc_id") + 700000).as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars")))
      // a NULL text must classify identically on both paths (the bloom
      // probe is three-valued: un-coalesced it drops the row entirely)
      .unionByName(spark.range(1).select(lit(999999L).as("doc_id"),
        lit(null).cast("string").as("text"),
        lit(null).cast("string").as("lang"),
        lit(null).cast("string").as("source"),
        lit(null).cast("long").as("n_chars")))
    val state = Dedup.corpusState(existing)
    val exact = Dedup.classifyIncrement(state, batch)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // small m forces real false positives through the maybe-seen path
    val m = 1 << 10
    val bloom = Dedup.corpusDigestBloom(state, m = m)
    val viaBloom = Dedup.classifyIncrementBloom(state, bloom, batch, m = m)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    graft.std.Materialize.releaseAll()
    assert(viaBloom == exact,
      "bloom pre-filter changed classification results")
    assert(exact.values.exists(_ == "exact_dup") &&
      exact.values.exists(_ == "new")) // both paths actually exercised
  }

  test("stratified content sample respects per-stratum rates and is stable") {
    val docs = Tables.documents(spark, sfDir)
    val out = TextAnalysis.stratifiedContentSample(
      docs, Map("en" -> 20), defaultPct = 60).collect()
    assert(out.forall { r =>
      val cap = if (r.getString(1) == "en") 20 else 60
      r.getLong(2) < cap
    })
    // re-running samples the identical set (content-hash, no rand())
    val again = TextAnalysis.stratifiedContentSample(
      docs, Map("en" -> 20), defaultPct = 60).collect()
    assert(out.map(_.getLong(0)).sorted.sameElements(
      again.map(_.getLong(0)).sorted))
    // and the en stratum is actually downsampled below the default
    val nEn = out.count(_.getString(1) == "en")
    val nAll = docs.count()
    assert(nEn < out.length - nEn || nAll == 0)
  }

  test("domain quota keeps at most N per source, best quality first") {
    val out = ExtQueries.domainQuota(spark, sfDir).collect()
    val bySource = out.groupBy(_.getString(0))
    assert(bySource.values.forall(_.length <= 10))
    bySource.values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(3))
      // ranks dense from 1 and quality non-increasing along them
      assert(sorted.map(_.getLong(3)).toSeq == (1L to sorted.length).toSeq)
      val qs = sorted.map(_.getDouble(2)).toSeq
      assert(qs.zip(qs.tail).forall { case (a, b) => a >= b })
    }
    // audit column: displaces_better marks kept rows whose quality is
    // below the best doc the quota dropped ANYWHERE — replay it from
    // the full corpus: per source the best dropped doc is the 11th by
    // (quality desc, id asc)
    val all = TextAnalysis.domainQuota(
      Tables.documents(spark, sfDir), quota = 10).collect()
    val full = Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"),
        TextAnalysis.qualityScoreExpr(col("text")).as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val maxDropped = full.groupBy(_._1).values.flatMap { rows =>
      rows.sortBy(r => (-r._3, r._2)).drop(10).take(1).map(_._3)
    }.maxOption
    all.foreach { r =>
      val expect = maxDropped.exists(m => r.getDouble(2) < m)
      assert(r.getBoolean(4) == expect,
        s"displaces_better replay mismatch: $r vs maxDropped=$maxDropped")
    }
    // and at quota 10 on this corpus the audit actually fires somewhere
    assert(all.exists(_.getBoolean(4)),
      "fixture should contain at least one quota-protected inversion")
  }

  test("train order is a dense per-shard permutation that varies by epoch") {
    val docs = Tables.documents(spark, sfDir)
    val n = docs.count()
    val out = ExtQueries.trainOrder(spark, sfDir).collect()
    assert(out.length == 2 * n)
    // each (epoch, doc) exactly once
    assert(out.map(r => (r.getInt(0), r.getLong(1))).distinct.length == out.length)
    // positions dense 1..count within every (epoch, shard)
    out.groupBy(r => (r.getInt(0), r.getLong(2))).values.foreach { rows =>
      assert(rows.map(_.getLong(3)).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // the two epochs order the same docs differently (salted hash)
    def orderOf(e: Int) = out.filter(_.getInt(0) == e)
      .sortBy(r => (r.getLong(2), r.getLong(3))).map(_.getLong(1)).toSeq
    assert(orderOf(0) != orderOf(1))
  }

  test("stratified sample is monotone in rate: lower rate ⊆ higher rate") {
    // content-hash bucketing means raising a rate only ADDS documents —
    // rand()-based sampling has no such property, and it is what makes
    // sample sizes tunable without churning the already-selected set
    val docs = Tables.documents(spark, sfDir)
    def ids(en: Int, rest: Int): Set[Long] =
      TextAnalysis.stratifiedContentSample(docs, Map("en" -> en), rest)
        .collect().map(_.getLong(0)).toSet
    val small = ids(10, 30)
    val big = ids(40, 80)
    assert(small.subsetOf(big))
    assert(small.size < big.size)
  }

  test("contamination split quarantines exactly the over-threshold docs") {
    val out = ExtQueries.contaminationSplit(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    graft.std.Materialize.releaseAll()
    assert(out.nonEmpty)
    assert(out.values.toSet.subsetOf(
      Set("train", "valid", "test", "quarantine")))
    // no benchmark doc (doc_id % 31 == 0) ever receives a split
    assert(out.keys.forall(_ % 31 != 0))
  }

  test("int8 quantization bounds codes and reconstruction error") {
    val vecs = Tables.embeddings(spark, sfDir)
    val q = Similarity.quantizeInt8(vecs)
    val joined = q.join(
      vecs.select(col("vec_id"),
        posexplode(col("embedding").cast("array<double>"))
          .as(Seq("dim_idx", "x"))),
      Seq("vec_id", "dim_idx"))
    // scale is emitted rounded to 6dp, so reconstruction via the
    // emitted column carries up to 127·5e-7 extra absolute error on
    // top of the half-step quantization bound
    val bad = joined.filter(
      col("q") > 127 || col("q") < -127 ||
        abs(col("q") * col("scale") - col("x")) > col("scale") * 0.51 + 1e-4)
    assert(bad.isEmpty, s"out-of-contract codes: ${bad.count()}")
    // dim coverage: every (vec, dim) appears exactly once
    assert(q.count() == joined.count())
  }

  test("boilerplate detection flags shared headers, not organic text") {
    // bodies share NO tokens across docs, so the only recurring
    // shingles are the header's interior ones (bridge shingles into
    // the body differ per doc and stay unflagged)
    val docs = (1L to 12L).map { i =>
      val body = s"b${i}x c${i}y d${i}z e${i}w f${i}v"
      val text = if (i <= 8) s"site header all rights reserved $body" else body
      (i, "siteA", text)
    }.toDF("doc_id", "source", "text")
    val flagged = TextAnalysis.boilerplateNgrams(docs, minDocs = 5,
      minFrac = 0.2).collect()
    // every flagged shingle is from the 8-doc header run
    assert(flagged.nonEmpty)
    assert(flagged.forall(_.getLong(2) == 8L))
    assert(flagged.forall(r => Seq("site header all", "header all rights",
      "all rights reserved").contains(r.getString(1))))
  }

  test("best-keeper selection keeps exactly the top-quality doc per cluster") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = ExtQueries.bestKeeperClusters(spark, sfDir).collect()
    graft.std.Materialize.releaseAll()
    val byCluster = rows.groupBy(_.getAs[Long]("cluster_rep"))
    // exactly one best keeper per cluster, and it attains the cluster's
    // maximum quality (doc_id tiebreak -> lowest id among the maxima)
    byCluster.foreach { case (rep, members) =>
      val best = members.filter(_.getAs[Boolean]("is_best_keeper"))
      assert(best.length == 1, s"cluster $rep: ${best.length} best keepers")
      val maxQ = members.map(_.getAs[Double]("quality_score")).max
      val winner = best.head
      assert(winner.getAs[Double]("quality_score") == maxQ)
      assert(members.filter(_.getAs[Double]("quality_score") == maxQ)
        .map(_.getAs[Long]("doc_id")).min == winner.getAs[Long]("doc_id"))
    }
    // every corpus doc is labeled (clusters partition the corpus)
    assert(rows.length == byCluster.values.map(_.length).sum)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
  }

  test("snapshot diff labels added/removed/changed/unchanged per doc") {
    val v1 = Seq(
      (1L, "alpha beta"), (2L, "gamma"), (3L, "delta epsilon"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val v2 = Seq(
      (1L, "alpha beta"),          // unchanged
      (2L, "gamma revised"),       // changed
      (4L, null.asInstanceOf[String]), // null ≡ null → unchanged
      (5L, "brand new")            // added; 3 removed
    ).toDF("doc_id", "text")
    val out = Dedup.snapshotDiff(v1, v2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "unchanged", 5L -> "added"))
    // whitespace/case normalization applies before digesting
    val norm = Dedup.snapshotDiff(
      Seq((1L, "Alpha  Beta ")).toDF("doc_id", "text"),
      Seq((1L, "alpha beta")).toDF("doc_id", "text")).collect()
    assert(norm.head.getString(1) == "unchanged")
    // digests travel with the verdict (the audit artifact)
    val row = Dedup.snapshotDiff(v1, v2)
      .filter(col("doc_id") === 2L).head()
    assert(row.getString(2) != row.getString(3) &&
      row.getString(2).length == 32)
  }

  test("diff severity separates light revision from a rewrite") {
    val base = "one two three four five six seven eight nine ten"
    val v1 = Seq(
      (1L, base), (2L, base), (3L, base)).toDF("doc_id", "text")
    val v2 = Seq(
      (1L, base),                      // unchanged: not reported
      (2L, base + " eleven"),          // one appended token: revised
      (3L, "alpha beta gamma delta")   // full rewrite
    ).toDF("doc_id", "text")
    val out = Dedup.diffSeverity(v1, v2).collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getString(2)))).toMap
    assert(out.keySet == Set(2L, 3L)) // only changed docs scored
    assert(out(2L)._2 == "revised" && out(2L)._1 > 0.8)
    assert(out(3L)._2 == "rewritten" && out(3L)._1 == 0.0)
    // severity threshold reads the ROUNDED jaccard (oracle parity)
    val j2 = out(2L)._1
    assert(j2 == math.rint(j2 * 1e6) / 1e6)
  }
}
