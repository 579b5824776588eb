package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Empty-input sweep over the round-10 operators: an empty partition
  * or a filtered-to-nothing snapshot is routine at 100 TB, and no
  * operator may turn it into a crash (the PageRank U/0 seed was a live
  * instance — pinned in GraphSpec).
  */
class EmptyInputSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def emptyDocs: DataFrame =
    Seq.empty[(Long, String, String)].toDF("doc_id", "source", "text")

  test("diagnostics: key skew, k-anonymity, join estimate") {
    val kv = Seq.empty[(String, Long)].toDF("k", "v")
    assert(Validation.keySkew(kv, "k").collect().isEmpty)
    assert(Validation.kAnonymity(kv, Seq("k"), 5).collect().isEmpty)
    val r = Validation.joinSizeEstimate(kv, kv, "v", "v").head()
    assert(r.getAs[Long]("n_probe") == 0 &&
      r.getAs[Long]("join_exact") == 0)
  }

  test("linkage, url dedup, weighted sample") {
    val probes = Seq.empty[(Long, String)].toDF("id", "name")
    val cat = Seq(("red bolt")).map(Tuple1(_)).toDF("name")
    assert(Linkage.fuzzyBestMatch(probes, cat, "id", "name", "name")
      .collect().isEmpty)
    // and an empty CATALOG: probes all report unmatched, no crash
    val p2 = Seq((1L, "x")).toDF("id", "name")
    val out = Linkage.fuzzyBestMatch(p2, probes.select(col("name")),
      "id", "name", "name").collect()
    assert(out.length == 1 && out.head.isNullAt(2))
    val urls = Seq.empty[(Long, String)].toDF("doc_id", "url")
    assert(Web.urlDedup(urls).collect().isEmpty)
    val w = Seq.empty[(Long, Double)].toDF("id", "w")
    assert(graft.std.Sampling.weightedSample(w, "id", "w", 5)
      .collect().isEmpty)
  }

  test("feature prep and text stats") {
    val v = Seq.empty[(String, java.lang.Double)].toDF("g", "v")
    assert(Features.equalFreqBins(v, "v", 4).collect().isEmpty)
    assert(Features.zscore(v, "g", "v").collect().isEmpty)
    assert(Features.robustZscore(v, "g", "v").collect().isEmpty)
    assert(TextAnalysis.sourceEntropy(emptyDocs).collect().isEmpty)
    assert(TextAnalysis.compressionStats(
      emptyDocs.select(col("doc_id"), col("text"))).collect().isEmpty)
  }

  test("round-14 operators survive empty inputs") {
    val edges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val seeds = Seq.empty[Tuple1[Long]].toDF("seed")
    assert(Graph.betweennessCentrality(edges, seeds).collect().isEmpty)
    assert(Graph.modularity(edges,
      Seq.empty[(Long, Long)].toDF("node", "community"))
      .collect().isEmpty)
    assert(Graph.modularityRefine(edges,
      Seq.empty[(Long, Long)].toDF("node", "community"))
      .collect().isEmpty)
    assert(Graph.kTruss(edges).collect().isEmpty)
    assert(Graph.assortativity(edges).collect()
      .forall(_.isNullAt(1)), "no edges -> NULL r, not a crash")
    assert(Graph.kCore(edges).collect().isEmpty)
    assert(Graph.pageRankConvergence(edges).collect().isEmpty)
    val tEdges = Seq.empty[(Long, Long, java.sql.Date)]
      .toDF("src", "dst", "etime")
    assert(Graph.temporalReach(tEdges, seeds).collect().isEmpty)
    val events = Seq.empty[(String, java.sql.Timestamp, Double,
        Long, String)]
      .toDF("event_type", "ts", "value", "user_id", "event_id")
    assert(Timeseries.autocorrelation(events).collect().isEmpty)
    assert(Timeseries.stationaryMix(
      events.withColumn("event_id", col("event_id").cast("string")))
      .collect().isEmpty)
    assert(TextAnalysis.sourceShingleDiversity(emptyDocs)
      .collect().isEmpty)
    val media = Seq.empty[(Long, Array[Byte])].toDF("doc_id", "payload")
    assert(Media.gradientDups(media).collect().isEmpty)
    val ab = Seq.empty[(java.lang.Long, java.lang.Double)]
      .toDF("a", "b")
    val v10 = Validation.missingnessAudit(ab, Seq(("a", "b"))).head()
    assert(v10.getLong(2) == 0L && v10.isNullAt(8),
      "zero rows -> defined counters, NULL verdicts")
    val vecs = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val cb = Seq((0, 0L, 0.0)).toDF("_cw", "_dim", "_c")
    assert(Similarity.indexAssign(vecs, cb, cb, 1).collect().isEmpty)
  }

  test("round-15 operators survive empty inputs") {
    val edges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val seeds = Seq.empty[Tuple1[Long]].toDF("seed")
    assert(Graph.randomWalks(edges, seeds).collect().isEmpty)
    assert(Graph.linkPrediction(edges).collect().isEmpty)
    assert(Graph.stronglyConnected(edges).collect().isEmpty)
    assert(Graph.stronglyConnectedPeel(edges).collect().isEmpty)
    assert(Graph.triadCensus(edges).collect().isEmpty)
    val noWalks = Seq.empty[(Long, Long, Long)]
      .toDF("walk_id", "step", "node_id")
    assert(Graph.skipGramPairs(noWalks).collect().isEmpty)
    assert(Graph.linkPredictionEval(edges).collect().isEmpty)
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.tfidfTopTerms(noDocs).collect().isEmpty)
    val noSrcDocs = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "source", "text")
    assert(TextAnalysis.sourceOverlapMatrix(noSrcDocs).collect().isEmpty)
    assert(TextAnalysis.readability(noDocs).collect().isEmpty)
    assert(TextAnalysis.spanDedup(noDocs).collect().isEmpty)
    val noClusters = Seq.empty[(Long, Long)].toDF("doc_id", "cluster_rep")
    assert(Dedup.leakageSafeSplit(noClusters).collect().isEmpty)
    val noVecs = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    // an empty corpus still emits the (0, 0) antihub row — by the
    // zero-row contract, never a crash
    val hub = Similarity.hubness(noVecs, noVecs, 3).collect()
    assert(hub.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 0L)))
    // walks from seeds with NO edges: step 0 only (the seed itself)
    val oneSeed = Seq(Tuple1(7L)).toDF("seed")
    val w = Graph.randomWalks(edges, oneSeed).collect()
    assert(w.length == 1 && w.head.getLong(1) == 0L)
    val events = Seq.empty[(String, java.sql.Timestamp, Double)]
      .toDF("event_type", "ts", "value")
    assert(Timeseries.holtTrend(events).collect().isEmpty)
    val vecs = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding")
    assert(Similarity.silhouette(vecs, k = 2, iters = 1)
      .collect().isEmpty)
    assert(Similarity.mmrRerank(vecs, vecs, k = 1, n = 1)
      .collect().isEmpty)
    graft.std.Materialize.releaseAll()
  }

  test("media near-dups, bloom join, rollup with an empty delta") {
    val media = Seq.empty[(Long, Array[Byte])].toDF("doc_id", "payload")
    assert(Media.nearDupPairs(media).collect().isEmpty)
    val probe = Seq((1L, "x")).toDF("k", "p")
    val build = Seq.empty[(Long, String)].toDF("bk", "t")
    assert(graft.std.BloomJoin.bloomPrunedJoin(probe, build, "k", "bk")
      .collect().isEmpty)
    // merging an EMPTY delta must be the identity on the state
    val hist = Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v")
    val state = Rollup.additiveRollup(hist, Seq("k"), Seq("v"))
    val merged = Rollup.mergeAdditive(state,
      Rollup.additiveRollup(
        Seq.empty[(String, Double)].toDF("k", "v").filter(lit(true)),
        Seq("k"), Seq("v")),
      Seq("k"), Seq("v"))
    assert(Rollup.report(merged, Seq("k"), Seq("v")).collect()
      .map(_.toSeq).toSet ==
      Rollup.report(state, Seq("k"), Seq("v")).collect()
        .map(_.toSeq).toSet)
  }

  test("round-11 operators survive empty inputs") {
    val pts = Seq.empty[(Long, Double, Int)].toDF("id", "price", "size")
    assert(Skyline.paretoFront(pts, "price", "size", m => floor(m))
      .collect().isEmpty)
    // empty graph, live seeds: zeros at every hop, never a crash
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val reach = Graph.kHopReach(noEdges, Seq(1L).toDF("seed"), 2)
      .collect()
    assert(reach.length == 2 && reach.forall(_.getLong(2) == 0L))
    val noOrders = Seq.empty[(Long, java.sql.Timestamp, Double)]
      .toDF("c", "d", "amt")
    assert(Features.rfmSegments(noOrders, "c", "d", "amt")
      .collect().isEmpty)
    val noEvents = Seq.empty[(Long, String)]
      .toDF("user_id", "event_type")
    val ab = Experiment.abTest(noEvents, "user_id", "event_type",
      Seq("purchase"), u => (u % 2).cast("int")).collect()
    assert(ab.length == 1 && ab(0).getLong(1) == 0L &&
      ab(0).isNullAt(9), "empty experiment reports, z undefined")
    val noVecs = Seq.empty[(Long, Array[Double], Int)]
      .toDF("vec_id", "embedding", "label")
    assert(Similarity.bucketPurity(noVecs, 4).collect().isEmpty)
    assert(Similarity.pqReport(noVecs).collect().isEmpty)
    assert(TextAnalysis.perplexityBuckets(
      Seq.empty[(Long, String, String)].toDF("doc_id", "source", "text"))
      .collect().isEmpty)
    val noVals = Seq.empty[Tuple1[java.lang.Double]].toDF("v")
    val ben = Validation.benford(noVals, "v").collect()
    assert(ben.length == 9 && ben.forall(_.getLong(1) == 0L),
      "the digit scaffold reports zeros, shares go null")
    val noDeltas = Seq.empty[(Long, Long, Double)]
      .toDF("k", "seq", "delta")
    assert(Timeseries.clampedBalance(noDeltas, "k", Seq("seq"), "delta")
      .collect().isEmpty)
    val noIv = Seq.empty[(Long, java.sql.Timestamp,
      java.sql.Timestamp, Long)].toDF("k", "s", "e", "id")
    assert(Timeseries.intervalCoverage(noIv, "k", "s", "e", "id")
      .collect().isEmpty)
    assert(TextAnalysis.zipfFit(
      Seq.empty[(Long, String, String)].toDF("doc_id", "lang", "text"))
      .collect().isEmpty)
    val noCells = Seq.empty[(Long, Array[Double], String, Int)]
      .toDF("vec_id", "embedding", "cell", "label")
    assert(Similarity.ivfPqTopK(noCells, noCells, 3).collect().isEmpty)
    assert(TextAnalysis.epochAllocation(
      Seq.empty[(Long, String, String)].toDF("doc_id", "source", "text"),
      1000L).collect().isEmpty)
    val noEv = Seq.empty[(Long, java.sql.Timestamp, String, Long)]
      .toDF("user_id", "ts", "event_type", "event_id")
    assert(Timeseries.transitionMatrix(noEv).collect().isEmpty)
    assert(graft.streaming.StreamingOps.transitionPairs(noEv)
      .collect().isEmpty)
    val noTexts = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val cc = TextAnalysis.ccAudit(noTexts).collect()
    assert(cc.isEmpty)
  }
}
