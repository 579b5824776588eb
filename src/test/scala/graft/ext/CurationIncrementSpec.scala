package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** pipeline_curation_increment: the incremental composite PROVEN
  * equivalent to a full rebuild on the v2 crawl fixture (r18 verdict
  * #3). The oracle gates the incremental algorithm's VALUES; this spec
  * gates the claim that matters — that consuming the standing corpus's
  * materialized state (span index, shingle/signature keys, clusters,
  * shipped train order) reproduces what re-running the whole pipeline
  * over standing ∪ increment would produce, at O(increment) cost:
  *
  *  - increment rows match the full rebuild in (epoch, doc_id, shard,
  *    cluster_rep) and in within-(epoch, shard) relative order;
  *  - standing rows are FROZEN: the full rebuild's standing output is
  *    identical to the standing-only pipeline's (the fixture's
  *    increment introduces no new ≥8-token verbatim run into standing
  *    text, so even a rebuild would not touch it);
  *  - shard_pos follows the append contract: standing per-shard fill +
  *    dense hash-ordered rank among appended docs (a rebuild would
  *    renumber rows a trainer already consumed — the one deliberate
  *    divergence, pinned as the exact formula);
  *  - the attach lane actually fires on the fixture (cross-verified
  *    pairs exist; attached docs are dups and reach NEITHER output);
  *  - re-running the increment rebuilds NO standing tier (memo
  *    counters) and its final plan reads checkpoints, not explodes.
  */
class CurationIncrementSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val docs =
    graft.sources.Tables.documents(spark, sfDir)
  private lazy val standingRaw = ExtQueries.nearDupCorpus(docs)
  private lazy val incRaw = ExtQueries.curationIncrementCorpus(docs)
  private lazy val full = ExtQueries
    .curationTrainPipelineFrom(standingRaw.unionByName(incRaw))
    .localCheckpoint(true)
  private lazy val standingOnly = ExtQueries
    .curationTrainPipelineFrom(standingRaw).localCheckpoint(true)
  private lazy val incr = ExtQueries
    .curationTrainPipelineIncrement(spark, sfDir).localCheckpoint(true)
  private lazy val fullInc = full.filter(col("doc_id") >= ExtQueries.IncIdFloor)

  test("increment rows ≡ full rebuild: ids, shard, cluster_rep") {
    assert(incr.count() > 0, "fixture must produce appended train rows")
    val a = fullInc.select("epoch", "doc_id", "shard", "cluster_rep")
    val b = incr.select("epoch", "doc_id", "shard", "cluster_rep")
    assert(a.except(b).isEmpty && b.except(a).isEmpty,
      "incremental (epoch, doc_id, shard, cluster_rep) must equal the " +
        "full rebuild's for increment ids")
  }

  test("standing rows are frozen: full rebuild ≡ standing-only") {
    val fs = full.filter(col("doc_id") < ExtQueries.IncIdFloor)
      .select("epoch", "doc_id", "shard", "cluster_rep")
    val ss = standingOnly.select("epoch", "doc_id", "shard", "cluster_rep")
    assert(fs.except(ss).isEmpty && ss.except(fs).isEmpty,
      "the increment must not change any standing row (sans the " +
        "renumbered shard_pos): the fixture's mutations cap shared " +
        "runs at 6 < 8 tokens, so standing span counts are untouched")
  }

  test("within-shard relative order matches the full rebuild") {
    val w = Window.partitionBy("epoch", "shard").orderBy("shard_pos")
    val rF = fullInc.withColumn("r", row_number().over(w))
      .select("epoch", "doc_id", "shard", "r")
    val rI = incr.withColumn("r", row_number().over(w))
      .select("epoch", "doc_id", "shard", "r")
    assert(rF.except(rI).isEmpty && rI.except(rF).isEmpty,
      "appended docs must keep the rebuild's hash order within shards")
  }

  test("shard_pos appends after the standing per-shard fill, densely") {
    val sc = standingOnly.groupBy("epoch", "shard")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("epoch", "shard").orderBy("shard_pos")
    val viol = incr.join(sc, Seq("epoch", "shard"), "left")
      .withColumn("r", row_number().over(w))
      .filter(col("shard_pos") =!= coalesce(col("n"), lit(0L)) + col("r"))
    assert(viol.isEmpty,
      "shard_pos must be standing fill + dense appended rank")
  }

  test("the attach lane fires: cross dups verified and dropped by both") {
    // replay the attach stage through the public kernels: standing
    // cleaned corpus vs increment cleaned corpus, cross-LSH + verify
    val promo = TextAnalysis.SpanPromoText
    def inject(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
        when(col("doc_id") % 3 === 0,
          concat_ws(" ", col("text"), lit(promo)))
          .otherwise(col("text")).as("text"))
    val stdClean = TextAnalysis.spanDedup(inject(standingRaw))
      .select(col("doc_id"), col("clean_text").as("text"))
      .filter(col("text") =!= "").localCheckpoint(true)
    val incClean = TextAnalysis.spanDedupIncrement(inject(incRaw),
        TextAnalysis.spanIndex(inject(standingRaw)))
      .select(col("doc_id"), col("clean_text").as("text"))
      .filter(col("text") =!= "").localCheckpoint(true)
    val shE = Dedup.shingleFrame(stdClean).localCheckpoint(true)
    val shB = Dedup.shingleFrame(incClean).localCheckpoint(true)
    val attached = Dedup.verifiedCrossNearDups(
        Dedup.lshCrossCandidates(Dedup.minHashSignatures(shB, 8),
          Dedup.minHashSignatures(shE, 8), 8, 4), shB, shE, 0.5)
      .select("id_a").distinct().collect().map(_.getLong(0)).toSet
    assert(attached.nonEmpty,
      "fixture must produce verified increment→standing attachments")
    // an attached doc is a near-dup of standing content: it must be
    // dropped (non-keeper) by BOTH the incremental path and the rebuild
    val inIncr = incr.select("doc_id").collect().map(_.getLong(0)).toSet
    val inFull = fullInc.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(attached.intersect(inIncr).isEmpty,
      s"attached dups leaked into the incremental train order")
    assert(attached.intersect(inFull).isEmpty,
      s"attached dups leaked into the full rebuild's train order")
  }

  // ── the NEAR-DUP and CDC policies (r19 verdict gap #1: the user whose
  // chrome carries per-copy tracking tokens — which only t79 strips —
  // could not run their chosen policy incrementally; same for t80's
  // budget tier). Each policy's incremental run must equal the full
  // rebuild under THAT policy's chrome + span pass, with the standing
  // corpus frozen and the shard append contract intact.
  private val policies = Seq(
    ("neardup", "tweaked",
      () => ExtQueries.curationTrainPipelineIncrementNearDup(spark, sfDir)),
    ("cdc", "promo2",
      () => ExtQueries.curationTrainPipelineIncrementCdc(spark, sfDir)))

  private val polFrames = scala.collection.mutable.Map
    .empty[String, (org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)]

  private def framesFor(span: String, chrome: String,
                        incrFn: () => org.apache.spark.sql.DataFrame) =
    polFrames.getOrElseUpdate(span, {
      val f = ExtQueries.curationTrainPipelineFrom(
        standingRaw.unionByName(incRaw), chrome, span).localCheckpoint(true)
      val s = ExtQueries.curationTrainPipelineFrom(
        standingRaw, chrome, span).localCheckpoint(true)
      val i = incrFn().localCheckpoint(true)
      (f, s, i)
    })

  for ((span, chrome, incrFn) <- policies) {
    test(s"[$span] increment rows ≡ full rebuild: ids, shard, rep") {
      val (f, _, i) = framesFor(span, chrome, incrFn)
      assert(i.count() > 0, "fixture must produce appended train rows")
      val a = f.filter(col("doc_id") >= ExtQueries.IncIdFloor)
        .select("epoch", "doc_id", "shard", "cluster_rep")
      val b = i.select("epoch", "doc_id", "shard", "cluster_rep")
      assert(a.except(b).isEmpty && b.except(a).isEmpty,
        s"[$span] incremental (epoch, doc_id, shard, cluster_rep) must " +
          "equal the full rebuild's for increment ids")
    }

    if (span != "neardup")
      test(s"[$span] standing rows are frozen: full rebuild ≡ standing-only") {
        val (f, s, _) = framesFor(span, chrome, incrFn)
        val fs = f.filter(col("doc_id") < ExtQueries.IncIdFloor)
          .select("epoch", "doc_id", "shard", "cluster_rep")
        val ss = s.select("epoch", "doc_id", "shard", "cluster_rep")
        assert(fs.except(ss).isEmpty && ss.except(fs).isEmpty,
          s"[$span] the increment must not change any standing row: the " +
            "fixture's mutations cannot add a verbatim ≥8-token run " +
            "(deletion lattice caps runs at 6) or a whole ≥8-token " +
            "content-defined segment to standing counts")
      }
    else
      test("[neardup] standing freeze is CONTRACTUAL: rebuild divergence " +
        "is real, quantified, and confined to span-cleaning") {
        // The 1-mismatch tier has no structural freeze argument: ANY
        // increment window within one substitution of a standing window
        // adds near-miss evidence against standing text, by the tier's
        // very definition — and at this corpus's ~40-word vocabulary the
        // v2 deletion lattice produces such windows in quantity. So the
        // production contract is freeze-BY-CONSTRUCTION (shipped standing
        // artifacts are memoized state, never recomputed — the memo-
        // counter test pins it), and this test pins the divergence
        // instead of denying it: the rebuild re-cleans a NONEMPTY set of
        // standing docs (if it were empty, the exact-style freeze
        // assertion above would be the honest one), yet the increment
        // rows' equivalence (previous test) survives it.
        val standingInjected = ExtQueries.curationCleanedCorpus(
          standingRaw, chrome, span)
        val unionStanding = ExtQueries.curationCleanedCorpus(
          standingRaw.unionByName(incRaw), chrome, span)
          .filter(col("doc_id") < ExtQueries.IncIdFloor)
        val recleaned = standingInjected.as("a")
          .join(unionStanding.as("b"), Seq("doc_id"))
          .filter(col("a.text") =!= col("b.text"))
        val n = recleaned.count()
        assert(n > 0,
          "the fixture must exhibit the tier's corpus-sensitivity — a " +
            "zero here means the structural freeze holds and the exact-" +
            "style assertion should replace this one")
        // shipped-artifact immutability: the incremental path's standing
        // train order is the standing-only pipeline's, by construction
        val (_, s, i) = framesFor(span, chrome, incrFn)
        val overlap = i.select("epoch", "doc_id")
          .join(s.select("epoch", "doc_id"), Seq("epoch", "doc_id"))
        assert(overlap.isEmpty,
          "appended rows must never collide with shipped standing rows")
      }

    test(s"[$span] shard_pos appends after the standing fill, densely") {
      val (_, s, i) = framesFor(span, chrome, incrFn)
      val sc = s.groupBy("epoch", "shard").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("epoch", "shard").orderBy("shard_pos")
      val viol = i.join(sc, Seq("epoch", "shard"), "left")
        .withColumn("r", row_number().over(w))
        .filter(col("shard_pos") =!= coalesce(col("n"), lit(0L)) + col("r"))
      assert(viol.isEmpty,
        s"[$span] shard_pos must be standing fill + dense appended rank")
    }

    test(s"[$span] within-shard relative order matches the full rebuild") {
      val (f, _, i) = framesFor(span, chrome, incrFn)
      val w = Window.partitionBy("epoch", "shard").orderBy("shard_pos")
      val rF = f.filter(col("doc_id") >= ExtQueries.IncIdFloor)
        .withColumn("r", row_number().over(w))
        .select("epoch", "doc_id", "shard", "r")
      val rI = i.withColumn("r", row_number().over(w))
        .select("epoch", "doc_id", "shard", "r")
      assert(rF.except(rI).isEmpty && rI.except(rF).isEmpty,
        s"[$span] appended docs must keep the rebuild's hash order")
    }
  }

  // ── day 2: the v3 crawl against the standing state ADVANCED by the
  // shipped v2 crawl — the composability question (does the
  // materialized state survive REPEATED application?). Gated for the
  // structurally-frozen tiers (exact, cdc); the neardup tier's freeze
  // is contractual already at day 1, so its day-2 rebuild-equivalence
  // claim does not exist to test.
  private lazy val incRaw2 = ExtQueries.curationIncrementCorpusV3(docs)

  private val day2Policies = Seq(
    ("exact", "promo",
      () => ExtQueries.curationTrainPipelineIncrement2(spark, sfDir)),
    ("cdc", "promo2",
      () => ExtQueries.curationTrainPipelineIncrement2Cdc(spark, sfDir)))

  private val day2Frames = scala.collection.mutable.Map
    .empty[String, (org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)]

  private def day2For(span: String, chrome: String,
                      fn: () => org.apache.spark.sql.DataFrame) =
    day2Frames.getOrElseUpdate(span, {
      val all3 = standingRaw.unionByName(incRaw).unionByName(incRaw2)
      val f = ExtQueries.curationTrainPipelineFrom(all3, chrome, span)
        .localCheckpoint(true)
      val upTo2 = ExtQueries.curationTrainPipelineFrom(
        standingRaw.unionByName(incRaw), chrome, span).localCheckpoint(true)
      val i2 = fn().localCheckpoint(true)
      (f, upTo2, i2)
    })

  for ((span, chrome, fn) <- day2Policies) {
    test(s"[day2 $span] v3 rows ≡ full 3-corpus rebuild") {
      val (f, _, i2) = day2For(span, chrome, fn)
      assert(i2.count() > 0, "day-2 fixture must produce appended rows")
      val a = f.filter(col("doc_id") >= ExtQueries.Inc2IdFloor)
        .select("epoch", "doc_id", "shard", "cluster_rep")
      val b = i2.select("epoch", "doc_id", "shard", "cluster_rep")
      assert(a.except(b).isEmpty && b.except(a).isEmpty,
        s"[day2 $span] the v3 crawl against the ADVANCED state must " +
          "equal a rebuild over standing ∪ v2 ∪ v3 for v3 ids")
    }

    test(s"[day2 $span] day-0+1 rows are frozen under the 3-corpus " +
      "rebuild") {
      val (f, upTo2, _) = day2For(span, chrome, fn)
      val fs = f.filter(col("doc_id") < ExtQueries.Inc2IdFloor)
        .select("epoch", "doc_id", "shard", "cluster_rep")
      val ss = upTo2.select("epoch", "doc_id", "shard", "cluster_rep")
      assert(fs.except(ss).isEmpty && ss.except(fs).isEmpty,
        s"[day2 $span] v3 must not change any standing-or-v2 row")
    }

    test(s"[day2 $span] shard_pos appends after the ADVANCED fill") {
      val (_, upTo2, i2) = day2For(span, chrome, fn)
      val sc = upTo2.groupBy("epoch", "shard").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("epoch", "shard").orderBy("shard_pos")
      val viol = i2.join(sc, Seq("epoch", "shard"), "left")
        .withColumn("r", row_number().over(w))
        .filter(col("shard_pos") =!= coalesce(col("n"), lit(0L)) + col("r"))
      assert(viol.isEmpty,
        s"[day2 $span] shard_pos must be (standing + day-1) fill + " +
          "dense appended rank")
    }
  }

  test("[day2 neardup] tier-independent invariants: advanced-fill " +
    "append + no collision with shipped rows") {
    // the neardup tier's freeze is contractual already at day 1, so
    // the rebuild-equivalence claim the exact/cdc day-2 tests prove
    // does not exist here — but the lifecycle invariants hold for ANY
    // tier: day-2 shard_pos appends densely after the (standing +
    // day-1) fill, and appended rows never collide with shipped ones.
    val s = ExtQueries.curationTrainPipelineFrom(
      standingRaw, "tweaked", "neardup").localCheckpoint(true)
    val d1 = ExtQueries.curationTrainPipelineIncrementNearDup(spark, sfDir)
      .localCheckpoint(true)
    val i2 = ExtQueries.curationTrainPipelineIncrement2NearDup(spark, sfDir)
      .localCheckpoint(true)
    assert(i2.count() > 0, "day-2 neardup must produce appended rows")
    val fill = s.select("epoch", "doc_id", "shard")
      .unionByName(d1.select("epoch", "doc_id", "shard"))
      .groupBy("epoch", "shard").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("epoch", "shard").orderBy("shard_pos")
    val viol = i2.join(fill, Seq("epoch", "shard"), "left")
      .withColumn("r", row_number().over(w))
      .filter(col("shard_pos") =!= coalesce(col("n"), lit(0L)) + col("r"))
    assert(viol.isEmpty,
      "[day2 neardup] shard_pos must be (standing + day-1) fill + " +
        "dense appended rank")
    val shipped = s.select("epoch", "doc_id")
      .unionByName(d1.select("epoch", "doc_id"))
    assert(i2.select("epoch", "doc_id").join(shipped,
        Seq("epoch", "doc_id")).isEmpty,
      "appended v3 rows must never collide with shipped rows")
  }

  test("[day2] the MERGED index is decisive: echo docs clean differently " +
    "against standing-only counts") {
    // the day-2-only span claim: the pair-ECHO pages duplicate v2
    // pair-prefix windows that occur ZERO times in standing — a
    // standing-only index keeps them (total 1), the advanced index
    // flags them (1 + day-1's 2 > maxOcc). Cleaning the v3 corpus
    // against both indexes must differ, exactly on the echo docs.
    val promo = TextAnalysis.SpanPromoText
    def inject(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
        when(col("doc_id") % 3 === 0,
          concat_ws(" ", col("text"), lit(promo)))
          .otherwise(col("text")).as("text"))
    val idx0 = TextAnalysis.spanIndex(inject(standingRaw))
      .localCheckpoint(true)
    val idx1 = TextAnalysis.indexMerge(idx0,
      TextAnalysis.spanIndex(inject(incRaw))).localCheckpoint(true)
    def cleaned(idx: org.apache.spark.sql.DataFrame) =
      TextAnalysis.spanDedupIncrement(inject(incRaw2), idx)
        .select(col("doc_id"), col("clean_text")).localCheckpoint(true)
    val under0 = cleaned(idx0)
    val under1 = cleaned(idx1)
    val diff = under0.as("a").join(under1.as("b"), Seq("doc_id"))
      .filter(col("a.clean_text") =!= col("b.clean_text"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(diff.nonEmpty,
      "day-2 cleaning must depend on day-1 counts somewhere")
    val echoIds = incRaw2.select("doc_id")
      .filter(col("doc_id") >= ExtQueries.Inc2EchoOffset &&
        col("doc_id") < ExtQueries.Inc2FreshOffset)
      .collect().map(_.getLong(0)).toSet
    assert(diff.subsetOf(echoIds),
      s"only echo docs may be index-sensitive; got ${diff -- echoIds}")
    assert(diff == echoIds,
      "every echo doc's prefix must be flagged by day-1 counts alone")
    // and the freeze: the third occurrence changed no day-0+1 flag —
    // already asserted by the [day2 exact] frozen test above
  }

  test("[day2] cross-LSH candidates reach day-1 keys (bands from the " +
    "ADVANCED signature state)") {
    // verified attach to unique day-1 text is structurally impossible
    // under the exact tier (shared runs ≤ 7 cap distinct-3-shingle
    // Jaccard ≈ 0.45 < the 0.5 bar — the freeze/attach exclusion the
    // fixture scaladoc prices), so the provable claim is one stage
    // earlier: the a3 family's ~4/7 shingle overlap with v2 FRESH
    // pages must produce cross-LSH candidate pairs against day-1 ids.
    val promo = TextAnalysis.SpanPromoText
    def inject(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
        when(col("doc_id") % 3 === 0,
          concat_ws(" ", col("text"), lit(promo)))
          .otherwise(col("text")).as("text"))
    def cleanSel(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("clean_text").as("text"))
      .filter(col("text") =!= "").localCheckpoint(true)
    val idx0 = TextAnalysis.spanIndex(inject(standingRaw))
      .localCheckpoint(true)
    val clean1 = cleanSel(
      TextAnalysis.spanDedupIncrement(inject(incRaw), idx0))
    val clean2 = cleanSel(TextAnalysis.spanDedupIncrement(inject(incRaw2),
      TextAnalysis.indexMerge(idx0,
        TextAnalysis.spanIndex(inject(incRaw)))))
    val cands = Dedup.lshCrossCandidates(
        Dedup.minHashSignatures(Dedup.shingleFrame(clean2), 8),
        Dedup.minHashSignatures(Dedup.shingleFrame(clean1), 8), 8, 4)
      .filter(col("id_b") >= ExtQueries.IncIdFloor &&
        col("id_b") < ExtQueries.Inc2IdFloor)
    assert(cands.count() > 0,
      "v3 docs must band-collide with day-1-appended ids")
  }

  test("O(increment): re-run rebuilds no standing tier; plan is pinned") {
    incr.count() // ensure the memos exist
    val before = graft.std.SessionMemo.counters
      .filter(_._1.startsWith("curation_"))
    val again = ExtQueries.curationTrainPipelineIncrement(spark, sfDir)
    again.count()
    val after = graft.std.SessionMemo.counters
      .filter(_._1.startsWith("curation_"))
    assert(before.nonEmpty, "standing memo tags must exist")
    after.foreach { case (tag, (_, builds)) =>
      assert(builds == before(tag)._2,
        s"standing tier $tag was rebuilt on an increment re-run")
      assert(builds == 1L, s"standing tier $tag built ${builds}x")
    }
    // the re-run's physical plan: increment explodes ran at pin time,
    // standing tiers arrive as checkpoints — no Generate in the tail
    val phys = again.queryExecution.executedPlan.toString
    assert(!phys.contains("Generate"),
      s"an explode leaked into the increment tail:\n$phys")
    assert("Scan ExistingRDD".r.findAllIn(phys).nonEmpty,
      "the increment tail must consume pinned/memoized checkpoints")
  }
}
