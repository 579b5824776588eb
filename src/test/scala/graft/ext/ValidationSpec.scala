package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Data-quality validation: profile, FK audit, constraint audit —
  * each proven on data with INJECTED defects (the production tables
  * are clean, so zeros alone would prove nothing).
  */
class ValidationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("column profile: nulls, distincts, numeric moments") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "b"), (3L, "b"), (null, "c"), (4L, null))
      .toDF("num", "s")
    val out = Validation.columnProfile(df, Seq("num", "s")).collect()
      .map(r => r.getString(0) -> r).toMap
    val n = out("num")
    assert(n.getLong(1) == 5 && n.getLong(2) == 1)       // n_rows, n_null
    assert(n.getDouble(3) == 0.2)                        // null_frac
    assert(n.getLong(4) == 4)                            // n_distinct
    assert(n.getDouble(5) == 1.0 && n.getDouble(6) == 4.0)
    assert(n.getDouble(7) == 2.5)                        // mean of 1,2,3,4
    val s = out("s")
    assert(s.getLong(2) == 1 && s.getLong(4) == 3)       // null + distinct
    assert(s.isNullAt(5) && s.isNullAt(6) && s.isNullAt(7))
  }

  test("column profile avoids the multi-distinct Expand: two-level agg") {
    val df = Seq((1L, "a")).toDF("num", "s")
    val frame = Validation.columnProfile(df, Seq("num", "s"))
    frame.collect()
    val expands = graft.std.Plans.collect(frame) {
      case e: org.apache.spark.sql.execution.ExpandExec => e
    }.length
    assert(expands == 0, s"profile must not Expand per column, saw $expands")
  }

  test("FK audit: orphans counted once, null child keys pass") {
    val child = Seq[(java.lang.Long, String)](
      (1L, "x"), (1L, "y"), (9L, "orphan"), (null, "null-key"))
      .toDF("fk", "payload")
    // duplicate parent key: must not double-count matched children
    val parent = Seq(1L, 1L, 2L).toDF("pk")
    val out = Validation.refIntegrity(Seq(
      Validation.FkCheck("c_to_p", child, "fk", parent, "pk"))).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "c_to_p")
    assert(r.getLong(1) == 4)            // all child rows counted
    assert(r.getLong(2) == 1)            // only fk=9 is orphaned
    assert(!r.getBoolean(3))
  }

  test("constraint audit: injected violations, nulls violate ranges") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (5.0, 0.1), (-1.0, 0.5), (null, 2.0), (3.0, null))
      .toDF("qty", "disc")
    def viol(pred: org.apache.spark.sql.Column) =
      coalesce(!pred, lit(true))
    val out = Validation.constraintAudit(df, Seq(
      "qty_positive" -> viol(col("qty") > 0),
      "disc_in_unit" -> viol(col("disc") >= 0 && col("disc") <= 1)))
      .collect().map(r => r.getString(0) -> r).toMap
    val q = out("qty_positive")
    assert(q.getLong(1) == 4 && q.getLong(2) == 2)   // -1.0 and null
    assert(q.getDouble(3) == 0.5 && !q.getBoolean(4))
    val d = out("disc_in_unit")
    assert(d.getLong(2) == 2)                        // 2.0 and null
  }

  test("key uniqueness: dup groups counted, null keys reported apart") {
    val t = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 1L), (1L, 1L), (1L, 2L), (2L, 1L), (null, 1L), (3L, null))
      .toDF("a", "b")
    val out = Validation.keyUniqueness(Seq(
      Validation.KeyCheck("composite", t, Seq("a", "b")))).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 6)           // n_rows
    assert(r.getLong(2) == 2)           // the two null-key rows
    assert(r.getLong(3) == 1)           // one duplicated key: (1,1)
    assert(r.getLong(4) == 2)           // under it, two rows
    assert(!r.getBoolean(5))
    // a clean key over the same table
    val clean = Validation.keyUniqueness(Seq(
      Validation.KeyCheck("b_only", t.select(col("b")).distinct(),
        Seq("b")))).collect().head
    assert(clean.getLong(3) == 0 && clean.getBoolean(5))
  }

  test("histogram: floor bins, null exclusion, fractions sum to 1") {
    val df = Seq[java.lang.Double](0.0, 5.0, 9.99, 10.0, 25.0, null)
      .toDF("v")
    val out = Validation.histogram(df, "v", 10.0).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(out == Map(
      0L -> ((0.0, 3L, 0.6)),     // 0, 5, 9.99
      1L -> ((10.0, 1L, 0.2)),    // 10.0 lands in [10,20)
      2L -> ((20.0, 1L, 0.2))))   // null excluded from count AND total
  }

  test("drift PSI: zero for identical snapshots, finite for new bins") {
    val ref = Seq(1.0, 2.0, 11.0, 12.0, 21.0).toDF("v")
    // identical distribution -> every p equals q -> PSI exactly 0
    val same = Validation.driftPsi(ref, ref, "v", 10.0).collect()
    assert(same.forall(_.getDouble(5) == 0.0))
    assert(same.head.getDouble(6) == 0.0)
    // mass moves up + a bin that exists only in `cur`: PSI positive,
    // every term finite (the +1 smoothing), new bin has n_ref = 0
    val cur = Seq(21.0, 22.0, 23.0, 31.0, 32.0).toDF("v")
    val out = Validation.driftPsi(ref, cur, "v", 10.0).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(3L).getLong(1) == 0 && out(3L).getLong(2) == 2)
    assert(out.values.forall(r => !r.getDouble(5).isNaN &&
      !r.getDouble(5).isInfinite))
    assert(out.values.head.getDouble(6) > 0.25) // a real shift reads as one
  }

  test("quantile report: exact interpolation, approx within tolerance") {
    // group g: 1..5 -> p25 = 2, p50 = 3, p75 = 4 (positions p*(n-1))
    val df = (1 to 5).map(v => ("g", v.toDouble)).toDF("grp", "v")
    val exact = Validation.quantileReport(df, "grp", "v",
      Seq(0.25, 0.5, 0.75), exact = true).collect()
      .map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    assert(exact == Map(0.25 -> 2.0, 0.5 -> 3.0, 0.75 -> 4.0))
    // interpolated position: p90 over 1..5 sits at 0.9*4 = 3.6 -> 4.6
    val p90 = Validation.quantileReport(df, "grp", "v", Seq(0.9),
      exact = true).collect().head.getDouble(2)
    assert(p90 == 4.6)
    // approx mode: same schema, close on this tiny input
    val approx = Validation.quantileReport(df, "grp", "v", Seq(0.5))
      .collect().head
    assert(approx.getDouble(1) == 0.5 && math.abs(approx.getDouble(2) - 3.0) <= 1.0)
  }

  test("key skew: counts, shares, skew ratio, null key, tiebreak") {
    // key a: 4 rows, b: 2, c: 1, null: 1 -> 8 rows over 4 keys (avg 2)
    val df = (Seq.fill(4)("a") ++ Seq.fill(2)("b") ++ Seq("c") ++
      Seq(null.asInstanceOf[String])).toDF("k")
    val out = Validation.keySkew(df, "k", topN = 3).collect()
    assert(out.length == 3)
    // order: count desc, then key asc NULLS LAST (the oracle's default),
    // so the 1-row tie resolves to "c" and the null class falls off
    assert(out(0).getString(0) == "a" && out(0).getLong(1) == 4)
    assert(out(0).getDouble(2) == 0.5)        // share 4/8
    assert(out(0).getDouble(3) == 2.0)        // 4 / (8/4 keys)
    assert(out(1).getString(0) == "b" && out(1).getDouble(3) == 1.0)
    assert(out(2).getString(0) == "c" && out(2).getDouble(3) == 0.5)
    // null key reports as its own class when topN admits it
    val all = Validation.keySkew(df, "k", topN = 10).collect()
    assert(all.length == 4 && all(3).isNullAt(0) && all(3).getLong(1) == 1)
  }

  test("key skew: top-N runs as TakeOrderedAndProject, not a global sort") {
    val df = Seq("a", "a", "b").toDF("k")
    val frame = Validation.keySkew(df, "k", topN = 2)
    frame.collect()
    val topK = graft.std.Plans.collect(frame) {
      case e: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => e
    }.length
    val sorts = graft.std.Plans.collect(frame) {
      case e: org.apache.spark.sql.execution.SortExec if e.global => e
    }.length
    assert(topK == 1 && sorts == 0,
      s"want TakeOrderedAndProject (got $topK) and no global sort ($sorts)")
  }

  test("k-anonymity: only sub-k classes report; nulls form a class") {
    val df = (Seq.fill(5)(("us", "a")) ++ Seq.fill(2)(("us", "b")) ++
      Seq(("de", "a")) ++ Seq((null.asInstanceOf[String], "a")))
      .toDF("country", "seg")
    val out = Validation.kAnonymity(df, Seq("country", "seg"), k = 3)
      .collect()
      .map(r => (Option(r.getString(0)), r.getString(1)) -> r.getLong(2))
      .toMap
    // (us, a) has 5 >= 3: absent; the three small classes report
    assert(out == Map(
      (Some("us"), "b") -> 2L,
      (Some("de"), "a") -> 1L,
      (None, "a") -> 1L))
  }

  test("group mode: winner, tie broken on value, null class counts") {
    val df = (Seq.fill(3)(("a", "x")) ++ Seq.fill(3)(("a", "w")) ++
      Seq(("a", "z")) ++
      Seq.fill(2)(("b", null.asInstanceOf[String])) ++ Seq(("b", "y")))
      .toDF("g", "v")
    val out = Validation.groupMode(df, "g", "v").collect()
      .map(r => r.getString(0) ->
        ((Option(r.getString(1)), r.getLong(2), r.getDouble(3)))).toMap
    // a: x and w tie at 3 -> "w" wins (value ASC); share 3/7
    assert(out("a") == ((Some("w"), 3L, 0.428571)))
    // b: the null class dominates and reports AS null
    assert(out("b") == ((None, 2L, 0.666667)))
  }

  test("schema drift: added/removed/type changes reported, clean is empty") {
    val ref = Seq((1L, "a", 1.0)).toDF("id", "name", "score")
    val cur = Seq((1L, 1, true)).toDF("id", "name", "flag")
    val out = Validation.schemaDrift(ref, cur).collect()
      .map(r => r.getString(0) ->
        ((r.getString(1), r.getString(2), r.getString(3)))).toMap
    assert(out == Map(
      "flag" -> (("added", null, "boolean")),
      "score" -> (("removed", "double", null)),
      "name" -> (("type_changed", "string", "int"))))
    assert(Validation.schemaDrift(ref, ref).isEmpty)
  }

  test("plan health counts the shapes the scaladocs assert by hand") {
    val dir = java.nio.file.Files.createTempDirectory("health").toString
    spark.range(0, 1000)
      .selectExpr("id", "id % 7 AS k").write.mode("overwrite").parquet(dir)
    val fact = spark.read.parquet(dir).filter(col("id") > 10)
    val dim = Seq((0L, "x"), (1L, "y")).toDF("k", "tag")
    val frame = fact.join(broadcast(dim), "k")
    frame.collect()
    val h = graft.std.Plans.health(frame)
    assert(h.broadcastJoins == 1 && h.sortMergeJoins == 0)
    assert(h.scans == 1 && h.scansWithPushedFilters == 1)
    assert(h.globalSorts == 0 && h.wholeStageSpans >= 1)
    assert(h.warnings.isEmpty)
    // and an unfiltered full-scan self sort-merge join trips warnings
    val a = spark.read.parquet(dir)
    val ugly = a.join(a.withColumnRenamed("id", "id2")
        .hint("merge"), "k")
      .orderBy("id")
    ugly.collect()
    val hu = graft.std.Plans.health(ugly)
    assert(hu.warnings.nonEmpty)
  }

  test("join estimate: below-k sketches are exact and the formula holds") {
    // probe: keys 1..50, each appearing twice; build: keys 26..75 once.
    // overlap = 25 keys; join rows = 25 * 2 = 50. All cardinalities
    // sit below k=256, so every estimate collapses to the exact value
    // and the uniform-multiplicity formula is checkable by hand.
    val probe = ((1 to 50) ++ (1 to 50)).map(i => (i.toLong, "p"))
      .toDF("k", "tag")
    val build = (26 to 75).map(i => (i.toLong, "b")).toDF("bk", "tag")
    val r = Validation.joinSizeEstimate(probe, build, "k", "bk").head()
    assert(r.getAs[Long]("n_probe") == 100 &&
      r.getAs[Long]("n_build") == 50)
    assert(r.getAs[Long]("d_probe_exact") == 50 &&
      r.getAs[Double]("d_probe_est") == 50.0)
    assert(r.getAs[Double]("d_build_est") == 50.0)
    // union = 75 distinct, intersection 25 -> jaccard 25/75
    assert(math.abs(r.getAs[Double]("jaccard_est") - 25.0 / 75) < 1e-4)
    assert(r.getAs[Double]("inter_est") == 25.0)
    // join_est = inter * n_probe / d_probe = 25 * 100/50 = 50 = exact
    assert(r.getAs[Double]("join_est") == 50.0)
    assert(r.getAs[Long]("join_exact") == 50)
  }

  test("constraint audit is one scan: no shuffle beyond the scalar agg") {
    val df = Seq((1.0, 0.1)).toDF("qty", "disc")
    def viol(pred: org.apache.spark.sql.Column) =
      coalesce(!pred, lit(true))
    val frame = Validation.constraintAudit(df, Seq(
      "a" -> viol(col("qty") > 0), "b" -> viol(col("disc") >= 0)))
    frame.collect()
    val shuffles = graft.std.Plans.collect(frame) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.length
    // single-partition scalar aggregate: at most the final 1-row exchange
    assert(shuffles <= 1, s"expected one scalar-agg exchange, saw $shuffles")
  }

  test("psi timeline: identical periods score equal psi, a flipped " +
    "period scores higher, absent classes stay finite") {
    import spark.implicits._
    // periods 1 and 2 have the global mix (9a+1b); period 3 is all b
    // plus the only null row — so 1 and 2 share one (small) psi from
    // smoothing alone, 3 reads clearly higher, and classes 'a'
    // (absent in 3) and NULL (absent in 1/2) stay finite via the
    // Laplace floor over the GLOBAL class set.
    val rows =
      (1 to 9).map(_ => (1, "a")) ++ Seq((1, "b")) ++
        (1 to 9).map(_ => (2, "a")) ++ Seq((2, "b")) ++
        (1 to 9).map(_ => (3, "b")) ++ Seq((3, null: String))
    val r = Validation.psiTimeline(rows.toDF("period", "cls"),
        "period", "cls")
      .collect()
      .map(x => x.getInt(0) -> ((x.getLong(1), x.getLong(2),
        x.getDouble(3)))).toMap
    assert(r.keySet == Set(1, 2, 3))
    assert(r(1) == r(2), s"identical mixes must tie: $r")
    assert(r(1)._1 == 10L && r(1)._2 == 3L)
    assert(r(3)._3 > r(1)._3 + 0.5,
      s"the flipped period must read clearly higher: $r")
    assert(!r(3)._3.isInfinite && !r(3)._3.isNaN)
  }

  test("missingness audit: correlated nulls lift above the marginal; " +
    "undefined verdicts are NULL, never NaN") {
    // 10 rows: a null on {1,2} always WITH b; b additionally null
    // alone on {3}; c never null
    val rows = (1 to 10).map { i =>
      (if (i <= 2) None else Some(i.toLong),
        if (i <= 3) None else Some(i * 1.0),
        i.toLong)
    }
    val df = rows.toDF("a", "b", "c")
    val out = Validation.missingnessAudit(df,
        Seq(("a", "b"), ("b", "a"), ("c", "b")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = out(("a", "b"))
    // P(b null | a null) = 2/2 = 1e9; marginal 3/10; lift 3333
    assert(ab.getLong(3) == 2L && ab.getLong(4) == 3L &&
      ab.getLong(5) == 2L)
    assert(ab.getLong(6) == 1000000000L &&
      ab.getLong(7) == 300000000L && ab.getLong(8) == 3333L)
    // reverse direction: P(a null | b null) = 2/3, lift vs 2/10
    val ba = out(("b", "a"))
    assert(ba.getLong(6) == 666666666L &&
      ba.getLong(7) == 200000000L && ba.getLong(8) == 3333L)
    // c never null: conditional undefined -> NULLs end to end
    val cb = out(("c", "b"))
    assert(cb.getLong(3) == 0L && cb.isNullAt(6) && cb.isNullAt(8))
  }

  test("missingness audit: underscored column names cannot collide " +
    "across pairs (r14 ADVICE — aliases are keyed by position)") {
    // the adversarial shape from the advice: pairs ("a_b","c") and
    // ("a","b_c") would both have aliased `_nb_a_b_c` under
    // name-concatenation keying
    val rows = Seq(
      (Some(1L), None: Option[Long], Some(1L), Some(1L)),
      (None, Some(2L), None, Some(2L)),
      (None, None, Some(3L), None),
      (Some(4L), Some(4L), Some(4L), Some(4L)))
    val df = rows.toDF("a_b", "c", "a", "b_c")
    val out = Validation.missingnessAudit(df,
        Seq(("a_b", "c"), ("a", "b_c")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // a_b null on rows {2,3}; c null on {1,3}; both null on {3} only
    val p1 = out(("a_b", "c"))
    assert(p1.getLong(3) == 2L && p1.getLong(4) == 2L &&
      p1.getLong(5) == 1L, s"pair (a_b, c) counters wrong: $p1")
    assert(p1.getLong(6) == 500000000L && p1.getLong(7) == 500000000L)
    // a null on {2}; b_c null on {3}; never both null
    val p2 = out(("a", "b_c"))
    assert(p2.getLong(3) == 1L && p2.getLong(4) == 1L &&
      p2.getLong(5) == 0L, s"pair (a, b_c) counters wrong: $p2")
    assert(p2.getLong(6) == 0L && p2.getLong(8) == 0L)
  }
}
