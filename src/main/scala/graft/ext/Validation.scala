package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-quality validation: column profiling, referential-integrity
  * audit, and declarative constraint checks — the audit-report tier a
  * warehouse runs before trusting a load (the reference bakes its
  * checks into cleaning as per-row quality flags,
  * `/root/reference/Project.py:158-166`; this generalizes them into
  * table-level reports a pipeline can gate on).
  *
  * 100 TB shape, per operator:
  *  - [[columnProfile]]: one corpus scan exploded to skinny
  *    (column, value) pairs, then TWO-LEVEL aggregation — the
  *    per-(column, value) partial collapse happens map-side, and the
  *    second level sees |columns| × |distinct| groups, never rows. No
  *    `Expand`-based multi-distinct (which would replay the scan once
  *    per profiled column through the shuffle).
  *  - [[refIntegrity]]: one LEFT ANTI join per constraint — Spark
  *    broadcasts the parent side when it is dimension-sized, and each
  *    verdict is a single-row aggregate, so the union of constraints
  *    is a union of scalars.
  *  - [[constraintAudit]]: ONE scan, all constraints as conditional
  *    sums in a single aggregate — adding a constraint adds a column,
  *    not a pass.
  */
object Validation {

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  /** Per-column profile in long form: row/null/distinct counts for
    * every column, min/max/mean for numeric ones (null otherwise).
    *
    * Determinism: the mean runs as a DECIMAL(38,18) sum over the
    * numeric value (exact + associative — shuffle order cannot move
    * it; the s3 discipline), and min/max/mean/null_frac round to 6 dp.
    * `n_distinct` counts distinct non-null values exactly via the
    * two-level groupBy — the cast to string is round-trip injective
    * for every profiled type, so the count equals the raw column's.
    * At 100 TB swap the exact distinct for the KMV/HLL sketch
    * ([[TextAnalysis.kmvCardinality]] / `approx_count_distinct`) if
    * the per-column value space itself is corpus-sized; counts,
    * null fractions, and moments are sketch-free either way.
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val fields = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val entries = cols.map { c =>
      val num =
        if (isNumeric(fields(c))) col(c).cast("double")
        else lit(null).cast("double")
      struct(lit(c).as("col_name"), col(c).cast("string").as("v"),
        num.as("num"))
    }
    df.select(explode(array(entries: _*)).as("e"))
      .select(col("e.col_name"), col("e.v"), col("e.num"))
      .groupBy(col("col_name"), col("v"))
      .agg(count(lit(1)).as("_cnt"),
        sum(col("num").cast("decimal(38,18)")).as("_sum"),
        min(col("num")).as("_min"), max(col("num")).as("_max"))
      .groupBy(col("col_name"))
      .agg(
        sum(col("_cnt")).as("n_rows"),
        coalesce(sum(when(col("v").isNull, col("_cnt"))), lit(0L))
          .as("n_null"),
        count(when(col("v").isNotNull, lit(1))).as("n_distinct"),
        round(min(col("_min")), 6).as("min_num"),
        round(max(col("_max")), 6).as("max_num"),
        // _min is the group's (constant) numeric value — its null-ness
        // stands in for num's at this level
        round(sum(col("_sum")).cast("double") /
          sum(when(col("_min").isNotNull, col("_cnt"))), 6).as("mean_num"))
      .withColumn("null_frac",
        round(col("n_null").cast("double") / col("n_rows"), 6))
      .select("col_name", "n_rows", "n_null", "null_frac", "n_distinct",
        "min_num", "max_num", "mean_num")
  }

  /** One referential-integrity constraint: child rows whose non-null
    * `childKey` has no match in `parentKey` (SQL FK semantics — a NULL
    * child key never violates).
    */
  case class FkCheck(name: String, child: DataFrame, childKey: String,
                     parent: DataFrame, parentKey: String)

  /** Orphan audit for a set of FK constraints: per constraint, the
    * child row count, how many non-null keys are orphaned, and the
    * verdict. Each check is a LEFT ANTI join (broadcast when the
    * parent is dimension-sized) collapsed to one row; the report is
    * the union of those single-row aggregates.
    */
  def refIntegrity(checks: Seq[FkCheck]): DataFrame = {
    require(checks.nonEmpty, "need at least one FK check")
    checks.map { fk =>
      val keyed = fk.child.select(col(fk.childKey).as("_k"))
      val orphans = keyed.filter(col("_k").isNotNull)
        .join(fk.parent.select(col(fk.parentKey).as("_p")),
          col("_k") === col("_p"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      val totals = keyed.agg(count(lit(1)).as("n_child"))
      totals.crossJoin(orphans).select(
        lit(fk.name).as("constraint"), col("n_child"), col("n_orphans"),
        (col("n_orphans") === 0).as("ok"))
    }.reduce(_ unionAll _)
  }

  /** One uniqueness (candidate-key) check: table + the columns that
    * should jointly identify a row.
    */
  case class KeyCheck(name: String, table: DataFrame, keyCols: Seq[String])

  /** Candidate-key audit: per check, how many key values occur more
    * than once and how many rows sit under them. Rows with a NULL in
    * the key are reported separately (`n_null_keys`) — SQL UNIQUE
    * ignores them, and silently folding them into one "null" group
    * would fabricate duplicates.
    *
    * 100 TB shape: groupBy the key with map-side combine, then the
    * duplicate groups collapse to one scalar verdict — shuffle volume
    * is distinct keys, the report is |checks| rows.
    */
  def keyUniqueness(checks: Seq[KeyCheck]): DataFrame = {
    require(checks.nonEmpty, "need at least one key check")
    checks.map { kc =>
      val key = kc.keyCols.map(col)
      val nonNull = kc.keyCols.map(col(_).isNotNull).reduce(_ && _)
      val grouped = kc.table.groupBy(key: _*).agg(count(lit(1)).as("_n"))
        .filter(nonNull)
      val dups = grouped.filter(col("_n") > 1)
        .agg(coalesce(count(lit(1)), lit(0L)).as("n_dup_keys"),
          coalesce(sum(col("_n")), lit(0L)).as("n_dup_rows"))
      val totals = kc.table.agg(count(lit(1)).as("n_rows"),
        sum(when(!nonNull, 1L)).as("_nn"))
      totals.crossJoin(dups).select(
        lit(kc.name).as("check_name"), col("n_rows"),
        coalesce(col("_nn"), lit(0L)).as("n_null_keys"),
        col("n_dup_keys"), col("n_dup_rows"),
        (col("n_dup_keys") === 0).as("ok"))
    }.reduce(_ unionAll _)
  }

  /** Per-group quantile report in long form: (group, quantile, value).
    *
    * `exact = true` uses Spark's exact interpolated `percentile` — the
    * VERIFICATION KERNEL (it buffers each group's values, so it is the
    * test-scale oracle twin, not the 100 TB path — the t24 discipline).
    * `exact = false` is the production path: `approx_percentile`, a
    * mergeable fixed-size sketch per group, one pass at any scale
    * (same estimator family as [[TextAnalysis.corpusProfile]]).
    * Both emit the identical schema so a pipeline swaps modes with one
    * flag.
    */
  def quantileReport(df: DataFrame, groupCol: String, valueCol: String,
                     quantiles: Seq[Double],
                     exact: Boolean = false): DataFrame = {
    require(quantiles.nonEmpty, "need at least one quantile")
    val qArr = quantiles.map(q => s"${q}D").mkString("array(", ",", ")")
    val agg =
      if (exact) expr(s"percentile($valueCol, $qArr)")
      else expr(s"approx_percentile($valueCol, $qArr, 10000)")
    df.groupBy(col(groupCol)).agg(agg.as("_qv"))
      .select(col(groupCol), posexplode(col("_qv")).as(Seq("_i", "_v")))
      .select(col(groupCol),
        element_at(
          array(quantiles.map(lit): _*), col("_i") + 1).as("quantile"),
        round(col("_v"), 6).as("value"))
  }

  /** Fixed-width histogram of a numeric column: bin index, its lower
    * bound, count, and fraction of non-null rows. NULLs are excluded
    * (the profile reports them separately — [[columnProfile]]).
    *
    * 100 TB shape: one scan, partial-agg collapse to |bins| rows; the
    * total joins back as a broadcast scalar (never a single-partition
    * window over the corpus). `floor` on IEEE doubles is bit-exact
    * cross-engine (the quantizeInt8 rationale), so bin assignment —
    * and therefore every count — is deterministic.
    */
  def histogram(df: DataFrame, valueCol: String,
                binWidth: Double): DataFrame = {
    require(binWidth > 0, "need a positive bin width")
    val bins = df.filter(col(valueCol).isNotNull)
      .select(floor(col(valueCol).cast("double") / binWidth).cast("long")
        .as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
    val total = bins.agg(sum(col("n")).as("_total"))
    bins.crossJoin(broadcast(total)).select(
      col("bin"),
      round(col("bin").cast("double") * binWidth, 6).as("bin_lo"),
      col("n"),
      round(col("n").cast("double") / col("_total"), 6).as("frac"))
  }

  /** Distribution-drift report between a reference and a current
    * snapshot of a numeric column: Population Stability Index over
    * fixed-width floor bins. Laplace-smoothed (+1 per bin over the
    * UNION bin set) so bins present in only one snapshot contribute a
    * finite term instead of an infinity; the conventional read is
    * <0.1 stable, 0.1–0.25 drifting, >0.25 shifted.
    *
    * 100 TB shape: each snapshot collapses to |bins| rows in one scan
    * (the x11 histogram shape), the full-outer bin join and the PSI
    * arithmetic run on those tiny frames, and the scalar totals
    * broadcast.
    *
    * Determinism: bin counts are exact longs; smoothed fractions are
    * double ratios of exact integers; each PSI term rounds its
    * `(p-q)·ln(p/q)` to 9 dp (libm `ln` agrees cross-engine at that
    * grain — the t25 discipline) and the total is a DECIMAL(28,9) sum
    * of those rounded terms, immune to summation order.
    */
  def driftPsi(ref: DataFrame, cur: DataFrame, valueCol: String,
               binWidth: Double): DataFrame = {
    require(binWidth > 0, "need a positive bin width")
    def bins(df: DataFrame, as: String) =
      df.filter(col(valueCol).isNotNull)
        .select(floor(col(valueCol).cast("double") / binWidth)
          .cast("long").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as(as))
    val joined = bins(ref, "_rc").join(bins(cur, "_cc"), Seq("bin"),
        "full_outer")
      .select(col("bin"), coalesce(col("_rc"), lit(0L)).as("_rc"),
        coalesce(col("_cc"), lit(0L)).as("_cc"))
    val tot = joined.agg(sum(col("_rc")).as("_rt"),
      sum(col("_cc")).as("_ct"), count(lit(1)).as("_nb"))
    val p = (col("_rc") + 1).cast("double") /
      (col("_rt") + col("_nb")).cast("double")
    val q = (col("_cc") + 1).cast("double") /
      (col("_ct") + col("_nb")).cast("double")
    val terms = joined.crossJoin(broadcast(tot)).select(
      col("bin"), col("_rc").as("n_ref"), col("_cc").as("n_cur"),
      round(p, 9).as("p_ref"), round(q, 9).as("p_cur"),
      round((p - q) * log(p / q), 9).as("psi_term"))
    val whole = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    terms.withColumn("total_psi",
      round(sum(col("psi_term").cast("decimal(28,9)")).over(whole), 9)
        .cast("double"))
  }

  /** Categorical drift timeline (v9): per-period PSI of a categorical
    * column's mix against the WHOLE-corpus mix — x16 answers "did the
    * distribution move between two snapshots"; this answers WHEN, on
    * one table, per period: the scraper-regression / schema-rollout /
    * seasonality localizer (a status mix that drifts month over month
    * shows up as a rising psi series, and the month a feed broke is a
    * step). Reference = the global mix, so every period is scored
    * against the same yardstick and the series is comparable.
    *
    * Same arithmetic as [[driftPsi]], categorical domain instead of
    * bins: Laplace-smoothed shares over the GLOBAL class set (every
    * period scores every class — absent classes read the smoothed
    * floor, so one-sided classes stay finite), 9-dp
    * `(p_ref − p_cur)·ln(p_ref/p_cur)` terms summed per period in
    * DECIMAL(28,9), order-free. NULL classes group as their own
    * reportable class (the x29 rule).
    *
    * 100 TB shape: the corpus collapses to |periods|×|classes| cells
    * in ONE partial-agg shuffle; the scaffold (distinct periods ×
    * distinct classes), the global class frame, and the scalar total
    * are all broadcast-sized; the per-period sum runs on the tiny
    * cell frame.
    */
  def psiTimeline(df: DataFrame, periodCol: String,
                  valueCol: String): DataFrame = {
    val cells = df.select(col(periodCol).as("period"),
        col(valueCol).cast("string").as("_cls"))
      .groupBy(col("period"), col("_cls"))
      .agg(count(lit(1)).as("_n"))
    val classes = cells.groupBy(col("_cls"))
      .agg(sum(col("_n")).as("_ng"))
    val perPeriod = cells.groupBy(col("period"))
      .agg(sum(col("_n")).as("n_rows"))
    val tot = classes.agg(sum(col("_ng")).as("_nt"),
      count(lit(1)).as("_nc"))
    // null-safe class match: the NULL class must meet ITS scaffold row
    val c2 = cells.select(col("period").as("_p2"),
      col("_cls").as("_c2"), col("_n"))
    val scaffold = perPeriod.crossJoin(broadcast(classes))
      .join(c2, col("period") === col("_p2") &&
        col("_cls") <=> col("_c2"), "left_outer")
      .select(col("period"), col("n_rows"), col("_cls"), col("_ng"),
        coalesce(col("_n"), lit(0L)).as("_n"))
      .crossJoin(broadcast(tot))
    val pRef = (col("_ng") + 1).cast("double") /
      (col("_nt") + col("_nc")).cast("double")
    val pCur = (col("_n") + 1).cast("double") /
      (col("n_rows") + col("_nc")).cast("double")
    scaffold
      .select(col("period"), col("n_rows"), col("_nc"),
        round((pRef - pCur) * log(pRef / pCur), 9).as("_term"))
      .groupBy(col("period"))
      .agg(max(col("n_rows")).as("n_rows"),
        max(col("_nc")).as("n_classes"),
        round(sum(col("_term").cast("decimal(28,9)")), 9)
          .cast("double").as("psi"))
  }

  /** Key-skew diagnostic (x17): the report a pipeline runs BEFORE
    * shuffling on a key to decide whether the join/agg needs salting
    * ([[graft.std.Salt]], the x1 device) or AQE skew splitting. Top
    * `topN` keys by row count with, per key: exact count, share of all
    * rows, and `skew_ratio` = count ÷ mean-rows-per-key (1.0 = flat;
    * the conventional alarm is a handful of keys ≫ 1 while the rest
    * sit ≪ 1 — those are the straggler partitions).
    *
    * 100 TB shape: ONE shuffle — the corpus collapses map-side to
    * |keys| partial counts; the scalar totals (row total, key count)
    * broadcast back over the tiny per-key frame, and the top-N runs as
    * `TakeOrderedAndProject` (per-partition heads, never a global
    * sort). Nothing downstream of the first aggregate sees row volume.
    *
    * Determinism: counts are exact longs; `share`/`skew_ratio` are
    * double ratios of exact integers rounded to 6 dp; ties in the
    * top-N order break on the key string ascending. A NULL key groups
    * as its own class and reports with `key` NULL (skew hiding in a
    * null-heavy column is exactly what this catches).
    */
  def keySkew(df: DataFrame, keyCol: String, topN: Int = 20): DataFrame = {
    require(topN >= 1, "need a positive topN")
    val perKey = df.select(col(keyCol).cast("string").as("key"))
      .groupBy("key").agg(count(lit(1)).as("n_rows"))
    val tot = perKey.agg(sum(col("n_rows")).cast("double").as("_total"),
      count(lit(1)).as("_n_keys"))
    perKey.crossJoin(broadcast(tot))
      .select(
        col("key"), col("n_rows"),
        round(col("n_rows").cast("double") / col("_total"), 6).as("share"),
        round(col("n_rows").cast("double") * col("_n_keys") / col("_total"),
          6).as("skew_ratio"))
      // NULLS LAST explicitly: Spark's asc defaults nulls FIRST while
      // SQL engines (the oracle twin included) default them LAST — a
      // count tie against the null class must cut identically
      .orderBy(col("n_rows").desc, col("key").asc_nulls_last)
      .limit(topN)
  }

  /** k-anonymity audit (v5): equivalence classes of the quasi-identifier
    * columns with fewer than `k` members — the classes whose rows a
    * linker could re-identify (Sweeney's criterion; the release gate is
    * "this result set is empty"). Returns the violating classes with
    * their sizes; callers needing a banded quasi-identifier (e.g.
    * an account-balance bucket) derive the band column first.
    *
    * 100 TB shape: one shuffle collapsing the corpus to |classes|
    * partially-aggregated rows; the `< k` filter runs post-aggregate
    * (HAVING), so output is bounded by the violating-class count —
    * at-risk classes are by definition the SMALL ones, so the result
    * stays tiny even when the audit fails badly. NULL quasi values
    * group as their own class (a NULL segment is still a linkable
    * signature).
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, "k-anonymity below 2 is vacuous")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .filter(col("class_size") < k)
  }

  /** Schema-drift audit (v6): column-level diff between a reference
    * and a current snapshot's schemas — the contract check a pipeline
    * runs before pointing jobs at a refreshed upstream (the
    * complement of [[graft.sources.Tables]]' evolution-tolerant READ:
    * this one REPORTS what changed instead of silently absorbing it).
    * One row per changed column: `added`, `removed`, or
    * `type_changed` with both type strings; empty result = contract
    * intact. Pure metadata — schemas are driver-side already, no job
    * runs.
    */
  def schemaDrift(ref: DataFrame, cur: DataFrame): DataFrame = {
    val spark = ref.sparkSession
    import spark.implicits._
    val r = ref.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val c = cur.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val rows =
      (c.keySet -- r.keySet).toSeq.sorted.map(n =>
        (n, "added", null: String, c(n))) ++
      (r.keySet -- c.keySet).toSeq.sorted.map(n =>
        (n, "removed", r(n), null: String)) ++
      (r.keySet & c.keySet).toSeq.sorted.collect {
        case n if r(n) != c(n) => (n, "type_changed", r(n), c(n))
      }
    rows.toDF("col_name", "change", "ref_type", "cur_type")
  }

  /** Per-group mode (x29): the most frequent value of a column within
    * each group, with the share it carries — the categorical summary
    * statistic Spark has no native aggregate for (and whose naive
    * `groupBy().agg(max_by(...))` form is nondeterministic on count
    * ties). Two-level: (group, value) counts collapse map-side first
    * — the shuffle carries distinct pairs, never rows — then a
    * per-group rank with the (count DESC, value ASC) total order picks
    * one winner deterministically. NULL values form their own class
    * (a null-dominated column SHOULD report null as its mode — that
    * is the data-quality signal).
    */
  def groupMode(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val counts = df.select(col(groupCol), col(valueCol).cast("string")
        .as("_v"))
      .groupBy(col(groupCol), col("_v"))
      .agg(count(lit(1)).as("_c"))
    val totals = counts.groupBy(col(groupCol))
      .agg(sum(col("_c")).as("_total"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("_c").desc, col("_v").asc_nulls_last)
    counts.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .join(broadcast(totals), Seq(groupCol))
      .select(col(groupCol), col("_v").as("mode_value"),
        col("_c").as("n_mode"),
        round(col("_c").cast("double") / col("_total"), 6)
          .as("mode_share"))
  }

  /** Join-size estimate (x22) — the planning diagnostic that runs
    * BEFORE an expensive join, from the same family as [[keySkew]]:
    * KMV bottom-k sketches of both key sets, the union sketch's
    * Jaccard → distinct-key-overlap estimate, and the join-row
    * estimate under the uniform-multiplicity assumption
    * (`overlap × n_probe / d_probe` — System-R's formula with the
    * sketch supplying the distincts). This is what decides broadcast
    * vs bloom-prune (x19) vs salt (x1) without paying for the join.
    *
    * 100 TB shape: each side collapses to its DISTINCT key hashes
    * (partial-agg), the bottom-k cuts run as `TakeOrderedAndProject`
    * (per-partition heads, k rows survive), and every downstream
    * combination is a crossJoin of broadcast one-row aggregates. The
    * `*_exact` columns (exact distincts, the materialized join count)
    * are the TEST-SCALE quality readout — the t24 discipline — and are
    * dropped in production, where they'd cost what the estimator
    * exists to avoid.
    *
    * Determinism: hashes are the repo's 56-bit md5 lane; bottom-k on
    * exact longs; estimates are double ratios of exact ints in pinned
    * operation order, rounded 3 dp (counts) / 6 dp (ratios).
    */
  def joinSizeEstimate(probe: DataFrame, build: DataFrame,
                       probeKey: String, buildKey: String,
                       k: Int = 256): DataFrame = {
    require(k >= 16, "sketch needs at least 16 minima")
    val two56 = lit(72057594037927936.0) // 2^56, the hash domain
    def est(kUsed: Column, kth: Column): Column =
      round(when(kUsed < k, kUsed.cast("double"))
        .otherwise((kUsed - 1).cast("double") /
          (kth.cast("double") / two56)), 3)
    def hashes(df: DataFrame, key: String) =
      df.select(TextOps.hash64(col(key).cast("string")).as("hv"))
        .filter(col("hv").isNotNull).distinct()
    val hA = hashes(probe, probeKey)
    val hB = hashes(build, buildKey)
    val sideA = probe.agg(count(lit(1)).as("n_probe"),
      countDistinct(col(probeKey)).as("d_probe_exact"))
    val sideB = build.agg(count(lit(1)).as("n_build"),
      countDistinct(col(buildKey)).as("d_build_exact"))
    val kA = hA.orderBy(col("hv").asc).limit(k)
      .agg(count(lit(1)).as("_ka"), max(col("hv")).as("_kth_a"))
    val kB = hB.orderBy(col("hv").asc).limit(k)
      .agg(count(lit(1)).as("_kb"), max(col("hv")).as("_kth_b"))
    val union = hA.select(col("hv"), lit(1).as("_a"), lit(0).as("_b"))
      .unionByName(hB.select(col("hv"), lit(0).as("_a"), lit(1).as("_b")))
      .groupBy("hv").agg(max(col("_a")).as("_ia"), max(col("_b")).as("_ib"))
    val kU = union.orderBy(col("hv").asc).limit(k)
      .agg(count(lit(1)).as("_ku"), max(col("hv")).as("_kth_u"),
        sum(col("_ia") * col("_ib")).as("_both"))
    val joinExact = probe
      .join(build, probe(probeKey) === build(buildKey))
      .agg(count(lit(1)).as("join_exact"))
    val dProbeEst = est(col("_ka"), col("_kth_a"))
    val dUnionEst = est(col("_ku"), col("_kth_u"))
    val jacc = round(col("_both").cast("double") / col("_ku"), 6)
    sideA.crossJoin(broadcast(sideB)).crossJoin(broadcast(kA))
      .crossJoin(broadcast(kB)).crossJoin(broadcast(kU))
      .crossJoin(broadcast(joinExact))
      .select(
        col("n_probe"), col("n_build"),
        col("d_probe_exact"), col("d_build_exact"),
        dProbeEst.as("d_probe_est"),
        est(col("_kb"), col("_kth_b")).as("d_build_est"),
        jacc.as("jaccard_est"),
        round(jacc * dUnionEst, 3).as("inter_est"),
        round(round(jacc * dUnionEst, 3) *
          (col("n_probe").cast("double") / dProbeEst), 3).as("join_est"),
        col("join_exact"))
  }

  /** Declarative row-constraint audit: `constraints` maps a name to a
    * VIOLATION predicate (write it null-safe — e.g.
    * `coalesce(!(col > 0), lit(true))` if a NULL should violate).
    * One scan, every constraint a conditional sum in a single
    * aggregate; the long-form report explodes from the one-row result.
    */
  def constraintAudit(df: DataFrame,
                      constraints: Seq[(String, Column)]): DataFrame = {
    require(constraints.nonEmpty, "need at least one constraint")
    val aggs = count(lit(1)).as("_n") +:
      constraints.map { case (name, viol) =>
        coalesce(sum(when(viol, 1L)), lit(0L)).as(s"_v_$name")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = constraints.map { case (name, _) =>
      struct(lit(name).as("constraint"), col(s"_v_$name").as("n_violations"))
    }
    one.select(col("_n"), explode(array(entries: _*)).as("e"))
      .select(
        col("e.constraint"),
        col("_n").as("n_rows"),
        col("e.n_violations"),
        round(col("e.n_violations").cast("double") / col("_n"), 6)
          .as("violation_frac"),
        (col("e.n_violations") === 0).as("ok"))
  }

  /** One claimed functional dependency `det → dep` over a frame. */
  case class FdCheck(name: String, df: DataFrame, detCol: String,
                     depCol: String)

  /** Functional-dependency audit (v7): for each claimed `det → dep`,
    * how many determinant keys map to MORE than one dependent value —
    * the schema-assumption check behind every "this column is derivable
    * from that one" denormalization, join collapse, or dimension
    * extraction; a violated FD silently duplicates or drops rows when
    * acted on.
    *
    * A NULL dependent counts as its own value class (a key mapping to
    * both 'x' and NULL is NOT functional), counted via a separate
    * null-presence flag so engines' differing COUNT(DISTINCT) null
    * rules cannot diverge.
    *
    * 100 TB shape: per check, one partial-agg collapse to (det,
    * variants) and a second to ONE summary row — output is |checks|
    * rows. Exact integer counts throughout.
    */
  def fdAudit(checks: Seq[FdCheck]): DataFrame = {
    require(checks.nonEmpty, "need at least one FD to audit")
    checks.map { c =>
      val perKey = c.df.filter(col(c.detCol).isNotNull)
        .groupBy(col(c.detCol))
        .agg((countDistinct(col(c.depCol)) +
          max(when(col(c.depCol).isNull, 1L).otherwise(0L)))
          .as("_v"))
      perKey.agg(
        lit(c.name).as("fd"),
        count(lit(1)).as("n_keys"),
        coalesce(sum(when(col("_v") > 1, 1L).otherwise(0L)), lit(0L))
          .as("n_violating_keys"),
        coalesce(max(col("_v")), lit(0L)).as("max_variants"))
        .withColumn("holds", col("n_violating_keys") === 0)
    }.reduce(_ unionAll _)
  }

  /** Benford first-digit audit (v6): the distribution of first
    * significant digits of a positive amount column against Benford's
    * law — the forensic-accounting screen for fabricated or
    * systematically rounded figures (organic multiplicative amounts
    * follow P(d) = log10(1 + 1/d); invented ones rarely do).
    *
    * First digits are extracted from the EXACT DECIMAL(38,6) string
    * form: cast to a fixed 6-dp decimal (identical half-up rounding in
    * both engines), render (exact — decimal formatting has no float
    * ambiguity), take the first `[1-9]` character. Correct for any
    * amount ≥ 1e-6 regardless of decimal places — the earlier
    * cents-scaling form misread >2-dp inputs and amounts whose
    * cents-rounding carried across a power of ten (0.095 → cents 10 →
    * digit 1 instead of 9). Amounts rounding to zero at 6 dp are
    * excluded with the non-positives (no significant digit to read).
    *
    * 100 TB shape: one conditional-aggregate collapse to 9 rows — the
    * scan is the whole cost. A digit-scaffold left join surfaces
    * zero-count digits. Chi-square terms are doubles over exact longs
    * and the 9-dp expected share, rounded once (6 dp).
    *
    * Returns (digit, n_obs, obs_share, exp_share, chi2_term) — the
    * statistic itself is `sum(chi2_term)`, left per-digit so the
    * audit shows WHICH digits deviate.
    */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // first significant digit over the DECIMAL(38,6) string — plain
    // positional notation (never E-notation), exact in both engines.
    // A translate+substring variant was A/B'd at r13 and is NOT
    // faster (Spark's per-row translate map ≈ the regex automaton);
    // rows whose magnitude overflows the decimal cast go NULL and
    // drop, matching the oracle's TRY_CAST.
    val firstSig = regexp_extract(
      col(valueCol).cast("decimal(38,6)").cast("string"), "[1-9]", 0)
    val counts = df
      .filter(col(valueCol).isNotNull && col(valueCol) > 0)
      .select(firstSig.as("_d"))
      .filter(col("_d") =!= "")
      .select(col("_d").cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val scaffold = (1 to 9).toDF("digit")
    val withN = scaffold
      .join(counts, Seq("digit"), "left_outer")
      .select(col("digit"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"))
      .crossJoin(broadcast(
        counts.agg(sum(col("n_obs")).as("_n"))))
    val expShare = round(log10(lit(1.0) + lit(1.0) / col("digit")), 9)
    val expN = col("_n").cast("double") * expShare
    withN.select(col("digit"), col("n_obs"),
      round(col("n_obs").cast("double") / col("_n"), 6).as("obs_share"),
      expShare.as("exp_share"),
      round((col("n_obs").cast("double") - expN) *
        (col("n_obs").cast("double") - expN) / expN, 6).as("chi2_term"))
  }

  /** Missingness co-occurrence audit (v10): for chosen column pairs,
    * does column b go null WITH column a — `P(b null | a null)`
    * against b's marginal null rate, their ratio in per-mille. v1
    * profiles each column's null rate alone; correlated missingness
    * is a different defect class (one broken client omitting two
    * fields TOGETHER, a join spraying aligned nulls, an ETL step
    * dropping a struct) and it's what makes "impute from the other
    * column" silently wrong. Lift ≫ 1000 says the nulls travel
    * together; ≈ 1000 says independent.
    *
    * ONE corpus pass: every marginal and pair counter is a
    * conditional sum in a single aggregate row (a 1-row broadcast
    * frame the per-pair projection reads), so auditing more pairs
    * adds counters, not scans. Internal counter aliases are keyed by
    * POSITION (`_na_<colIdx>`, `_nb_<pairIdx>`), never by the raw
    * column names — names containing underscores would otherwise
    * collide across pairs (("a_b","c") vs ("a","b_c")). Exact longs;
    * each rate is ONE truncating e9 division with the count widened
    * to DECIMAL(38,0) BEFORE the e9 multiply (a raw BIGINT product
    * wraps silently past ~9.2e9 matching rows); the per-mille lift
    * divides the two e9s (bounded ≤ 1e12 — safe in BIGINT). NULL
    * verdicts where undefined (no a-nulls, or b never null), never
    * NaN.
    */
  def missingnessAudit(df: DataFrame,
                       pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "need at least one column pair")
    val cols = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val colIdx = cols.zipWithIndex.toMap
    val aggs = cols.zipWithIndex.map { case (c, i) =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_na_$i") } ++
      pairs.zipWithIndex.map { case ((a, b), i) =>
        sum(when(col(a).isNull && col(b).isNull, 1L).otherwise(0L))
          .as(s"_nb_$i")
      }
    val m = graft.std.Materialize.once(
      df.agg(count(lit(1)).as("_n"), aggs: _*))
    pairs.zipWithIndex.map { case ((a, b), i) =>
      val (ia, ib) = (colIdx(a), colIdx(b))
      val cond = s"CASE WHEN _na_$ia > 0 THEN " +
        s"CAST(CAST(_nb_$i AS DECIMAL(38,0)) * 1000000000 " +
        s"div _na_$ia AS BIGINT) END"
      val marg = s"CASE WHEN _n > 0 THEN " +
        s"CAST(CAST(_na_$ib AS DECIMAL(38,0)) * 1000000000 " +
        s"div _n AS BIGINT) END"
      m.select(lit(a).as("col_a"), lit(b).as("col_b"),
        col("_n").as("n_rows"), col(s"_na_$ia").as("n_a_null"),
        col(s"_na_$ib").as("n_b_null"),
        col(s"_nb_$i").as("n_both_null"),
        expr(cond).as("cond_null_e9"),
        expr(marg).as("marginal_null_e9"),
        expr(s"CASE WHEN ($cond) IS NOT NULL AND ($marg) > 0 THEN " +
          s"CAST(($cond) * 1000 div ($marg) AS BIGINT) END")
          .as("lift_permille"))
    }.reduce(_ unionByName _)
  }
}
