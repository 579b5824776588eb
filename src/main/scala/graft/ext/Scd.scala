package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension maintenance: build SCD Type-2 validity
  * intervals from an observation log — the warehouse operation that
  * turns "we saw key K with value V at time T" streams into
  * (key, value, valid_from, valid_to, is_current) dimension rows.
  */
object Scd {

  /** SCD2 intervals from a change/observation log. Consecutive
    * observations of the SAME value collapse into one interval; a
    * value change closes the previous interval at the change's
    * timestamp (valid_to = next valid_from, half-open intervals) and
    * the latest interval per key is `is_current` with a NULL
    * valid_to.
    *
    * Determinism: observations order by (ts, tiebreakCol) — two
    * observations in the same instant resolve by the tiebreak, so the
    * interval set is identical across runs and engines.
    *
    * 100 TB shape: everything is windows partitioned by the dimension
    * KEY — one shuffle of (key, ts, value) triples, each key's history
    * processed independently (dimension histories are short; the fact
    * volume never enters — callers feed the OBSERVATION log, e.g. the
    * already-collapsed per-day attribute snapshot, not raw facts).
    */
  def scd2FromLog(log: DataFrame, keyCol: String, valueCol: String,
                  tsCol: String, tiebreakCol: String): DataFrame = {
    val byTime = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tiebreakCol).asc)
    // change points: first observation, or value differs from previous
    // (null-safe: a null value is a real observed state).
    // Observations with a NULL timestamp or tiebreak are dropped — they
    // have no place on a timeline, and the engines disagree on where
    // nulls sort (Spark first ascending, DuckDB last), so keeping them
    // would make the interval set engine-dependent.
    val flagged = log
      .filter(col(tsCol).isNotNull && col(tiebreakCol).isNotNull)
      .select(col(keyCol), col(valueCol), col(tsCol), col(tiebreakCol))
      .withColumn("_prev", lag(col(valueCol), 1).over(byTime))
      .withColumn("_first", row_number().over(byTime) === 1)
      .withColumn("_chg",
        col("_first") || !(col(valueCol) <=> col("_prev")))
      .filter(col("_chg"))
    // one row per (key, version): the change observation itself
    val byVersion = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tiebreakCol).asc)
    flagged
      .withColumn("valid_to", lead(col(tsCol), 1).over(byVersion))
      .withColumn("version", row_number().over(byVersion).cast("long"))
      .select(col(keyCol), col(valueCol), col("version"),
        col(tsCol).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** INCREMENTAL SCD2 maintenance: apply a batch of new observations to
    * an existing [[scd2FromLog]] dimension without touching closed
    * intervals — provably identical to rebuilding from the full log
    * (spec-pinned), the d9/s6 incremental discipline applied to
    * dimension management.
    *
    * Contract (the monitor rule): new observations at or before a
    * key's CURRENT interval start are late and dropped. A new
    * observation repeating the current value collapses into the
    * current interval; the first differing observation closes it.
    *
    * 100 TB shape: the batch joins the |keys|-sized current slice
    * (broadcast at dimension size), closed history streams through
    * untouched — per-increment work is O(batch + |keys|), never
    * O(history).
    */
  def scd2Merge(dim: DataFrame, newLog: DataFrame, keyCol: String,
                valueCol: String, tsCol: String,
                tiebreakCol: String): DataFrame = {
    val current = dim.filter(col("is_current")).select(
      col(keyCol), col(valueCol).as("_curv"),
      col("version").as("_curver"), col("valid_from").as("_curfrom"),
      lit(true).as("_hascur"))
    val byTime = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tiebreakCol).asc)
    val overKey = Window.partitionBy(col(keyCol))
    // in-window rows, flagged where the value differs from the current
    // interval's (every row differs when the key has no current row)
    val marked = newLog
      .filter(col(tsCol).isNotNull && col(tiebreakCol).isNotNull)
      .join(broadcast(current), Seq(keyCol), "left")
      .filter(col("_hascur").isNull || col(tsCol) > col("_curfrom"))
      .withColumn("_diff",
        when(col("_hascur").isNotNull, !(col(valueCol) <=> col("_curv")))
          .otherwise(lit(true)))
      .withColumn("_rn", row_number().over(byTime))
      .withColumn("_chg", min(when(col("_diff"), col("_rn"))).over(overKey))
    // the sub-log from the first change on rebuilds exactly like a
    // fresh log; versions continue from the current interval's
    val subLog = marked.filter(col("_rn") >= col("_chg"))
    val offsets = subLog.groupBy(col(keyCol))
      .agg(coalesce(first(col("_curver")), lit(0L)).as("_off"),
        min(col(tsCol)).as("_closets"))
    val grown = scd2FromLog(
      subLog.select(col(keyCol), col(valueCol), col(tsCol),
        col(tiebreakCol)),
      keyCol, valueCol, tsCol, tiebreakCol)
      .join(broadcast(offsets), Seq(keyCol))
      .withColumn("version", col("version") + col("_off"))
      .drop("_off", "_closets")
    // current rows: closed at the first change's timestamp, or carried
    val curOut = current.join(broadcast(offsets), Seq(keyCol), "left")
      .select(col(keyCol), col("_curv").as(valueCol),
        col("_curver").as("version"),
        col("_curfrom").as("valid_from"),
        col("_closets").as("valid_to"),
        col("_closets").isNull.as("is_current"))
    dim.filter(!col("is_current"))
      .unionByName(curOut)
      .unionByName(grown)
  }

  /** CDC changelog apply (x35): merge a batch of insert/update/delete
    * change rows into a base snapshot — the MERGE INTO / upsert
    * operation every incrementally-maintained 100-TB table needs
    * (ingest feeds, compaction of streaming appends, GDPR deletes).
    *
    * `changes` carries every `base` column plus `seqCol` (monotone
    * change sequence) and `opCol` ('I' | 'U' | 'D'). Per key the
    * HIGHEST sequence number wins (last-writer-wins); the winner then
    * decides the key's fate: 'D' removes the row, 'I'/'U' both upsert
    * the winner's payload (an update for an absent key inserts — the
    * order-free MERGE semantics, so replaying a log suffix is
    * idempotent). Keys never mentioned in the log pass through
    * untouched. Contract: per-key sequence numbers are unique (a log
    * that numbers two changes of one key identically is malformed);
    * ties nevertheless resolve deterministically by (seq DESC, op
    * DESC) so no input produces a nondeterministic table. A NULL op on
    * a winning row suppresses the base row but upserts nothing —
    * i.e. it degrades to a delete, never to an engine-dependent row.
    *
    * 100 TB shape: the expensive side is `base`; it is touched by ONE
    * left-anti join against the winner KEY SET — a single slim column,
    * broadcast by default (`hintBroadcastKeys`), so the base never
    * shuffles and the plan is scan → broadcast-anti → union. The
    * window that picks winners shuffles only the CHANGE BATCH by key —
    * O(batch), never O(base). Set `hintBroadcastKeys = false` when one
    * batch rewrites a large fraction of all keys; the planner then
    * falls back to a shuffle join, which is the right plan exactly
    * then.
    */
  def cdcApply(base: DataFrame, changes: DataFrame, keyCol: String,
               seqCol: String = "seq", opCol: String = "op",
               hintBroadcastKeys: Boolean = true): DataFrame = {
    val payload = base.columns.toSeq
    require(payload.contains(keyCol), s"base must carry $keyCol")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(seqCol).desc, col(opCol).desc)
    val winners = graft.std.Materialize.once(changes
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1))
    val keys = winners.select(col(keyCol))
    val kept = base.join(
      if (hintBroadcastKeys) broadcast(keys) else keys,
      Seq(keyCol), "left_anti")
    val upserts = winners
      .filter(coalesce(col(opCol) =!= lit("D"), lit(false)))
      .select(payload.map(col): _*)
    kept.unionByName(upserts)
  }
}
