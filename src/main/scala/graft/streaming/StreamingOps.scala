package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed rows for the custom-state operator. */
case class UserEvent(user_id: Long, value: Double)
case class UserTotals(user_id: Long, n_events: Long, sum_value: Double)

/** Typed rows/state for the streaming KMV cardinality sketch. */
case class LangHash(lang: String, h: Long)
case class KmvSketch(mins: List[Long], seen: Long)
case class KmvEstimate(lang: String, k_used: Long, est_distinct: Double,
                       n_hashes_seen: Long)

/** Typed rows/state for the streaming bloom dedup. */
case class BloomedDoc(doc_id: Long, shard: Int, h: Long)
case class BloomShardState(bits: Array[Byte], n_inserted: Long)
case class BloomSeen(doc_id: Long, probably_seen: Boolean)

/** Typed rows/state for the streaming anomaly monitor. */
case class KeyedHourEvent(key: String, hourMs: Long)
case class AnomalyState(ring: List[(Long, Long)], open: Map[Long, Long])
case class AnomalyVerdict(key: String, hour: java.sql.Timestamp, n: Long,
                          trailing_mean: Double, zscore: Option[Double],
                          is_anomaly: Boolean)

/** Typed rows/state for the streaming funnel. */
case class FunnelEvent(user_id: Long, event_type: String,
                       ts: java.sql.Timestamp)
case class FunnelState(firstClick: Option[Long], converted: Boolean,
                       pendingPurchases: List[Long])
case class FunnelTransition(user_id: Long, stage: String)

/** Typed rows/state for the streaming transition feed. */
case class TransEvent(user_id: Long, event_type: String,
                      ts: java.sql.Timestamp, event_id: Long)
case class TransState(lastTs: Long, lastId: Long, lastType: String)
case class TransPair(prev_type: String, next_type: String)

/** Typed rows/state for the streaming as-of enrichment. */
case class GapEvent(user_id: Long, ts: java.sql.Timestamp,
                    event_id: Long)
case class GapState(lastTsMs: Long, lastId: Long)
case class GapPair(user_id: Long, gap_s: Long)

case class AsofEvent(user_id: Long, event_type: String,
                     ts: java.sql.Timestamp, event_id: Long)
case class AsofState(lastRightUs: Long)
case class AsofHit(event_id: Long, user_id: Long,
                   event_ts: java.sql.Timestamp,
                   asof_ts: Option[java.sql.Timestamp])

/** Typed rows/state for the streaming sequence scorer. */
case class SeqEvent(user_id: Long, event_type: String,
                    ts: java.sql.Timestamp, event_id: Long)
case class SeqScoreState(lastTs: Long, lastId: Long, lastType: String,
                         n: Long, sumE9: Long)
case class SeqScore(user_id: Long, n_pairs: Long, avg_logprob: Double)

/** Typed rows/state for the streaming EWMA feed. */
case class EwmaDaily(series: String, day: java.sql.Date, n_events: Long,
                     value_micro: Long, day_ts: java.sql.Timestamp)
case class EwmaState(lastDayMs: Long, ewmaMicro: Long)
case class EwmaPoint(series: String, day: java.sql.Date, n_events: Long,
                     value_micro: Long, ewma_micro: Long)

/** Typed rows/state for the streaming Holt trend feed (input rows
  * reuse [[EwmaDaily]] — the two feeds consume the same daily
  * collapse).
  */
case class HoltState(lastDayMs: Long, levelMicro: Long,
                     trendMicro: Long)
case class HoltPoint(series: String, day: java.sql.Date, n_events: Long,
                     value_micro: Long, level_micro: Long,
                     trend_micro: Long, forecast_micro: Option[Long],
                     residual_micro: Option[Long])

/** Typed rows/state for the streaming weighted sample. */
case class WeightedRow(g: String, id: Long, w: Double, key: Double)
case class SampleHeap(entries: List[(Double, Long, Double)], seen: Long)
case class SampleMember(g: String, id: Long, w: Double, sample_key: Double,
                        n_seen: Long)

/** Event-stream window aggregations (extension target — the reference
  * has no streaming at all, SURVEY §2.8). The aggregation bodies are
  * plain DataFrame code, so the SAME function serves batch (oracle-
  * checkable against DuckDB `time_bucket`) and Structured Streaming
  * (applied after `readStream` + [[withWatermarked]]) — the point of
  * DataFrame-first design.
  *
  * Scale: tumbling/sliding windows shuffle on (window, type) — bounded
  * key space, partial aggregation absorbs volume. Session windows key on
  * (user_id, session) — Spark's `session_window` state store handles the
  * merge; watermark bounds state size.
  */
object StreamingOps {

  /** Attach the watermark used by every streaming variant. */
  def withWatermarked(events: DataFrame, delay: String = "2 hours"): DataFrame =
    events.withWatermark("ts", delay)

  /** Tumbling 1-hour windows by event type. */
  def hourlyByType(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Sliding 1-hour windows every 30 minutes (each event lands in 2). */
  def slidingHourly(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("n_events"), col("sum_value"))

  /** Custom streaming state via `flatMapGroupsWithState`: running
    * per-user totals that survive across micro-batches (the
    * `KeyValueGroupedDataset` state-store path the built-in aggregates
    * can't express when update logic is arbitrary). Works identically on
    * a batch Dataset (one pass, empty initial state) — tested for
    * equivalence with the plain groupBy aggregate.
    */
  def runningUserTotals(events: DataFrame): Dataset[UserTotals] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("value")).as[UserEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserTotals, UserTotals](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[UserEvent], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(uid, 0L, 0.0))
          var n = prev.n_events
          var s = prev.sum_value
          rows.foreach { e => n += 1; s += e.value }
          val next = UserTotals(uid, n, s)
          state.update(next)
          Iterator.single(next)
      }
  }

  /** Streaming KMV distinct-token cardinality — the running form of
    * [[graft.ext.TextAnalysis.kmvCardinality]]: per-language bottom-k
    * state folded across micro-batches via `mapGroupsWithState`, one
    * updated estimate row per language per trigger. The sketch's
    * shard-merge property (bottom-k of a union = bottom-k of the
    * bottom-ks, proven in `CorpusStatsSpec`) is exactly what makes the
    * state fold correct regardless of how documents split across
    * micro-batches.
    *
    * State is O(k) longs per language — bounded forever, no watermark
    * needed (the sketch only shrinks toward smaller hashes).
    * `n_hashes_seen` is cumulative and strictly increasing per updated
    * group, so "latest row per language" is selectable downstream.
    * Works identically on a batch Dataset (one pass, empty state) —
    * the estimate then equals the batch operator's (same rounding).
    */
  def kmvCardinalityStream(docs: DataFrame, k: Int = 256):
      Dataset[KmvEstimate] = {
    require(k >= 2, "KMV needs k >= 2 for the (k-1)/U estimator")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("lang"),
        explode(graft.ext.TextOps.tokens(col("text"))).as("_t"))
      .select(col("lang"), graft.ext.TextOps.hash64(col("_t")).as("h"))
      .as[LangHash]
      .groupByKey(_.lang)
      .mapGroupsWithState[KmvSketch, KmvEstimate](
        GroupStateTimeout.NoTimeout) {
        (lang: String, rows: Iterator[LangHash],
         state: GroupState[KmvSketch]) =>
          // bounded fold: a TreeSet capped at k — never holds the
          // micro-batch, only the running bottom-k (set semantics
          // absorb duplicate hashes, mirroring the batch op's distinct)
          val mins = scala.collection.mutable.TreeSet.empty[Long]
          state.getOption.foreach(s => mins ++= s.mins)
          var seen = 0L
          rows.foreach { r =>
            seen += 1
            if (mins.size < k) mins += r.h
            else if (r.h < mins.last) {
              mins += r.h
              if (mins.size > k) mins -= mins.last
            }
          }
          val totalSeen = state.getOption.map(_.seen).getOrElse(0L) + seen
          state.update(KmvSketch(mins.toList, totalSeen))
          val kUsed = mins.size.toLong
          // identical arithmetic + rounding to the batch operator
          val est =
            if (kUsed < k) kUsed.toDouble
            else java.math.BigDecimal.valueOf(
              (kUsed - 1).toDouble / (mins.last.toDouble / math.pow(2.0, 56)))
              .setScale(3, java.math.RoundingMode.HALF_UP).doubleValue()
          KmvEstimate(lang, kUsed, est, totalSeen)
      }
  }

  /** Standing weighted sample: the [[graft.std.Sampling]] draw kept
    * live over a stream — per group, the current top-`nPerGroup` rows
    * by the deterministic Efraimidis–Spirakis key, folded across
    * micro-batches via `flatMapGroupsWithState`. The crawl-pipeline
    * use: maintain a quality-weighted per-domain sample of everything
    * ingested so far without ever re-scanning the corpus.
    *
    * Why the fold is exact: the draw is a pure per-row function (the
    * md5-lane uniform), and "top-n of a union = top-n of top-ns" — the
    * same bounded-merge property [[graft.functions.TopSample]] relies
    * on — so ANY split of the rows into micro-batches yields the same
    * standing sample as one batch pass (`StreamingEquivalenceSpec`).
    *
    * State is O(nPerGroup) per group — bounded forever, no watermark
    * (a new row either displaces the current minimum or is dropped).
    * Each trigger re-emits the group's full current sample (Update
    * mode) tagged with the cumulative `n_seen`, strictly increasing
    * per group, so "latest sample per group" is selectable downstream
    * exactly like [[kmvCardinalityStream]]'s estimates. Rows with
    * null/non-positive weights are rejected upstream of the state op,
    * as in the batch form.
    */
  def weightedSampleStream(rows: DataFrame, groupCol: String,
                           idCol: String, weightCol: String,
                           nPerGroup: Int): Dataset[SampleMember] = {
    require(nPerGroup >= 1, "need a positive per-group sample size")
    val spark = rows.sparkSession
    import spark.implicits._
    import graft.functions.TopSample
    rows.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .select(col(groupCol).cast("string").as("g"),
        col(idCol).cast("long").as("id"),
        col(weightCol).cast("double").as("w"),
        graft.std.Sampling.esKey(col(idCol), col(weightCol)).as("key"))
      .as[WeightedRow]
      .groupByKey(_.g)
      .flatMapGroupsWithState[SampleHeap, SampleMember](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (g: String, it: Iterator[WeightedRow],
         state: GroupState[SampleHeap]) =>
          val heap = new java.util.TreeSet[TopSample.Entry](TopSample.order)
          def add(e: TopSample.Entry): Unit = {
            if (heap.size < nPerGroup) { heap.add(e); () }
            else if (TopSample.order.compare(e, heap.last()) < 0) {
              if (heap.add(e) && heap.size > nPerGroup) {
                heap.remove(heap.last()); ()
              }
            }
          }
          state.getOption.foreach(_.entries.foreach { case (k, id, w) =>
            add(TopSample.Entry(k, id, w, hasPayload = true))
          })
          var seen = state.getOption.map(_.seen).getOrElse(0L)
          it.foreach { r =>
            seen += 1
            add(TopSample.Entry(r.key, r.id, r.w, hasPayload = true))
          }
          val entries = {
            val b = List.newBuilder[(Double, Long, Double)]
            val hit = heap.iterator()
            while (hit.hasNext) {
              val e = hit.next(); b += ((e.key, e.id, e.payload))
            }
            b.result()
          }
          state.update(SampleHeap(entries, seen))
          entries.iterator.map { case (k, id, w) =>
            SampleMember(g, id, w, k, seen)
          }
      }
  }

  /** Click→purchase conversion funnel: users who clicked, users whose
    * first click was followed by a purchase within the hour, and the
    * conversion share. Two filtered aggregates and one equi-join on
    * user_id — shuffle keys are user ids, partial aggregation bounds
    * the volume; no window over the raw stream.
    *
    * BATCH form only (unlike [[dedupedEvents]], which branches): the
    * materialize pin, the two separate final aggregates, and the cross
    * join all reject a streaming frame at plan time anyway — this guard
    * turns that late plan error into an immediate, named one. The
    * streaming shape would be one watermarked `flatMapGroupsWithState`
    * over user_id emitting (clicked, converted) state transitions.
    */
  def clickFunnel(events: DataFrame): DataFrame = {
    require(!events.isStreaming,
      "clickFunnel is the batch form — for a stream, aggregate " +
        "per-user funnel state with flatMapGroupsWithState instead")
    // pinned: feeds both the conversion join and the n_clickers count
    val firstClick = graft.std.Materialize.once(
      events.filter(col("event_type") === "click")
        .groupBy(col("user_id")).agg(min(col("ts")).as("_first_click")))
    val converted = firstClick
      .join(events.filter(col("event_type") === "purchase"), Seq("user_id"))
      .filter(col("ts") >= col("_first_click") &&
        col("ts") <= col("_first_click") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id")).distinct()
      .agg(count(lit(1)).as("n_converted"))
    firstClick.agg(count(lit(1)).as("n_clickers"))
      .crossJoin(converted)
      .select(col("n_clickers"), col("n_converted"),
        round(col("n_converted").cast("double") / col("n_clickers"), 6)
          .as("conversion_rate"))
  }

  /** The STREAMING funnel shape [[clickFunnel]]'s scaladoc promises:
    * per-user conversion state via `flatMapGroupsWithState`, emitting a
    * `clicked` transition on the user's first click and a `converted`
    * transition on the first purchase within `windowMs` of it. The
    * batch summary is then `transitions.groupBy(stage).count()`; on a
    * stream the same call emits transitions incrementally per
    * micro-batch (Append mode).
    *
    * Out-of-order handling: rows WITHIN a micro-batch are sorted by
    * event time before folding; a purchase that ARRIVES before its
    * user's first click is buffered in state (bounded: latest 64) and
    * replayed when the click lands, so cross-batch purchase-first
    * arrival still converts. Known approximation (documented, not
    * silent): the anchor is the first click SEEN — a later-arriving
    * click with an earlier event time does not re-anchor the window
    * (exact re-anchoring needs full-event buffering until the
    * watermark; the state here stays O(1) per user).
    *
    * State is BOUNDED on a stream: a `stateRetention` watermark is
    * attached and each user's state carries an event-time timeout past
    * its last activity + the conversion window — idle users (incl. the
    * purchase-only buffers) are evicted instead of accumulating
    * forever. Batch execution has no timeouts (nor a need: the state
    * dies with the single batch).
    */
  def funnelTransitions(events: DataFrame,
                        windowMs: Long = 3600L * 1000,
                        stateRetention: String = "24 hours"): Dataset[FunnelTransition] = {
    val spark = events.sparkSession
    import spark.implicits._
    val streaming = events.isStreaming
    val src = if (streaming) events.withWatermark("ts", stateRetention)
      else events
    val timeoutConf = if (streaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    src.select(col("user_id"), col("event_type"), col("ts")).as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelTransition](
        OutputMode.Append, timeoutConf) {
        (uid: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(FunnelState(None, false, Nil))
            val out = scala.collection.mutable.ListBuffer.empty[FunnelTransition]
            def convert(): Unit = {
              st = st.copy(converted = true, pendingPurchases = Nil)
              out += FunnelTransition(uid, "converted")
            }
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            sorted.foreach { e =>
              val t = e.ts.getTime
              e.event_type match {
                case "click" if st.firstClick.isEmpty =>
                  st = st.copy(firstClick = Some(t))
                  out += FunnelTransition(uid, "clicked")
                  if (!st.converted &&
                    st.pendingPurchases.exists(p => p >= t && p <= t + windowMs))
                    convert()
                case "purchase" if !st.converted =>
                  st.firstClick match {
                    case Some(fc) if t >= fc && t <= fc + windowMs => convert()
                    case None =>
                      st = st.copy(
                        pendingPurchases = (t :: st.pendingPurchases).take(64))
                    case _ => ()
                  }
                case _ => ()
              }
            }
            state.update(st)
            if (streaming) {
              // evict once the watermark passes last activity + window
              // (timeout timestamps must sit above the current watermark)
              val lastTs = sorted.lastOption.map(_.ts.getTime).getOrElse(0L)
              state.setTimeoutTimestamp(
                math.max(lastTs, state.getCurrentWatermarkMs() + 1) + windowMs)
            }
            out.iterator
          }
      }
  }

  /** Per-user successor pairs as a STREAMING feed (w8): the stateful
    * form of [[graft.ext.Timeseries.transitionMatrix]]'s lead window —
    * each user's state is its LAST event (O(1) per user, the smallest
    * state any sequence operator can carry), and every arriving event
    * emits one (prev_type, next_type) pair against it. The matrix
    * itself is [[transitionRollup]] downstream — the same two-stage
    * split as the journey pipeline (Spark does not chain a stateful
    * operator and an aggregation with a window in one streaming
    * query).
    *
    * Batch execution sorts each user's full partition by the
    * (ts, event_id) total order, so batch output ≡ the x47 lead-window
    * pairs exactly (spec-pinned). On a stream, rows WITHIN a
    * micro-batch sort the same way; ACROSS batches the pair follows
    * arrival order — a later-arriving event with an earlier event time
    * pairs after the stored last event (the [[funnelTransitions]]
    * approximation, documented not silent: exact reordering needs
    * full-event buffering to the watermark, this state stays O(1)).
    * Idle users evict once the watermark passes `evictAfterMs` past
    * their last activity.
    */
  def transitionPairs(events: DataFrame,
                      stateRetention: String = "24 hours",
                      evictAfterMs: Long = 24L * 3600 * 1000)
      : Dataset[TransPair] = {
    val spark = events.sparkSession
    import spark.implicits._
    val streaming = events.isStreaming
    val src = if (streaming) events.withWatermark("ts", stateRetention)
      else events
    val timeoutConf = if (streaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    src
      // event_id non-null too (it lands in a non-nullable state
      // field); the batch lead-window twin filters identically, so
      // the two forms accept the same inputs
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull && col("event_id").isNotNull)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .as[TransEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TransState, TransPair](
        OutputMode.Append, timeoutConf) {
        (_: Long, rows: Iterator[TransEvent], state: GroupState[TransState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val out = scala.collection.mutable.ListBuffer.empty[TransPair]
            var st = state.getOption
            sorted.foreach { e =>
              st.foreach(s => out += TransPair(s.lastType, e.event_type))
              st = Some(TransState(e.ts.getTime, e.event_id, e.event_type))
            }
            st.foreach(state.update)
            if (streaming && sorted.nonEmpty)
              state.setTimeoutTimestamp(
                math.max(sorted.last.ts.getTime,
                  state.getCurrentWatermarkMs() + 1) + evictAfterMs)
            out.iterator
          }
      }
  }

  /** Per-user inter-arrival gaps as a STREAMING feed (w11): the
    * stateful form of [[graft.ext.Timeseries.cadenceProfile]]'s lag
    * window — each user's state is ONE timestamp + tiebreak (the w9
    * 8-byte-per-user discipline), every arriving event emits one
    * whole-second gap against it. The cadence readout itself is
    * [[graft.ext.Timeseries.cadenceRollup]] downstream — the
    * two-stage split (w8/w10 pattern), because the median windows
    * aren't streamable but the GAP EXTRACTION (the corpus-sized part)
    * is. Gaps floor to epoch seconds exactly like the batch form's
    * `unix_timestamp` difference (`floorDiv(ms, 1000)` — identical on
    * every ms the encoder can carry).
    *
    * Batch execution sorts each user's partition by (ts, event_id),
    * so batch output ≡ the x51 lag-window gaps exactly — the w11
    * query shares x51's oracle verbatim; the equality IS the gate.
    * The w8 cross-batch arrival-order caveat and eviction contract
    * apply on real streams.
    */
  def gapPairs(events: DataFrame,
               stateRetention: String = "24 hours",
               evictAfterMs: Long = 24L * 3600 * 1000)
      : Dataset[GapPair] = {
    val spark = events.sparkSession
    import spark.implicits._
    val streaming = events.isStreaming
    val src = if (streaming) events.withWatermark("ts", stateRetention)
      else events
    val timeoutConf = if (streaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    src
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_id").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"))
      .as[GapEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[GapState, GapPair](
        OutputMode.Append, timeoutConf) {
        (user: Long, rows: Iterator[GapEvent], state: GroupState[GapState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val out = scala.collection.mutable.ListBuffer.empty[GapPair]
            var st = state.getOption
            sorted.foreach { e =>
              st.foreach { s =>
                out += GapPair(user,
                  Math.floorDiv(e.ts.getTime, 1000L) -
                    Math.floorDiv(s.lastTsMs, 1000L))
              }
              st = Some(GapState(e.ts.getTime, e.event_id))
            }
            st.foreach(state.update)
            if (streaming && sorted.nonEmpty)
              state.setTimeoutTimestamp(
                math.max(sorted.last.ts.getTime,
                  state.getCurrentWatermarkMs() + 1) + evictAfterMs)
            out.iterator
          }
      }
  }

  /** STREAMING sequence scorer (w10): the production deployment of
    * [[graft.ext.Timeseries.sequenceLikelihood]] — the transition
    * matrix is fit OFFLINE and shipped as a model artifact (a
    * `(prev, next) → ln P` map, |event types|² entries, broadcast in
    * the closure exactly like t33's weight table), and the stream
    * keeps one O(1) state per user: last event + running
    * (n_pairs, Σ contrib) with each contribution an EXACT e9-scaled
    * long (9-dp ln × 1e9 — integer addition is order-free, so the
    * running sum equals the batch DECIMAL sum bit for bit). Each
    * micro-batch appends every touched user's updated running
    * average — the live bot/order-anomaly score.
    *
    * Batch execution processes each user's whole (ts, event_id)-
    * ordered history in one call and emits ONE row per user ≡ the
    * x49 aggregate before its bottom-k cut (spec-pinned; the w10
    * oracle is x49's SQL minus the LIMIT). Pairs absent from the
    * matrix are skipped (the x49 inner join's semantics). The w8
    * cross-batch arrival-order caveat and eviction contract apply.
    */
  def sequenceScoreStream(events: DataFrame,
                          logprobE9: Map[(String, String), Long],
                          stateRetention: String = "24 hours",
                          evictAfterMs: Long = 24L * 3600 * 1000)
      : Dataset[SeqScore] = {
    val spark = events.sparkSession
    import spark.implicits._
    val streaming = events.isStreaming
    val src = if (streaming) events.withWatermark("ts", stateRetention)
      else events
    val timeoutConf = if (streaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    src
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull && col("event_id").isNotNull)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .as[SeqEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SeqScoreState, SeqScore](
        OutputMode.Append, timeoutConf) {
        (uid: Long, rows: Iterator[SeqEvent],
         state: GroupState[SeqScoreState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            def micros(t: java.sql.Timestamp): Long =
              t.getTime * 1000 + (t.getNanos % 1000000) / 1000
            val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            var st = state.getOption
            sorted.foreach { e =>
              val (n0, s0) = st.map(s => (s.n, s.sumE9)).getOrElse((0L, 0L))
              val (n1, s1) = st.flatMap(s =>
                logprobE9.get((s.lastType, e.event_type))) match {
                case Some(c) => (n0 + 1, s0 + c)
                case None => (n0, s0)
              }
              st = Some(SeqScoreState(micros(e.ts), e.event_id,
                e.event_type, n1, s1))
            }
            st.foreach(state.update)
            if (streaming && sorted.nonEmpty)
              state.setTimeoutTimestamp(
                math.max(sorted.last.ts.getTime,
                  state.getCurrentWatermarkMs() + 1) + evictAfterMs)
            st match {
              case Some(s) if s.n > 0 && sorted.nonEmpty =>
                val avg = BigDecimal(s.sumE9.toDouble / 1e9 / s.n)
                  .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
                Iterator.single(SeqScore(uid, s.n, avg))
              case _ => Iterator.empty
            }
          }
      }
  }

  /** STREAMING as-of enrichment (w9): the stateful form of
    * [[graft.ext.TemporalJoins.asOfLast]]'s running-`last` window —
    * each `leftType` event is stamped with the latest PRECEDING
    * `rightType` event time of the same user. Per-user state is ONE
    * timestamp (the newest `rightType` seen), the smallest state an
    * as-of join can carry; the window form needs the user's whole
    * history co-located, this needs 8 bytes per live user.
    *
    * Batch execution sorts each user's partition by the (ts, event_id)
    * total order, so batch output ≡ the x3 window form exactly
    * (spec-pinned, and w9 shares x3's DuckDB oracle verbatim). On a
    * stream the [[transitionPairs]] caveats apply move for move:
    * within a micro-batch rows sort the same way, across batches the
    * stamp follows arrival order (exact reordering would buffer to
    * the watermark; this state stays O(1)), and idle users evict once
    * the watermark passes `evictAfterMs` beyond their last activity.
    * Null keys/timestamps are filtered up front on BOTH forms' input
    * contract (the w8 lesson: the stateful encoder rejects what the
    * window form would tolerate — make the filter explicit and
    * shared).
    */
  def asofPairs(events: DataFrame, leftType: String = "error",
                rightType: String = "signup",
                stateRetention: String = "24 hours",
                evictAfterMs: Long = 24L * 3600 * 1000)
      : Dataset[AsofHit] = {
    val spark = events.sparkSession
    import spark.implicits._
    val streaming = events.isStreaming
    val src = if (streaming) events.withWatermark("ts", stateRetention)
      else events
    val timeoutConf = if (streaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    src
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull && col("event_id").isNotNull)
      .filter(col("event_type").isin(leftType, rightType))
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .as[AsofEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofState, AsofHit](
        OutputMode.Append, timeoutConf) {
        (_: Long, rows: Iterator[AsofEvent], state: GroupState[AsofState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // event times carry MICROSECONDS: state and the sort key
            // ride exact micros (Timestamp.getTime alone truncates to
            // millis — enough to order w8's pairs, not to REPRODUCE a
            // timestamp value the x3 oracle compares byte-for-byte)
            def micros(t: java.sql.Timestamp): Long =
              t.getTime * 1000 + (t.getNanos % 1000000) / 1000
            val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            val out = scala.collection.mutable.ListBuffer.empty[AsofHit]
            var st = state.getOption
            sorted.foreach { e =>
              // a right-type row at the same instant sorts by event_id:
              // the shared total order decides whether it precedes
              if (e.event_type == rightType)
                st = Some(AsofState(micros(e.ts)))
              else
                out += AsofHit(e.event_id, e.user_id, e.ts,
                  st.map { s =>
                    val t = new java.sql.Timestamp(s.lastRightUs / 1000)
                    t.setNanos((s.lastRightUs % 1000000).toInt * 1000)
                    t
                  })
            }
            st.foreach(state.update)
            if (streaming && sorted.nonEmpty)
              state.setTimeoutTimestamp(
                math.max(sorted.last.ts.getTime,
                  state.getCurrentWatermarkMs() + 1) + evictAfterMs)
            out.iterator
          }
      }
  }

  /** The matrix rollup downstream of [[transitionPairs]] — the SAME
    * code as the x47 batch tail ([[graft.ext.Timeseries
    * .transitionRollup]]), re-exported here so the streaming pipeline
    * reads whole at the call site.
    */
  def transitionRollup(pairs: DataFrame): DataFrame =
    graft.ext.Timeseries.transitionRollup(pairs)

  /** The STREAMING form of [[graft.ext.Timeseries.hourlyAnomalies]]:
    * per-key state holds the trailing `trailing` CLOSED hourly counts
    * (a ring) plus the still-open frontier hour; when a later hour
    * arrives, every earlier open hour closes, gets z-scored against the
    * ring with the IDENTICAL arithmetic and rounding as the batch
    * operator, and joins the ring. A monitor never scores an hour still
    * in flight — so on a bounded input the stream emits exactly the
    * batch verdicts for all hours before each key's final (open) one.
    *
    * State is BOUNDED: `trailing` ring pairs + one open hour per key,
    * forever, no timeout needed (the ring only rotates). Late events
    * for an already-closed hour are DROPPED — same bound the watermark
    * enforces for built-in windows; the 2-hour watermark attached on
    * streams keeps Spark's own bookkeeping consistent with that rule.
    * Micro-batch rows fold into per-hour counts as they stream past
    * (O(hours-in-batch) memory, never the rows).
    */
  def anomalyStream(events: DataFrame, trailing: Int = 24,
                    zThreshold: Double = 3.0, tsCol: String = "ts",
                    keyCol: String = "event_type"): Dataset[AnomalyVerdict] = {
    require(trailing >= 2, "need at least 2 trailing observations")
    val spark = events.sparkSession
    import spark.implicits._
    def round6(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val src = if (events.isStreaming) withWatermarked(events) else events
    // a NULL timestamp has no hour: drop it BEFORE the non-nullable
    // decode (the bloomDedupStream lesson — one null row must not kill
    // a forever-running monitor), and normalize a NULL key to "" so it
    // monitors as its own series instead of crashing groupByKey
    src.filter(col(tsCol).isNotNull)
      .select(coalesce(col(keyCol), lit("")).as("key"),
        (date_trunc("hour", col(tsCol)).cast("long") * 1000L).as("hourMs"))
      .as[KeyedHourEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState[AnomalyState, AnomalyVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[KeyedHourEvent],
         state: GroupState[AnomalyState]) =>
          val st = state.getOption.getOrElse(AnomalyState(Nil, Map.empty))
          val lastClosed = st.ring.lastOption.map(_._1).getOrElse(Long.MinValue)
          val merged = scala.collection.mutable.Map.empty[Long, Long]
          st.open.foreach { case (h, n) => merged(h) = n }
          rows.foreach { r =>
            // late-beyond-frontier rows dropped (see scaladoc)
            if (r.hourMs > lastClosed)
              merged(r.hourMs) = merged.getOrElse(r.hourMs, 0L) + 1L
          }
          val out = scala.collection.mutable.ListBuffer.empty[AnomalyVerdict]
          if (merged.nonEmpty) {
            val frontier = merged.keys.max
            var ring = st.ring
            merged.keys.filter(_ < frontier).toSeq.sorted.foreach { h =>
              val n = merged.remove(h).get
              if (ring.size == trailing) {
                // identical expression tree to the batch operator
                val s = ring.iterator.map(_._2).sum
                val ss = ring.iterator.map(c => c._2 * c._2).sum
                val t = trailing.toDouble
                val mean = s.toDouble / t
                val variance =
                  (ss.toDouble - s.toDouble * s.toDouble / t) /
                    (trailing - 1).toDouble
                val z = if (variance > 0)
                  Some(round6((n.toDouble - mean) / math.sqrt(variance)))
                else None
                out += AnomalyVerdict(key, new java.sql.Timestamp(h), n,
                  round6(mean), z,
                  z.exists(zz => zz >= zThreshold || zz <= -zThreshold))
              }
              ring = (ring :+ ((h, n))).takeRight(trailing)
            }
            state.update(AnomalyState(ring, merged.toMap))
          } else state.update(st)
          out.iterator
      }
  }

  /** Streaming exact dedup on a content key: keep the first arrival of
    * each `(event_type, user_id, value)` combination, dropping later
    * duplicates for as long as the watermark keeps their key in the
    * state store (`dropDuplicatesWithinWatermark` — the streaming
    * counterpart of [[graft.ext.Dedup.dropExactDuplicates]]; a batch
    * frame takes the plain bounded-state-free `dropDuplicates`). At
    * scale the state store holds one entry per distinct key inside the
    * watermark horizon — bounded by the delay, not the stream length.
    */
  def dedupedEvents(events: DataFrame): DataFrame = {
    // JSON-encode the key fields: nulls drop the field NAME (so a null
    // in one column can never collide with a value in another) and
    // string values are quoted/escaped (a '|' in the data can't fake a
    // separator) — concat_ws would silently skip nulls and merge
    // distinct events onto one key
    val keyed = events.withColumn("dedup_key",
      md5(to_json(struct(col("event_type"), col("user_id"), col("value")))))
    if (events.isStreaming) keyed.dropDuplicatesWithinWatermark("dedup_key")
    else keyed.dropDuplicates("dedup_key")
  }

  /** Bounded-memory FOREVER-window approximate dedup: every incoming
    * document is tagged `probably_seen` against a sharded
    * [[graft.functions.BloomBits]] bloom filter accumulated in stream
    * state. The complement of [[dedupedEvents]]: that one is EXACT but
    * only within the watermark horizon (state grows with distinct keys
    * inside the window); this one never forgets and never grows — state
    * is `shards × m/8` bytes for the stream's lifetime, the trade being
    * a one-sided false-positive rate (a `probably_seen=false` verdict
    * is definitive; `true` may be a collision, at the engineered rate).
    * That is the production pattern for "have we EVER crawled this?"
    * over unbounded corpus history.
    *
    * Sharding: content hashes group by `h % shards`, each shard owning
    * an independent filter — state update parallelism without a global
    * bottleneck task; at scale `shards` is sized to executor count.
    * Within a micro-batch each shard processes rows in doc_id order, so
    * an intra-batch duplicate pair resolves deterministically (the
    * lower doc_id inserts, the higher one reports seen). No watermark
    * and no timeout — forgetting is exactly what this operator refuses
    * to do. Works identically on a batch frame (one batch, empty
    * initial state).
    */
  def bloomDedupStream(docs: DataFrame, m: Int = 1 << 16, k: Int = 4,
                       shards: Int = 8): Dataset[BloomSeen] =
    // null text coalesces to "" before hashing (the t28 segment rule):
    // a null-text crawl record must not poison the forever-running
    // stream — hash64(normText(null)) is null, and decoding that into
    // BloomedDoc's non-nullable Long would fail the micro-batch
    bloomSeenByHash(
      docs.select(col("doc_id"),
        graft.ext.TextOps.hash64(
          graft.ext.TextOps.normText(coalesce(col("text"), lit(""))))
          .as("h")),
      m, k, shards)

  /** [[bloomDedupStream]] keyed on the CANONICAL URL instead of the
    * content hash — "have we EVER fetched this address?", the crawl-
    * frontier filter that runs ahead of the fetch itself (t45's batch
    * dedup as a forever-window stream). Raw variants that normalize to
    * the same [[graft.ext.Web.canonicalUrl]] form (tracking params,
    * host case, default port, fragment, trailing slash) dedup against
    * each other; a NULL url hashes as empty and dedups with other
    * nulls rather than failing the stream. Same state bound: `shards ×
    * m/8` bytes forever.
    */
  def urlDedupStream(docs: DataFrame, urlCol: String = "url",
                     m: Int = 1 << 16, k: Int = 4,
                     shards: Int = 8): Dataset[BloomSeen] =
    bloomSeenByHash(
      docs.select(col("doc_id"),
        graft.ext.TextOps.hash64(
          coalesce(graft.ext.Web.canonicalUrl(col(urlCol)), lit("")))
          .as("h")),
      m, k, shards)

  /** Shared forever-window membership kernel over a prepared
    * (doc_id, h) frame — `h` non-null (callers coalesce their key to a
    * sentinel first).
    */
  private def bloomSeenByHash(keyed: DataFrame, m: Int, k: Int,
                              shards: Int): Dataset[BloomSeen] = {
    require(shards >= 1, "at least one shard")
    // same bounds the BloomBits aggregate enforces — a non-byte-aligned
    // m would allocate m/8 (floored) bytes and index past the end on a
    // fraction of hashes, failing the query only after state committed
    require(m >= 64 && m <= (1 << 26) && m % 8 == 0,
      s"bloom m must be in [64, 2^26] and byte-aligned, got $m")
    require(k >= 1 && k <= 16, s"bloom k must be in [1, 16], got $k")
    val spark = keyed.sparkSession
    import spark.implicits._
    keyed
      .select(col("doc_id"), (col("h") % shards).cast("int").as("shard"),
        col("h"))
      .as[BloomedDoc]
      .groupByKey(_.shard)
      .flatMapGroupsWithState[BloomShardState, BloomSeen](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, rows: Iterator[BloomedDoc],
         state: GroupState[BloomShardState]) =>
          val st = state.getOption
            .getOrElse(BloomShardState(new Array[Byte](m / 8), 0L))
          // clone: GroupState contents must not be mutated in place
          val bits = st.bits.clone()
          var inserted = st.n_inserted
          val out = rows.toSeq.sortBy(_.doc_id).map { r =>
            val seen = graft.functions.BloomBits.contains(bits, r.h, m, k)
            if (!seen) {
              graft.functions.BloomBits.set(bits, r.h, m, k)
              inserted += 1
            }
            BloomSeen(r.doc_id, seen)
          }
          state.update(BloomShardState(bits, inserted))
          out.iterator
      }
  }

  /** Stream-stream interval join (w7): every `toType` event paired
    * with the SAME user's `fromType` events in the preceding
    * `horizonMinutes` — view→purchase attribution, impression→click
    * matching, the canonical two-stream correlation. On STREAMING
    * inputs both sides carry watermarks (horizon + slack) and the
    * time-bound join condition, which is exactly what lets Spark BOUND
    * the join state: a buffered view older than the watermark can no
    * longer match any future purchase and is evicted — state is
    * O(events inside the horizon window), forever. On batch frames the
    * identical condition runs as a plain interval join (the oracle
    * form); same results on closed windows (spec-pinned).
    */
  def attributionJoin(from: DataFrame, to: DataFrame,
                      horizonMinutes: Int = 60,
                      watermarkSlackMinutes: Int = 60): DataFrame = {
    require(horizonMinutes >= 1, "need a positive horizon")
    val wm = s"${horizonMinutes + watermarkSlackMinutes} minutes"
    val v0 = from.select(col("user_id"), col("event_id").as("from_id"),
      col("ts").as("from_ts"))
    val p0 = to.select(col("user_id").as("_uid"),
      col("event_id").as("to_id"), col("ts").as("to_ts"))
    val v = if (from.isStreaming) v0.withWatermark("from_ts", wm) else v0
    val p = if (to.isStreaming) p0.withWatermark("to_ts", wm) else p0
    v.join(p,
      col("user_id") === col("_uid") &&
        col("from_ts") <= col("to_ts") &&
        col("from_ts") >= col("to_ts") -
          expr(s"INTERVAL $horizonMinutes MINUTES"))
      .select(col("user_id"), col("from_id"), col("from_ts"),
        col("to_id"), col("to_ts"))
  }

  /** Attribution credit assignment (x27) over [[attributionJoin]]'s
    * pairs: per conversion, every contributing touch with the three
    * standard marketing models at once — first-touch and last-touch
    * flags (tiebreak on event id, fully deterministic) and linear
    * credit `1/n` (6 dp). BATCH form — the window partitions by
    * conversion over its (bounded: touches-within-horizon) group; the
    * streaming deployment runs [[attributionJoin]] continuously and
    * credits each conversion's pair group at watermark close.
    */
  def attributionCredit(pairs: DataFrame): DataFrame = {
    require(!pairs.isStreaming,
      "batch form; run attributionJoin's stream and credit per close")
    val byConv = org.apache.spark.sql.expressions.Window
      .partitionBy(col("to_id"))
    val asc = byConv.orderBy(col("from_ts").asc, col("from_id").asc)
    val desc = byConv.orderBy(col("from_ts").desc, col("from_id").desc)
    pairs
      .withColumn("n_touches", count(lit(1)).over(byConv))
      .withColumn("is_first", row_number().over(asc) === 1)
      .withColumn("is_last", row_number().over(desc) === 1)
      .withColumn("linear_credit",
        round(lit(1.0) / col("n_touches"), 6))
  }

  /** Top-k trending event types per tumbling hour — the "what's hot
    * now" rollup a feed pipeline keeps. BATCH form (rank windows are
    * not streamable); the streaming deployment runs [[hourlyByType]]
    * continuously and ranks the materialized counts per window close —
    * the count aggregate is the streamable 99% of the work, the rank a
    * per-window top-k over ≤ |event types| rows.
    */
  def trendingByWindow(events: DataFrame, k: Int = 3): DataFrame = {
    require(!events.isStreaming,
      "batch form; rank hourlyByType's sink for the streaming shape")
    val counts = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("window"))
      .orderBy(col("n_events").desc, col("event_type").asc)
    counts.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("rank"))
  }

  /** Streaming incremental dedup: every micro-batch of arriving
    * documents is classified against the STATIC accumulated corpus with
    * [[graft.ext.Dedup.classifyIncrement]] (exact digest hit →
    * cross-corpus LSH → Jaccard verify), and the per-batch result is
    * handed to `write`. `foreachBatch` is the production shape here —
    * the classifier needs joins and pinned intermediates a continuous
    * query can't express, and classification consults only the static
    * corpus, so statuses are micro-batch-partitioning invariant (the
    * spec asserts 2-batch ≡ 1-batch ≡ batch-mode). The corpus-side
    * state (digests, shingles, signatures) is built ONCE via
    * [[graft.ext.Dedup.corpusState]] and rides outside the pin
    * registry for the stream's lifetime — per micro-batch only the
    * batch-side pins are taken, and [[graft.std.Materialize.scoped]]
    * releases them once the write completes, so a long-running stream
    * holds no per-batch block residue and pays O(micro-batch), not
    * O(corpus), per trigger. The caller owns `state` (release after
    * the stream stops).
    */
  def incrementalDedupStream(newDocs: DataFrame,
                             state: graft.ext.Dedup.IncrementalState,
                             write: DataFrame => Unit):
      org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] = {
    require(newDocs.isStreaming,
      "newDocs must be a streaming frame; batch callers use " +
        "Dedup.incrementalClassify/classifyIncrement directly")
    newDocs.writeStream.outputMode("update").foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.std.Materialize.scoped {
          write(graft.ext.Dedup.classifyIncrement(state, batch.toDF()))
        }
    }
  }

  /** Streaming incremental EMBEDDING dedup — the vector analogue of
    * [[incrementalDedupStream]]: each micro-batch of arriving vectors is
    * classified against a standing prepped corpus
    * ([[graft.ext.Similarity.prepVectorCorpus]], pinned by the caller
    * with [[graft.std.Materialize.pinUnregistered]] so it outlives
    * per-batch release) via the bucketed LSH join + cosine verify.
    * Classification consults only the static corpus, so statuses are
    * micro-batch-partitioning invariant; per-batch pins (none today,
    * but the scoped block keeps that an implementation detail of
    * [[graft.ext.Similarity.classifyVectors]]) release when the write
    * completes. The caller owns the corpus frame (release after stop).
    */
  def embeddingDedupStream(newVecs: DataFrame, corpusPrepped: DataFrame,
                           threshold: Double, write: DataFrame => Unit,
                           nPlanes: Int = 16,
                           dims: Option[Int] = None):
      org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] = {
    require(newVecs.isStreaming,
      "newVecs must be a streaming frame; batch callers use " +
        "Similarity.classifyVectors directly")
    // nPlanes MUST match the corpus prep: batch-side buckets hashed
    // with a different plane count than corpusPrepped's would share no
    // valid buckets and silently classify every vector 'unique'
    newVecs.writeStream.outputMode("update").foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.std.Materialize.scoped {
          write(graft.ext.Similarity.classifyVectors(
            corpusPrepped, batch.toDF(), threshold, nPlanes = nPlanes,
            dims = dims))
        }
    }
  }

  /** Per-user session windows with a 5-minute inactivity gap. Spark
    * session semantics: window = [first event, last event + gap).
    */
  def userSessions(events: DataFrame, gap: String = "5 minutes"): DataFrame =
    events.groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Top user journeys (x41): the most common opening event-type path
    * per session — every product-analytics tool's "user flows" panel.
    * A journey is the first `depth` event types of a session joined
    * with `>`; sessions use the same 5-minute-gap [[session_window]]
    * semantics as w3 (on a stream the identical aggregation runs under
    * a watermark).
    *
    * 100 TB shape: the session aggregation's state per group is ONE
    * session's events (the standard session-window bound; `depth` caps
    * what the journey keeps of it), then journeys collapse in a tiny
    * counted rollup and `TakeOrderedAndProject` cuts the top `topK` —
    * no global sort of the full journey set.
    *
    * Determinism: events inside a session order by the (ts, event_id)
    * struct sort — a total order, so ties on ts cannot reshuffle the
    * path; the final cut is pinned (n_sessions DESC, journey ASC).
    */
  def topJourneys(events: DataFrame, gap: String = "5 minutes",
                  depth: Int = 3, topK: Int = 20): DataFrame =
    journeyRollup(sessionJourneys(events, gap, depth), topK)

  /** Stage 1 of [[topJourneys]]: one journey string per session. This
    * is the part that runs AS a streaming query — session_window +
    * watermark in append mode (sessions emit when the watermark passes
    * their end); the rollup is a separate aggregation, which Spark
    * does not chain in one streaming query, so production lands this
    * stage to a sink and runs [[journeyRollup]] downstream — the
    * micro-batch ≡ batch spec drives exactly that split.
    */
  def sessionJourneys(events: DataFrame, gap: String = "5 minutes",
                      depth: Int = 3): DataFrame = {
    require(depth >= 1, "depth must be positive")
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(sort_array(collect_list(
        struct(col("ts"), col("event_id"), col("event_type"))))
        .as("_evts"))
      .select(concat_ws(">",
        transform(slice(col("_evts"), 1, depth), e => e("event_type")))
        .as("journey"))
  }

  /** Stage 2 of [[topJourneys]]: the counted, pinned top-k cut. */
  def journeyRollup(journeys: DataFrame, topK: Int = 20): DataFrame = {
    require(topK >= 1, "topK must be positive")
    journeys.groupBy(col("journey"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("journey").asc)
      .limit(topK)
  }

  /** Streaming EWMA feed (w12): the stateful form of x53's
    * collect_list fold. Consumes the FINALIZED daily frame
    * ([[graft.ext.Timeseries.dailySeries]] — in production that
    * collapse is its own windowed streaming aggregation landed to a
    * sink, the w8/w10/w11 two-stage split, because Spark will not
    * chain an aggregation into a stateful op in one streaming query)
    * and emits one EWMA point per (series, day): per-series state is
    * ONE (lastDay, ewmaMicro) pair — 16 bytes per series vs the
    * window form's co-located history.
    *
    * Batch execution sorts each series by day and replays the
    * IDENTICAL recurrence — seed at the first day, then
    * `(αN·x + (αD−αN)·acc) / αD` in truncating long division, which
    * is exactly the `div` of the batch fold on the positive operands
    * both forms guard — so
    * `ewmaVerdicts(ewmaPoints(dailySeries(e)))` ≡ `ewmaBaseline(e)`
    * row for row and w12 shares x53's oracle verbatim.
    *
    * Cross-batch caveat (same as w8): state carries across
    * micro-batches in arrival order; a daily row arriving EARLIER
    * than the state's lastDay folds in arrival order, not day order —
    * the upstream daily aggregation's watermark is what makes that
    * impossible in production (a day only finalizes once its window
    * closes).
    */
  def ewmaPoints(daily: DataFrame,
                 alphaNum: Long = 3L, alphaDen: Long = 10L,
                 stateRetention: String = "60 days",
                 evictAfterMs: Long = 60L * 86400 * 1000)
      : Dataset[EwmaPoint] = {
    require(alphaNum >= 1 && alphaNum <= alphaDen,
      "alpha must lie in (0, 1]")
    val spark = daily.sparkSession
    import spark.implicits._
    val streaming = daily.isStreaming
    // the watermark column must survive into the stateful op, so it
    // rides the typed row (the GapEvent.ts pattern)
    val withTs = daily.withColumn("day_ts",
      to_timestamp(col("day")))
    val src = if (streaming) withTs.withWatermark("day_ts", stateRetention)
      else withTs
    val timeoutConf = if (streaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    src
      .filter(col("series").isNotNull && col("day").isNotNull)
      .select(col("series"), col("day"), col("n_events"),
        col("value_micro"), col("day_ts"))
      .as[EwmaDaily]
      .groupByKey(_.series)
      .flatMapGroupsWithState[EwmaState, EwmaPoint](
        OutputMode.Append, timeoutConf) {
        (series: String, rows: Iterator[EwmaDaily],
         state: GroupState[EwmaState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // java.sql.Date.getTime is monotone in the calendar day, so
            // it orders without touching the JVM default zone
            val sorted = rows.toSeq.sortBy(_.day.getTime)
            val out = scala.collection.mutable.ListBuffer.empty[EwmaPoint]
            var st = state.getOption
            sorted.foreach { r =>
              val e = st match {
                case Some(s) =>
                  (alphaNum * r.value_micro +
                    (alphaDen - alphaNum) * s.ewmaMicro) / alphaDen
                case None => r.value_micro
              }
              out += EwmaPoint(r.series, r.day, r.n_events,
                r.value_micro, e)
              st = Some(EwmaState(r.day.getTime, e))
            }
            st.foreach(state.update)
            if (streaming && sorted.nonEmpty)
              state.setTimeoutTimestamp(
                math.max(sorted.last.day.getTime,
                  state.getCurrentWatermarkMs() + 1) + evictAfterMs)
            out.iterator
          }
      }
  }

  /** Streaming Holt trend feed (w13): the stateful form of x68's
    * prefix fold — [[ewmaPoints]]'s lifecycle (same daily input
    * contract, same watermark/timeout discipline) with the state
    * widened to (level, trend) and the one-step-ahead forecast read
    * from the PRIOR state before it updates, exactly what the batch
    * lag window reads. Per-series state is one (lastDay, level,
    * trend) triple — 24 bytes vs the window form's co-located daily
    * history.
    *
    * Every step is `Math.floorDiv` — the same TRUE floor the batch
    * fold's offset identity `(n + C·d) div d − C` computes (they
    * agree exactly for |n| < C·d, which the shared
    * [[graft.ext.Timeseries.holtDaily]] magnitude guard enforces),
    * so `holtDisplay(holtPoints(holtDaily(e)))` ≡ `holtTrend(e)` row
    * for row and w13 shares x68's oracle verbatim. Trend state goes
    * NEGATIVE on declines; floorDiv, not `/`, is load-bearing there
    * (truncating `/` would split the twins on the first falling day).
    *
    * Cross-batch caveat: identical to w12 — state folds in arrival
    * order; the upstream daily aggregation's watermark is what makes
    * out-of-order days impossible in production.
    */
  def holtPoints(daily: DataFrame,
                 alphaNum: Long = 3L, alphaDen: Long = 10L,
                 betaNum: Long = 2L, betaDen: Long = 10L,
                 stateRetention: String = "60 days",
                 evictAfterMs: Long = 60L * 86400 * 1000)
      : Dataset[HoltPoint] = {
    require(alphaNum >= 1 && alphaNum <= alphaDen,
      "alpha must lie in (0, 1]")
    require(betaNum >= 1 && betaNum <= betaDen,
      "beta must lie in (0, 1]")
    val spark = daily.sparkSession
    import spark.implicits._
    val streaming = daily.isStreaming
    val withTs = daily.withColumn("day_ts",
      to_timestamp(col("day")))
    val src = if (streaming) withTs.withWatermark("day_ts", stateRetention)
      else withTs
    val timeoutConf = if (streaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    src
      .filter(col("series").isNotNull && col("day").isNotNull)
      .select(col("series"), col("day"), col("n_events"),
        col("value_micro"), col("day_ts"))
      .as[EwmaDaily]
      .groupByKey(_.series)
      .flatMapGroupsWithState[HoltState, HoltPoint](
        OutputMode.Append, timeoutConf) {
        (series: String, rows: Iterator[EwmaDaily],
         state: GroupState[HoltState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(_.day.getTime)
            val out = scala.collection.mutable.ListBuffer.empty[HoltPoint]
            var st = state.getOption
            sorted.foreach { r =>
              st match {
                case Some(s) =>
                  val lp = Math.floorDiv(alphaNum * r.value_micro +
                    (alphaDen - alphaNum) *
                      (s.levelMicro + s.trendMicro), alphaDen)
                  val bp = Math.floorDiv(
                    betaNum * (lp - s.levelMicro) +
                      (betaDen - betaNum) * s.trendMicro, betaDen)
                  val f = s.levelMicro + s.trendMicro
                  out += HoltPoint(r.series, r.day, r.n_events,
                    r.value_micro, lp, bp, Some(f),
                    Some(r.value_micro - f))
                  st = Some(HoltState(r.day.getTime, lp, bp))
                case None =>
                  out += HoltPoint(r.series, r.day, r.n_events,
                    r.value_micro, r.value_micro, 0L, None, None)
                  st = Some(HoltState(r.day.getTime, r.value_micro, 0L))
              }
            }
            st.foreach(state.update)
            if (streaming && sorted.nonEmpty)
              state.setTimeoutTimestamp(
                math.max(sorted.last.day.getTime,
                  state.getCurrentWatermarkMs() + 1) + evictAfterMs)
            out.iterator
          }
      }
  }
}
