package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One input bar of the streaming enrichment (ticker + event-time +
  * price/volume).
  */
case class Bar(ticker: String, ts: Timestamp, close: Double, volume: Double)

/** One enriched output row: the streaming counterparts of the batch
  * EMA/OBV features (same recursions as enrich/Ewma.scala and W9).
  */
case class EnrichedBar(
    ticker: String, ts: Timestamp, close: Double,
    ema: Double, obv: Double, barCount: Long)

/** Per-ticker running state: EMA seed/value + OBV accumulator. */
case class TickerState(ema: Double, prevClose: Double, obv: Double, n: Long)

/** One keyed event for streaming sessionization. */
case class SessionEvent(userId: Long, ts: Timestamp, eventId: Long)

/** One completed day-count cell of a per-series event stream. */
case class SeriesCount(series: String, bucket: Long, n: Long)

/** EWMA control-chart state: the recursion value, the last bucket
  * folded (gap fill + late-drop high-water mark), observed count. */
case class EwmaSeriesState(ewma: Double, lastBucket: Long, n: Long)

/** One judged bucket of the streaming EWMA control chart. */
case class EwmaAnomalyRow(series: String, bucket: Long, nEvents: Long,
                          ewmaPrior: Double, devPpm: Long,
                          isAnomaly: Boolean)

/** A session-numbered event (streaming counterpart of the batch
  * `Sessionize.sessionize` output row).
  */
case class SessionizedEvent(userId: Long, ts: Timestamp, eventId: Long,
                            sessionSeq: Long)

/** Per-user session state: current 1-based session number + the last
  * event time seen (epoch ms; Long.MinValue = no event yet).
  */
case class SessionState(seq: Long, lastTsMs: Long)

/** The currently-open session of one user (stats variant). */
case class OpenSession(seq: Long, startMs: Long, lastMs: Long, n: Long)

/** One CLOSED session emitted by [[StreamingEnrich.statefulSessionStats]]
  * — the streaming counterpart of a `Sessionize.sessionStats` row.
  */
case class ClosedSession(userId: Long, sessionSeq: Long, nEvents: Long,
                         tStartMs: Long, tEndMs: Long, durationMs: Long)

/** One typed event for the streaming funnel. */
case class FunnelEvent(userId: Long, ts: Timestamp, eventId: Long,
                       eventType: String)

/** A user's funnel progress so far — the streaming counterpart of one
  * batch `Funnel.funnelTimes` row (reach times carried as epoch ms,
  * `Long.MinValue` = stage not reached).
  */
case class FunnelProgress(userId: Long, t1: Long, t2: Long, t3: Long,
                          stagesCompleted: Long, converted: Boolean)

/** One buffered stage event awaiting the watermark
  * ([[StreamingEnrich.statefulFunnelWatermarked]]): stage is the
  * 1-based index in the funnel's ordered stage list.
  */
case class PendingStage(tsMs: Long, eventId: Long, stage: Int)

/** Watermarked-funnel state: FINALIZED reach times (over every event
  * at-or-below the watermark) plus the buffer of events still above
  * it. Buffer size is bounded by the user's stage events inside the
  * watermark horizon — the explicit price of exact out-of-order
  * parity.
  */
case class FunnelBufferState(t1: Long, t2: Long, t3: Long,
                             pending: Seq[PendingStage])

/** One changelog row for the streaming CDC compaction ([[StreamingEnrich
  * .statefulLatestWins]]) — same fields the batch `Merge.latestWins`
  * changelog carries.
  */
case class UpsertEvent(key: Long, value: Double, ord: Long, tie: Long,
                       isDelete: Boolean)

/** A key's CURRENT compacted row: the newest (ord, tie) version seen,
  * with the tombstone visible as `deleted` (the batch merge drops the
  * key; a stream must emit the deletion downstream).
  */
case class CurrentRow(key: Long, value: Double, ord: Long, tie: Long,
                      deleted: Boolean)

/** One emitted (key, bucket) rate row — the streaming counterpart of a
  * `TimeSeriesOps.rateSpikes` output row.
  */
case class SpikeBucket(userId: Long, bucket: Long, nEvents: Long,
                       trailSum: Long, isSpike: Boolean)

/** Rate-spike state: per-bucket event counts inside the trailing
  * horizon, plus the highest bucket already emitted (so a flushed
  * bucket is never re-emitted).
  */
case class RateState(counts: Map[Long, Long], emittedMax: Long)

/** Structured Streaming enrichment (SURVEY §2.11 notes the reference
  * is batch-only; this module is the forward-looking stream port the
  * brief's design principles call for — `readStream` -> transforms ->
  * `writeStream`, watermarked windowed aggregates, and
  * `mapGroupsWithState` for the recursive features).
  *
  * Scale design: state is O(1) per ticker (three doubles and a
  * counter — the same constant-state recursion the batch
  * DeclarativeAggregate EWMA uses), keyed by the entity column, so the
  * stateful stage shuffles once on `ticker` and scales with the number
  * of entities, not events. The windowed-aggregate path is pure
  * built-in streaming (watermark + tumbling window) and compiles to an
  * incremental stateful agg.
  */
object StreamingEnrich {

  /** Watermarked per-ticker tumbling-window OHLCV-style aggregate:
    * the streaming analogue of the batch groupBy windows. Late events
    * beyond the watermark are dropped by the engine.
    */
  def windowedStats(bars: DataFrame, windowLen: String = "1 minute",
                    watermark: String = "2 minutes"): DataFrame =
    bars
      .withWatermark("ts", watermark)
      .groupBy(col("ticker"), window(col("ts"), windowLen))
      .agg(
        avg("close").as("avg_close"),
        max("close").as("max_close"),
        min("close").as("min_close"),
        sum("volume").as("sum_volume"),
        count(lit(1)).as("n_bars"))
      .select(col("ticker"), col("window.start").as("window_start"),
        col("avg_close"), col("max_close"), col("min_close"),
        col("sum_volume"), col("n_bars"))

  /** Streaming EMA + OBV via `mapGroupsWithState`: the pandas
    * `ewm(adjust=False)` recursion (first value seeds, then
    * alpha*x + (1-alpha)*prev — identical to the batch Ewma) and the
    * cumulative signed-volume OBV, evaluated incrementally per
    * micro-batch. Within a batch, a group's rows are sorted by event
    * time before folding, so replaying a batch stream reproduces the
    * batch result exactly.
    */
  def statefulEma(bars: Dataset[Bar], span: Int): Dataset[EnrichedBar] = {
    import bars.sparkSession.implicits._
    val alpha = 2.0 / (span + 1.0)
    bars.groupByKey(_.ticker)
      .mapGroupsWithState[TickerState, Seq[EnrichedBar]](
        GroupStateTimeout.NoTimeout()) {
        (ticker: String, rows: Iterator[Bar], state: GroupState[TickerState]) =>
          val sorted = rows.toSeq.sortBy(_.ts.getTime)
          var st = state.getOption.getOrElse(TickerState(Double.NaN, Double.NaN, 0.0, 0L))
          val out = sorted.map { b =>
            val ema =
              if (st.n == 0L) b.close
              else alpha * b.close + (1 - alpha) * st.ema
            val obv =
              if (st.n == 0L) 0.0
              else st.obv + b.volume * math.signum(b.close - st.prevClose)
            st = TickerState(ema, b.close, obv, st.n + 1)
            EnrichedBar(ticker, b.ts, b.close, ema, obv, st.n)
          }
          state.update(st)
          out
      }
      .flatMap(identity)
  }

  /** Streaming exact dedup: drops re-deliveries of the same
    * `(ticker, ts)` event within the watermark horizon — the streaming
    * counterpart of the batch content-hash dedup, with state bounded
    * by the watermark (expired keys are evicted, so state size tracks
    * the horizon, not the stream length).
    */
  def dedupWithinWatermark(bars: DataFrame, watermark: String = "10 minutes"): DataFrame =
    bars
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("ticker", "ts")

  /** Streaming inactivity-gap sessionization via `mapGroupsWithState`
    * — the stream port of `enrich.Sessionize` (same break rule: a new
    * session when the gap to the previous event exceeds `gapMs`, seq
    * 1-based per key; ties broken by eventId like the batch window's
    * tie column). State is O(1) per user (a counter + last timestamp),
    * shuffled once on the key — session numbering scales with the
    * number of entities, not events, exactly like the batch window.
    *
    * Same ordering caveat as [[statefulEma]]: rows are time-sorted
    * WITHIN each micro-batch, so a replayed batch stream reproduces
    * the batch numbering exactly (parity-spec'd); an event arriving
    * in a later micro-batch with an earlier timestamp cannot
    * retro-split an already-numbered session — the streaming-world
    * trade-off a watermark bounds in production.
    */
  def statefulSessionize(events: Dataset[SessionEvent],
                         gapMs: Long): Dataset[SessionizedEvent] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .mapGroupsWithState[SessionState, Seq[SessionizedEvent]](
        GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.eventId))
          var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue))
          val out = sorted.map { e =>
            val t = e.ts.getTime
            val seq =
              if (st.lastTsMs == Long.MinValue) 1L
              else if (t - st.lastTsMs > gapMs) st.seq + 1
              else st.seq
            st = SessionState(seq, t)
            SessionizedEvent(uid, e.ts, e.eventId, seq)
          }
          state.update(st)
          out
      }
      .flatMap(identity)
  }

  /** Per-session ROLLUPS as a stream: emits one row per CLOSED session
    * (count, bounds, duration — the streaming counterpart of
    * `Sessionize.sessionStats`) via `flatMapGroupsWithState` with an
    * EVENT-TIME TIMEOUT. A session closes two ways:
    *
    *  - data-driven: a same-user event beyond `gapMs` closes the open
    *    session immediately and starts the next one;
    *  - watermark-driven: when the watermark passes
    *    `last_event + gapMs`, the timeout fires and the final open
    *    session flushes — the part an events-only fold can never emit.
    *
    * A timed-out session does NOT drop its state: it leaves a
    * TOMBSTONE (`n = 0`, no timeout registered) carrying the closed
    * seq and last timestamp, so a user who goes idle past the
    * watermark and later returns CONTINUES numbering at `seq + 1`
    * instead of restarting at 1 — the append-only output never
    * contains duplicate `(userId, sessionSeq)` keys, matching the
    * batch `Sessionize.sessionStats` numbering this is the
    * counterpart of. The cost is explicit: state scales with
    * DISTINCT USERS EVER SEEN (one ~32-byte tombstone each, no
    * timers), not with concurrently-active users — at 10^9 users
    * that is tens of GB across the whole store, and a deployment
    * that prefers bounded state over stable numbering can TTL the
    * tombstones out of band (the seq then restarts, which is the
    * divergence this design refuses by default).
    *
    * Append-mode output: closed sessions are immutable facts.
    */
  def statefulSessionStats(events: Dataset[SessionEvent], gapMs: Long,
                           watermark: String = "10 minutes"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    def close(uid: Long, st: OpenSession): ClosedSession =
      ClosedSession(uid, st.seq, st.n, st.startMs, st.lastMs,
        st.lastMs - st.startMs)
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val st = state.get
            // Tombstone, not remove: keep the seq so the user's next
            // session continues numbering. No new timeout — a
            // tombstone never fires again.
            state.update(OpenSession(st.seq, st.lastMs, st.lastMs, 0L))
            Iterator.single(close(uid, st))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.eventId))
            val out = scala.collection.mutable.ArrayBuffer[ClosedSession]()
            var st = state.getOption.orNull
            sorted.foreach { e =>
              val t = e.ts.getTime
              if (st == null) st = OpenSession(1L, t, t, 1L)
              else if (st.n == 0L)
                // Returning after a watermark close: the tombstoned
                // session was already emitted, so NEVER re-close it —
                // open the next session unconditionally (any event
                // this side of the watermark is beyond lastMs + gapMs
                // by the timeout condition anyway).
                st = OpenSession(st.seq + 1, t, t, 1L)
              else if (t - st.lastMs > gapMs) {
                out += close(uid, st)
                st = OpenSession(st.seq + 1, t, t, 1L)
              } else st = OpenSession(st.seq, st.startMs,
                math.max(st.lastMs, t), st.n + 1)
            }
            state.update(st)
            state.setTimeoutTimestamp(st.lastMs + gapMs)
            out.iterator
          }
      }
  }

  /** Event-rate spike flags as a stream — the counterpart of
    * `TimeSeriesOps.rateSpikes` (same exact-integer rule:
    * `n * window > trail * factor`, gated on a non-empty trail). A
    * (key, bucket) row emits when it CLOSES:
    *
    *  - data-driven: the first event of a LATER bucket for the same
    *    key proves the bucket complete (the whole micro-batch is
    *    folded before deciding, so ordering within a batch is
    *    irrelevant);
    *  - watermark-driven: the event-time timeout flushes the final
    *    open bucket, leaving a tombstone (`emittedMax`) so a
    *    returning key continues without re-emitting.
    *
    * State is O(window) longs per key (counts inside the trailing
    * horizon, pruned each batch). Exact batch parity holds for
    * BUCKET-monotone arrival per key — no event arrives after an
    * event of a later bucket — which is much weaker than the
    * event-ordered contract the other optimistic operators need;
    * a bucket-late event (arriving after its bucket closed) bumps
    * future trails but cannot retro-correct the emitted row, the
    * same horizon trade-off as [[statefulSessionize]].
    *
    * Append-mode output: closed buckets are immutable facts.
    *
    * State lifecycle (ADVICE r13 #2 — the flush used to leave an
    * immortal tombstone per key): after the watermark flush the
    * tombstone (counts map + emittedMax) is kept ONLY for
    * `ttlBuckets` more buckets of event time, with a re-armed
    * timeout; on that second expiry the state is REMOVED. A key
    * returning after the TTL restarts with empty trail history, so a
    * bucket at or before its forgotten `emittedMax` could re-emit —
    * the standard bounded-re-emission trade for a state store that
    * does not grow with lifetime key cardinality (eviction behavior
    * pinned by spec).
    */
  def statefulRateSpikes(events: Dataset[SessionEvent], bucketMs: Long,
                         window: Int = 7, factor: Int = 3,
                         watermark: String = "10 minutes",
                         ttlBuckets: Int = 1000): Dataset[SpikeBucket] = {
    import events.sparkSession.implicits._
    def row(uid: Long, b: Long, counts: Map[Long, Long]): SpikeBucket = {
      val n = counts.getOrElse(b, 0L)
      val trail = ((b - window) until b).map(counts.getOrElse(_, 0L)).sum
      SpikeBucket(uid, b, n, trail,
        trail > 0L && n * window > trail * factor)
    }
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[RateState, SpikeBucket](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[SessionEvent], state: GroupState[RateState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            val open = st.counts.keys.filter(_ > st.emittedMax).toSeq.sorted
            if (open.nonEmpty) {
              // tombstone: counts stay (future trails still need
              // them), nothing left to emit; the re-armed TTL timer
              // reaps it if the key never returns
              state.update(RateState(st.counts, open.max))
              state.setTimeoutTimestamp(
                state.getCurrentWatermarkMs() + ttlBuckets * bucketMs)
              open.iterator.map(b => row(uid, b, st.counts))
            } else {
              // second expiry: the tombstone outlived its TTL with no
              // new events — drop it (bounded re-emission risk if the
              // key returns later; see scaladoc)
              state.remove()
              Iterator.empty
            }
          } else {
            val st = state.getOption
              .getOrElse(RateState(Map.empty, Long.MinValue))
            var counts = st.counts
            rows.foreach { e =>
              // floorDiv, not /: parity with the batch operator's
              // floor bucketing for pre-1970 timestamps
              val b = Math.floorDiv(e.ts.getTime, bucketMs)
              counts = counts.updated(b, counts.getOrElse(b, 0L) + 1L)
            }
            val maxB = counts.keys.max
            val closable = counts.keys
              .filter(b => b > st.emittedMax && b < maxB).toSeq.sorted
            val out = closable.map(b => row(uid, b, counts))
            val newEmitted =
              if (closable.nonEmpty) closable.max else st.emittedMax
            // keep only buckets a future trailing window can still see
            state.update(RateState(
              counts.filter { case (b, _) => b >= maxB - window }, newEmitted))
            // flush the open bucket once the watermark passes its end
            state.setTimeoutTimestamp(math.max(
              (maxB + 1L) * bucketMs,
              state.getCurrentWatermarkMs() + 1L))
            out.iterator
          }
      }
  }

  /** Funnel progress as a stream — the streaming counterpart of
    * `Funnel.funnelTimes` for a fixed 3-stage funnel: per user, the
    * earliest IN-ORDER reach time of each stage, emitted as the user's
    * current [[FunnelProgress]] whenever a micro-batch touches them
    * (Update mode). State is three epoch-ms longs per user.
    *
    * Same ordering caveat as [[statefulSessionize]]: rows are
    * time-sorted WITHIN each micro-batch, so a replayed time-ordered
    * stream reproduces the batch funnel exactly (parity-spec'd); an
    * event arriving in a later micro-batch with an earlier timestamp
    * cannot retroactively lower an already-set reach time — the batch
    * operator's whole-history minimum needs the history, which O(1)
    * state by design does not keep. Equal-timestamp stage pairs
    * resolve by arrival order here (the batch window counts them
    * at-or-after regardless of order), so exact parity is over
    * streams with per-user strictly increasing timestamps. For exact
    * parity on OUT-OF-ORDER streams (late arrivals within a
    * watermark), use [[statefulFunnelWatermarked]], which buffers
    * until the watermark at the cost of horizon-bounded state.
    */
  def statefulFunnel(events: Dataset[FunnelEvent],
                     stages: (String, String, String)): Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    val unset = Long.MinValue
    events.groupByKey(_.userId)
      .mapGroupsWithState[FunnelProgress, FunnelProgress](
        GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelProgress]) =>
          var st = state.getOption
            .getOrElse(FunnelProgress(uid, unset, unset, unset, 0L, converted = false))
          rows.toSeq.sortBy(e => (e.ts.getTime, e.eventId)).foreach { e =>
            val t = e.ts.getTime
            if (e.eventType == stages._1 && st.t1 == unset)
              st = st.copy(t1 = t)
            else if (e.eventType == stages._2 && st.t2 == unset &&
              st.t1 != unset && t >= st.t1)
              st = st.copy(t2 = t)
            else if (e.eventType == stages._3 && st.t3 == unset &&
              st.t2 != unset && t >= st.t2)
              st = st.copy(t3 = t)
          }
          val completed =
            if (st.t3 != unset) 3L else if (st.t2 != unset) 2L
            else if (st.t1 != unset) 1L else 0L
          st = st.copy(stagesCompleted = completed, converted = st.t3 != unset)
          state.update(st)
          st
      }
  }

  /** [[statefulFunnel]] with EXACT out-of-order parity inside the
    * watermark (VERDICT r12 next-4, the funnel's counterpart of the
    * sessionize tombstone upgrade): stage events are BUFFERED until
    * the watermark passes them, then folded in global event-time
    * order — so a click that arrives a micro-batch after the purchase
    * it precedes still lands between view and purchase, exactly as
    * the batch operator's whole-history minima would place it.
    *
    * Correctness argument: events fold only once `ts <= watermark`;
    * the engine drops arrivals below the watermark before they reach
    * the state function; therefore the fold consumes events in
    * nondecreasing event-time order across all micro-batches, and a
    * single time-ordered pass computes the batch `funnelTimes` chain
    * exactly (stage j's minimum is fixed by the time any stage-j+1
    * candidate at a later time is folded). Equal-timestamp pairs sort
    * lower-stage-first (then eventId), matching the batch `>=`
    * inclusive semantics regardless of arrival order. The emitted row
    * is the verdict over every event at-or-below the CURRENT
    * watermark — a well-defined stream prefix; once the watermark
    * passes a user's last event, it equals the batch result over the
    * non-dropped events (parity-spec'd with late cross-batch stage
    * arrivals).
    *
    * Costs, stated: state is the O(1) reach times PLUS the user's
    * stage events inside the watermark horizon (the buffer an exact
    * answer requires — horizon-bounded, evicted as the watermark
    * advances); emission waits for the watermark (latency = the
    * configured delay), where [[statefulFunnel]] emits optimistically
    * per batch. Production picks by need: exact + delayed
    * (watermarked) vs immediate + order-sensitive (plain). An
    * EventTimeTimeout at the earliest buffered event guarantees the
    * buffer drains even if the user never sends another event.
    */
  def statefulFunnelWatermarked(events: Dataset[FunnelEvent],
                                stages: (String, String, String),
                                watermark: String = "10 minutes"): Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    val unset = Long.MinValue
    val stageOf = Map(stages._1 -> 1, stages._2 -> 2, stages._3 -> 3)
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.userId)
      .mapGroupsWithState[FunnelBufferState, FunnelProgress](
        GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelBufferState]) =>
          var st = state.getOption
            .getOrElse(FunnelBufferState(unset, unset, unset, Nil))
          val wm = state.getCurrentWatermarkMs()
          val incoming = rows.flatMap(e => stageOf.get(e.eventType)
            .map(s => PendingStage(e.ts.getTime, e.eventId, s))).toSeq
          // fold everything the watermark has passed, hold the rest
          val (ripe, hold) = (st.pending ++ incoming).partition(_.tsMs <= wm)
          var (t1, t2, t3) = (st.t1, st.t2, st.t3)
          ripe.sortBy(p => (p.tsMs, p.stage, p.eventId)).foreach { p =>
            if (p.stage == 1 && t1 == unset) t1 = p.tsMs
            else if (p.stage == 2 && t2 == unset && t1 != unset && p.tsMs >= t1)
              t2 = p.tsMs
            else if (p.stage == 3 && t3 == unset && t2 != unset && p.tsMs >= t2)
              t3 = p.tsMs
          }
          st = FunnelBufferState(t1, t2, t3, hold)
          state.update(st)
          // drain guarantee: wake this user when the watermark passes
          // its earliest held event (all held events are > wm here)
          if (hold.nonEmpty) state.setTimeoutTimestamp(hold.map(_.tsMs).min)
          val completed =
            if (t3 != unset) 3L else if (t2 != unset) 2L
            else if (t1 != unset) 1L else 0L
          FunnelProgress(uid, t1, t2, t3, completed, t3 != unset)
      }
  }

  /** CDC compaction as a stream — the streaming counterpart of
    * `Merge.latestWins`: per key, keep the newest `(ord, tie)` version
    * across micro-batches and emit the key's CURRENT row whenever a
    * batch touches it (Update mode). Out-of-order and duplicate
    * deliveries lose to the kept version exactly as they lose the
    * batch window's `row_number` argmax, so after any prefix of the
    * changelog the emitted current state matches the batch merge over
    * that prefix (parity-spec'd); tombstones surface as `deleted =
    * true` rather than silently vanishing, since a sink must SEE the
    * deletion to apply it.
    *
    * State is one [[CurrentRow]]-sized record per LIVE KEY — the
    * unavoidable floor for upsert compaction (the store IS the current
    * table), shuffled once on the key.
    */
  def statefulLatestWins(updates: Dataset[UpsertEvent]): Dataset[CurrentRow] = {
    import updates.sparkSession.implicits._
    updates.groupByKey(_.key)
      .mapGroupsWithState[CurrentRow, CurrentRow](
        GroupStateTimeout.NoTimeout()) {
        (k: Long, rows: Iterator[UpsertEvent], state: GroupState[CurrentRow]) =>
          var st = state.getOption.orNull
          rows.foreach { e =>
            if (st == null || e.ord > st.ord || (e.ord == st.ord && e.tie > st.tie))
              st = CurrentRow(k, e.value, e.ord, e.tie, e.isDelete)
          }
          state.update(st)
          st
      }
  }

  /** Streaming twin of [[graft.enrich.TimeSeriesOps.ewmaAnomaly]]:
    * per-series EWMA control chart over an arriving day-count stream
    * (the shape a windowed count aggregate emits upstream). State is
    * O(1) per series — the EWMA double plus the last bucket seen —
    * and the recursion is the IDENTICAL op order as the batch op and
    * the w_ema family (`α·x + (1−α)·e`, α = 2/(span+1), seeded at
    * the first bucket), so stream == batch row-for-row on any split
    * of the input into micro-batches.
    *
    * Calendar-gap parity: the batch op zero-fills silent days; the
    * twin folds (and EMITS) a zero-count row for every bucket skipped
    * between the last seen and the arriving one, so a silent day
    * flags the same anomaly in both engines. Within a batch rows sort
    * by bucket before folding (the statefulEma replay contract);
    * buckets are assumed to arrive at-or-after the last seen
    * (upstream watermark ordering) — a late bucket below the state's
    * high-water mark would have been finalized already and is
    * dropped, stated.
    */
  def statefulEwmaAnomaly(counts: Dataset[SeriesCount], span: Int = 7,
                          thresholdPpm: Long = 500000L)
      : Dataset[EwmaAnomalyRow] = {
    import counts.sparkSession.implicits._
    val alpha = 2.0 / (span + 1.0)
    counts.groupByKey(_.series)
      .mapGroupsWithState[EwmaSeriesState, Seq[EwmaAnomalyRow]](
        GroupStateTimeout.NoTimeout()) {
        (series: String, rows: Iterator[SeriesCount],
         state: GroupState[EwmaSeriesState]) =>
          val sorted = rows.toSeq.sortBy(_.bucket)
          var st = state.getOption.getOrElse(
            EwmaSeriesState(Double.NaN, Long.MinValue, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[EwmaAnomalyRow]
          def step(bucket: Long, n: Long): Unit = {
            if (st.n == 0L) {
              out += EwmaAnomalyRow(series, bucket, n, 0.0, 0L,
                isAnomaly = false)
              st = EwmaSeriesState(n.toDouble, bucket, 1L)
            } else {
              val prior = st.ewma
              val dev = math.floor(
                (n.toDouble - prior) / prior * 1e6 + 0.5).toLong
              out += EwmaAnomalyRow(series, bucket, n,
                math.floor(prior * 1e6 + 0.5) / 1e6, dev,
                math.abs(dev) >= thresholdPpm)
              st = EwmaSeriesState(
                alpha * n.toDouble + (1 - alpha) * prior, bucket, st.n + 1)
            }
          }
          sorted.foreach { c =>
            if (st.n > 0L && c.bucket <= st.lastBucket) ()
            else {
              if (st.n > 0L)
                ((st.lastBucket + 1) until c.bucket).foreach(step(_, 0L))
              step(c.bucket, c.n)
            }
          }
          state.update(st)
          out.toSeq
      }
      .flatMap(identity)
  }

  /** Source -> stateful EWMA anomaly -> sink, memory-named for tests. */
  def runEwmaAnomaly(counts: Dataset[SeriesCount], span: Int,
                     thresholdPpm: Long, queryName: String) =
    statefulEwmaAnomaly(counts, span, thresholdPpm)
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Update())
      .start()

  /** Source -> stateful sessionize -> sink, memory-named for tests. */
  def runSessionize(events: Dataset[SessionEvent], gapMs: Long,
                    queryName: String) =
    statefulSessionize(events, gapMs)
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Update())
      .start()

  /** The full stream shape: source -> stateful enrich -> sink. Returns
    * the streaming query handle (memory sink for tests, any sink in
    * production).
    */
  def run(bars: Dataset[Bar], span: Int, queryName: String) =
    statefulEma(bars, span)
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Update())
      .start()
}
