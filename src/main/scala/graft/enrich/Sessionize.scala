package graft.enrich

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inactivity-gap sessionization: number each entity's event stream
  * into sessions that break whenever the gap to the previous event
  * exceeds `gap` (the canonical clickstream/telemetry operator; no
  * reference counterpart — builder-brief event tooling).
  *
  * One keyed window pass: `lag` finds the previous timestamp, a
  * cumulative sum over the session-break flags numbers the sessions —
  * shuffle once on the key, one sorted scan per partition, O(1) state
  * per row. Same shape (and cost) as the `w_*` feature windows, so it
  * scales exactly as they do. Ties on the timestamp are broken by
  * `tieCol` for a deterministic numbering.
  */
object Sessionize {

  /** @param gap max same-session gap, in the units of `timeCol`
    * @return input plus `session_seq` (1-based per key)
    */
  def sessionize(events: DataFrame, keyCol: String, timeCol: String,
                 tieCol: String, gap: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(timeCol).asc, col(tieCol).asc)
    val prev = lag(col(timeCol), 1).over(w)
    val isNew = when(prev.isNull || col(timeCol) - prev > gap, 1L).otherwise(0L)
    events.withColumn("session_seq",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session rollup over [[sessionize]]: one row per
    * (key, session_seq) with event count, first/last event time, and
    * duration. The aggregate rides the SAME key partitioning the
    * numbering window already shuffled on — Catalyst reuses the
    * exchange, so the rollup adds a map-side-combined agg and nothing
    * else. The canonical session-length / engagement operator.
    */
  def sessionStats(events: DataFrame, keyCol: String, timeCol: String,
                   tieCol: String, gap: Long): DataFrame =
    sessionize(events, keyCol, timeCol, tieCol, gap)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(timeCol)).as("t_start"),
        max(col(timeCol)).as("t_end"))
      .withColumn("duration", col("t_end") - col("t_start"))

  /** Peak CONCURRENCY per calendar bucket — the capacity number
    * ("how many sessions were open at once at the worst moment of
    * each day") over any (start, end) interval frame, e.g.
    * [[sessionStats]]' sessions. Classic sweep line, made
    * partition-safe: each interval explodes to the buckets it
    * TOUCHES, with its +1 mark CLAMPED to the bucket start — so a
    * session carried in from a previous day is just a +1 at
    * midnight, and no cross-day running state exists. The −1 mark
    * fires at `end + 1` (inclusive ends: two sessions sharing an
    * event timestamp are concurrent) and only inside the interval's
    * last bucket. Within a bucket, marks order by (t, delta) — a −1
    * at time t sorts before a +1 at t, so end-exclusive adjacency is
    * NOT concurrency. Peak = max of the bucket-partitioned running
    * sum; every touched bucket gets a row (a bucket fully covered by
    * carried-through sessions has their +1s at its start).
    *
    * 100 TB plan: the explode is interval-buckets rows (linear in
    * span-days, not events); the running-sum and peak windows are
    * PARTITIONED BY BUCKET — no global sweep, no single-partition
    * window. Output: (bucket, n_active_sessions, peak_concurrency).
    */
  def peakConcurrency(sessions: DataFrame, startCol: String,
                      endCol: String, bucket: Long): DataFrame = {
    val fd = TimeSeriesOps.floorDivCol(_: String, bucket)
    val days = sessions
      .select(col(startCol).as("__s"), col(endCol).as("__e"))
      .filter(col("__e") >= col("__s"))
      .withColumn("__d0", fd("__s"))
      .withColumn("__d1", fd("__e"))
      .withColumn("bucket", explode(expr("sequence(__d0, __d1)")))
    val marks = days.select(col("bucket"), explode(expr(
      s"""filter(array(
         |  struct(greatest(__s, bucket * ${bucket}L) AS t, 1L AS d),
         |  struct(__e + 1L AS t,
         |         CASE WHEN bucket = __d1
         |              AND __e + 1 < (bucket + 1) * ${bucket}L
         |              THEN -1L ELSE 0L END AS d)),
         |  m -> m.d <> 0L)""".stripMargin)).as("m"))
      .select(col("bucket"), col("m.t").as("__t"), col("m.d").as("__dl"))
    val sweep = Window.partitionBy("bucket")
      .orderBy(col("__t").asc, col("__dl").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marks
      .withColumn("__run", sum("__dl").over(sweep))
      .groupBy("bucket")
      .agg(sum(when(col("__dl") === 1L, 1L).otherwise(0L))
          .as("n_active_sessions"),
        max("__run").as("peak_concurrency"))
  }

  /** Burst THROTTLING — alert/notification rate limiting with
    * keep-first semantics: within each key, events chained closer
    * than `cooldown` to their predecessor form one burst (exactly a
    * [[sessionize]] run at gap = cooldown), and only the burst's
    * FIRST event survives. Note the chain rule: an event 0.9
    * cooldowns after a SUPPRESSED event is still suppressed — dedup
    * against the previous EVENT, not the previous kept one — which is
    * the semantics that actually bounds alert rate under a sustained
    * drizzle. One row per burst: the kept event plus how many the
    * burst swallowed and how long it ran.
    *
    * 100 TB plan: inherits sessionize's one key exchange; the rollup
    * reuses that partitioning (map-side combined), so throttling
    * costs exactly one window + one aggregate. Output: (key,
    * session_seq, kept_time, n_suppressed, burst_span).
    */
  def burstThrottle(events: DataFrame, keyCol: String, timeCol: String,
                    tieCol: String, cooldown: Long): DataFrame =
    sessionize(events, keyCol, timeCol, tieCol, cooldown)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        min(col(timeCol)).as("kept_time"),
        (count(lit(1)) - 1L).as("n_suppressed"),
        (max(col(timeCol)) - min(col(timeCol))).as("burst_span"))
}
