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
