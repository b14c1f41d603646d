package graft.enrich

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered funnel analysis: for each entity, the earliest time every
  * stage of an ordered stage sequence is reached — stage j counts only
  * at-or-after the time stage j-1 was reached (the product-analytics
  * conversion operator next to [[Sessionize]]; no reference
  * counterpart — builder-brief event tooling).
  *
  * The sequential dependency (t_j needs t_{j-1}) is spelled as k
  * chained WHOLE-PARTITION window minima over ONE key exchange — not k
  * self-joins: `t_j = min(time WHERE type = stage_j AND time >= t_{j-1})
  * OVER (PARTITION BY key)`. A null t_{j-1} nulls the comparison, so
  * reaching stage j without stage j-1 never counts — the reached
  * prefix is monotone by construction.
  *
  * 100 TB design: one shuffle on the key, k unbounded window
  * aggregates and the final per-key rollup all reuse that exchange;
  * no joins, no driver state, cost linear in events with k ~ a handful.
  * Same-timestamp stage pairs count as in-order (>=, matching the
  * at-or-after contract); determinism needs no tie column because
  * `min` over a fixed set is order-free.
  */
object Funnel {

  /** @param stages ordered stage values of `typeCol`, length k >= 1
    * @return one row per key: t_1..t_k (earliest in-order reach times,
    *         null when never reached), stages_completed, converted
    */
  def funnelTimes(events: DataFrame, keyCol: String, timeCol: String,
                  typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnelTimes needs at least one stage")
    val w = Window.partitionBy(keyCol)
    var df = events.select(col(keyCol), col(timeCol).cast("long").as("__t"),
      col(typeCol).as("__ty"))
    stages.zipWithIndex.foreach { case (st, i) =>
      val cond =
        if (i == 0) col("__ty") === st
        else col("__ty") === st && col("__t") >= col(s"t_${i}")
      df = df.withColumn(s"t_${i + 1}", min(when(cond, col("__t"))).over(w))
    }
    val ts = stages.indices.map(i => s"t_${i + 1}")
    // forward fold so the LAST when-wrap checks the deepest stage
    // first: when(t_k, k).otherwise(when(t_{k-1}, k-1). ...)
    val completed = ts.zipWithIndex
      .foldLeft(lit(0L)) { case (acc, (t, i)) =>
        when(col(t).isNotNull, lit((i + 1).toLong)).otherwise(acc)
      }
    df.groupBy(col(keyCol))
      .agg(min(col(ts.head)).as(ts.head),
        ts.tail.map(t => min(col(t)).as(t)): _*)
      .withColumn("stages_completed", completed)
      .withColumn("converted", col(s"t_${ts.size}").isNotNull)
  }

  /** Cohort retention matrix — the other canonical product-analytics
    * rollup: entities are cohorted by the time bucket of their FIRST
    * event, and each (cohort, bucket-offset) cell counts how many of
    * them were active that many buckets later. `retention_micro` is
    * the cell's survivor fraction in the catalog's integer micro-unit
    * convention (exact integer division, engine-replayable).
    *
    * 100 TB design: the events shuffle ONCE, on the key — a
    * whole-partition window minimum attaches each entity's cohort (no
    * first-event self-join, no second shuffle of the big side); the
    * distinct-entity phase of the cell rollup rides that same
    * partitioning (the grouping keys include the key), so only the
    * already-distinct (cohort, offset, key) frame re-shuffles. Cohort
    * sizes need no extra pass: every member is active at offset 0 by
    * definition of "first event", so `n_cohort` IS the offset-0 cell,
    * broadcast back. No driver state.
    *
    * @param bucket cohort/offset bucket width in `timeCol` units
    * @return (cohort, bucket_offset, n_active, n_cohort,
    *         retention_micro), cohort = first-event bucket index
    */
  def cohortRetention(events: DataFrame, keyCol: String, timeCol: String,
                      bucket: Long): DataFrame = {
    // integer `div`, not float floor: double division misrounds at
    // exact bucket boundaries for micro-epoch magnitudes (~2^51).
    // Truncating vs flooring division only differ on a negative time
    // axis, which epoch-based time columns don't have.
    val w = Window.partitionBy(keyCol)
    val keyed = events.select(col(keyCol),
        expr(s"cast($timeCol as bigint) div $bucket").as("__b"))
      .withColumn("cohort", min(col("__b")).over(w))
    val cells = keyed
      .groupBy(col("cohort"), (col("__b") - col("cohort")).as("bucket_offset"))
      .agg(countDistinct(col(keyCol)).as("n_active"))
      // consumed twice (the matrix itself + the offset-0 sizes): the
      // frame is output-sized (cohorts x offsets), so persisting it is
      // what makes "no second events pass" true — without it the size
      // branch re-runs the window chain over the corpus
      .persist()
    val sizes = cells.filter(col("bucket_offset") === 0)
      .select(col("cohort"), col("n_active").as("n_cohort"))
    cells.join(broadcast(sizes), "cohort")
      .withColumn("retention_micro",
        expr("n_active * 1000000 div n_cohort"))
  }
}
