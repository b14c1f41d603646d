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

  /** Daily (bucketed) funnel CONVERSION rollup — the dashboard frame
    * over [[funnelTimes]]: entrants are cohorted by the time bucket of
    * their stage-1 reach, and each cohort reports how many reached
    * every later stage, the exact integer conversion rate, and the
    * exact rank-picked median time-to-convert among its converted
    * entrants (the same `ceil(n * 0.5)` row-pick as the corpus-stats
    * quantiles — no approx sketch, engine-replayable).
    *
    * 100 TB design: the per-key funnel frame (entities-sized, one
    * exchange inside [[funnelTimes]]) re-shuffles once on the cohort
    * for the counts and the median windows — windows are bounded per
    * cohort, never whole-frame. Keys that never reached stage 1 have
    * no cohort and are excluded (they are not entrants).
    *
    * @param bucket cohort width in `timeCol` units (e.g. 86_400e6
    *               micros = 1 day)
    * @return (cohort, n_entered, n_reached_2..k, n_converted,
    *         conv_micro, p50_convert)
    */
  def funnelDaily(events: DataFrame, keyCol: String, timeCol: String,
                  typeCol: String, stages: Seq[String], bucket: Long): DataFrame = {
    require(stages.size >= 2, "funnelDaily needs at least two stages")
    val k = stages.size
    val ft = funnelTimes(events, keyCol, timeCol, typeCol, stages)
      .filter(col("t_1").isNotNull)
      .withColumn("cohort", TimeSeriesOps.floorDivCol("t_1", bucket))
      // consumed by both the counts rollup and the median chain; the
      // frame is entities-sized and the persist keeps the funnel's
      // window chain from replaying over the events twice
      .persist()
    val reachedCols = (2 to k).map(i =>
      sum(when(col(s"t_$i").isNotNull, 1L).otherwise(0L)).as(s"n_reached_$i"))
    val counts = ft.groupBy("cohort")
      .agg(count(lit(1)).as("n_entered"), reachedCols: _*)
    val rw = Window.partitionBy("cohort")
      .orderBy(col("__dur"), col(keyCol))
    val cw = Window.partitionBy("cohort")
    val med = ft.filter(col(s"t_$k").isNotNull)
      .withColumn("__dur", col(s"t_$k") - col("t_1"))
      .withColumn("__rn", row_number().over(rw).cast("long"))
      .withColumn("__nc", count(lit(1)).over(cw))
      .groupBy("cohort")
      .agg(max(when(col("__rn") === ceil(col("__nc") * 0.5), col("__dur")))
        .as("p50_convert"))
    counts.join(med, Seq("cohort"), "left")
      .withColumn("n_converted", col(s"n_reached_$k"))
      .withColumn("conv_micro", expr("n_converted * 1000000 div n_entered"))
  }

  /** First/last-touch ATTRIBUTION — which touchpoint types opened and
    * closed the path to conversion: for every entity whose stream
    * contains a `convType` event, the type of its earliest touch and
    * of its last touch STRICTLY BEFORE the first conversion, plus the
    * touch count. The marketing-analytics rollup next to [[funnelTimes]]
    * (funnel asks "how far did they get", attribution asks "what gets
    * credit"). Conversion events themselves are never touches;
    * entities that never convert have no row (this is a report over
    * conversions); a conversion with NO prior touch keeps its row with
    * null touch types and count 0 — dropping it would overstate
    * attributed conversions.
    *
    * Determinism: touch order is (time, tieCol) — ties at the same
    * timestamp resolve by the tie column, and the first conversion
    * time is a plain min. 100 TB design: ONE key exchange; the
    * conversion-time window, the touch-rank windows, and the final
    * rollup all ride it (the [[funnelTimes]] shape); no joins, no
    * driver state. Output: (keyCol, conv_t, n_touches, first_touch,
    * last_touch).
    */
  /** Time-to-convert quantiles between two funnel steps — the
    * latency distribution behind [[funnelTimes]]'s conversion COUNTS:
    * per entity, the gap from its FIRST `fromType` to the first
    * `toType` at or after it, rank-picked at second grain (p50/p90/
    * p99 "how long does signup→purchase take").
    *
    * Exactness: latencies are exact integer micros bucketed to whole
    * seconds by truncating division (non-negative — both engines
    * agree), and each quantile is the exact `cum·100 ≥ n·q` rank pick
    * over the seconds histogram — second-grain BY CONTRACT (the
    * histogramQuantiles class; sub-second conversion latency is not a
    * product metric).
    *
    * 100 TB plan: two filtered entity-grain aggregates and one
    * entity-keyed join, then the latency frame collapses to the
    * BOUNDED seconds histogram (map-side combined) — the quantile
    * windows never see more than |distinct seconds| rows, so no
    * global sort of the converted population ever happens. Output:
    * one row per quantile — (q_pct, n_converted, latency_s).
    */
  def conversionLatency(events: DataFrame, keyCol: String, timeCol: String,
                        typeCol: String, fromType: String, toType: String,
                        qs: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 1 && q <= 100),
      s"quantiles must be in [1, 100]: $qs")
    val a = events.filter(col(typeCol) === fromType)
      .groupBy(col(keyCol)).agg(min(col(timeCol)).as("__ta"))
    val b = events.filter(col(typeCol) === toType)
      .select(col(keyCol), col(timeCol).as("__tb"))
    val lat = a.join(b, Seq(keyCol))
      .filter(col("__tb") >= col("__ta"))
      .groupBy(col(keyCol))
      .agg(min(col("__tb") - col("__ta")).as("__lat_us"))
    val secs = lat
      .withColumn("lat_s", expr("__lat_us div 1000000"))
      .groupBy("lat_s").agg(count(lit(1)).as("__c"))
    val w = Window.orderBy(col("lat_s").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = secs
      .withColumn("__cum", sum("__c").over(w))
      .withColumn("__n", sum("__c").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val spine = events.sparkSession
      .createDataFrame(qs.distinct.sorted.map(Tuple1(_)))
      .toDF("q_pct")
    cum
      .crossJoin(broadcast(spine))
      .filter(expr("__cum * 100 >= __n * q_pct"))
      .groupBy("q_pct")
      .agg(max("__n").as("n_converted"), min("lat_s").as("latency_s"))
      .select(col("q_pct").cast("long").as("q_pct"), col("n_converted"),
        col("latency_s"))
  }

  def attribution(events: DataFrame, keyCol: String, timeCol: String,
                  typeCol: String, tieCol: String,
                  convType: String): DataFrame = {
    val w = Window.partitionBy(keyCol)
    val tw = w.orderBy(col("__t"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isTouch = col("__ty") =!= convType && col("__t") < col("conv_t")
    events
      .select(col(keyCol), col(timeCol).cast("long").as("__t"),
        col(typeCol).as("__ty"), col(tieCol).cast("long").as("__tie"))
      .withColumn("conv_t",
        min(when(col("__ty") === convType, col("__t"))).over(w))
      .filter(col("conv_t").isNotNull)
      // running touch count marks the first (==1) and last (==total)
      // touch row; all three windows ride the one key exchange
      .withColumn("__run", sum(when(isTouch, 1L).otherwise(0L)).over(tw))
      .withColumn("__tot", sum(when(isTouch, 1L).otherwise(0L)).over(w))
      .groupBy(col(keyCol))
      .agg(min("conv_t").as("conv_t"),
        max("__tot").as("n_touches"),
        max(when(isTouch && col("__run") === 1L, col("__ty")))
          .as("first_touch"),
        max(when(isTouch && col("__run") === col("__tot"), col("__ty")))
          .as("last_touch"))
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
  /** Exponential retention-decay fit — [[cohortRetention]]'s matrix
    * reduced to the two numbers a growth team quotes: assume
    * `R(d) = e^{−λd}`, fit `ln R_d` against offset d by least squares
    * over the POOLED curve (per offset, actives summed over every
    * cohort OLD ENOUGH to observe that offset — the truncation-bias
    * guard: a young cohort can't vote on day-30 retention), and
    * report λ with the half-life `ln2/λ`.
    *
    * Replay contract (the zipfFit discipline): pooled ratios are
    * exact integer sums; each point's ln/products quantize ONCE to
    * integer micro; the LS moments are exact BIGINT sums and the
    * slope is one fixed-shape double expression. Offsets with zero
    * pooled actives have no ln and are excluded (stated: the fit
    * runs on the observed support).
    *
    * 100 TB plan: one entity-key window pass builds the cohort cells
    * (the cohortRetention plan, shared shape); everything after rides
    * the cohorts×offsets bounded frame — the observing-cohort
    * denominators, the pooled curve, and the 5-moment fit. Output:
    * one row — (n_offsets_fit, lambda, half_life_days).
    */
  def retentionHalfLife(events: DataFrame, keyCol: String, timeCol: String,
                        bucket: Long): DataFrame = {
    val w = Window.partitionBy(keyCol)
    val keyed = events.select(col(keyCol),
        graft.enrich.TimeSeriesOps.floorDivCol(
          s"cast($timeCol as bigint)", bucket).as("__b"))
      .withColumn("cohort", min(col("__b")).over(w))
    val cells = keyed
      .groupBy(col("cohort"), (col("__b") - col("cohort")).as("off"))
      .agg(countDistinct(col(keyCol)).as("n_active"))
      .persist() // cohorts x offsets bounded; sizes + pooled + span read it
    val sizes = cells.filter(col("off") === 0)
      .select(col("cohort"), col("n_active").as("n_cohort"))
    val span = cells.agg(max(col("cohort") + col("off")).as("__mx"),
      min(col("cohort")).as("__mn"))
    val offsets = span
      .filter(col("__mx") > col("__mn"))
      .select(explode(expr("sequence(1, __mx - __mn)")).as("off"),
        col("__mx"))
    // pooled denominator per offset: every cohort with cohort <= mx - d
    val denom = offsets.join(sizes,
        sizes("cohort") <= offsets("__mx") - offsets("off"))
      .groupBy("off").agg(sum("n_cohort").as("__sb"))
    val numer = cells.filter(col("off") >= 1)
      .groupBy("off").agg(sum("n_active").as("__sa"))
    val pts = denom.join(numer, Seq("off"))
      .filter(col("__sa") > 0L && col("__sb") > 0L)
      .withColumn("__x", col("off").cast("double"))
      .withColumn("__y", expr(
        "ln(cast(__sa as double) / cast(__sb as double))"))
      .select(
        floor(col("__x") * 1000000.0 + 0.5).cast("long").as("qx"),
        floor(col("__y") * 1000000.0 + 0.5).cast("long").as("qy"),
        floor(col("__x") * col("__y") * 1000000.0 + 0.5).cast("long").as("qxy"),
        floor(col("__x") * col("__x") * 1000000.0 + 0.5).cast("long").as("qxx"))
      .agg(count(lit(1)).as("n_offsets_fit"), sum("qx").as("sx"),
        sum("qy").as("sy"), sum("qxy").as("sxy"), sum("qxx").as("sxx"))
    pts
      .withColumn("lambda", expr(
        "-((cast(n_offsets_fit as double) * cast(sxy as double) * 1000000.0 " +
          "- cast(sx as double) * cast(sy as double)) " +
          "/ (cast(n_offsets_fit as double) * cast(sxx as double) * 1000000.0 " +
          "- cast(sx as double) * cast(sx as double)))"))
      .withColumn("half_life_days", expr(
        "case when lambda <= 0.0 then -1.0 else ln(2.0) / lambda end"))
      .select(col("n_offsets_fit"), col("lambda"), col("half_life_days"))
  }

  /** GROWTH-ACCOUNTING ledger — the per-bucket user-state decomposition
    * every growth team reads (new / retained / resurrected / churned,
    * the Reforge accounting identity): a user active in bucket w is
    * NEW if never active before, RETAINED if active in w−1,
    * RESURRECTED otherwise; a user active in w but not w+1 CHURNS in
    * w+1 (including the bucket after their last activity — the
    * ledger's honest tail row, which may carry only churn). The
    * identity `active_w − active_{w−1} = new + resurrected − churned`
    * holds exactly by construction.
    *
    * 100 TB plan: ONE distinct to (user, bucket) activity grain (the
    * only corpus-sized shuffle); the lag/lead windows ride the
    * per-user ACTIVITY frame, and the state rollup map-side combines
    * to the bucket grain. Output per bucket: (bucket, n_new,
    * n_retained, n_resurrected, n_active, n_churned).
    */
  def growthAccounting(events: DataFrame, keyCol: String, timeCol: String,
                       bucket: Long): DataFrame = {
    val uw = events.select(col(keyCol).as("__u"),
        TimeSeriesOps.floorDivCol(s"cast($timeCol as bigint)", bucket)
          .as("__w"))
      .distinct()
    val lagW = Window.partitionBy("__u").orderBy(col("__w").asc)
    val st = uw
      .withColumn("__prev", lag(col("__w"), 1).over(lagW))
      .withColumn("__next", lead(col("__w"), 1).over(lagW))
    val act = st.groupBy(col("__w").as("bucket"))
      .agg(sum(when(col("__prev").isNull, 1L).otherwise(0L)).as("n_new"),
        sum(when(col("__prev") === col("__w") - 1L, 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("__prev").isNotNull && col("__prev") < col("__w") - 1L,
          1L).otherwise(0L)).as("n_resurrected"),
        count(lit(1)).as("n_active"))
    val churn = st
      .filter(col("__next").isNull || col("__next") > col("__w") + 1L)
      .groupBy((col("__w") + 1L).as("bucket"))
      .agg(count(lit(1)).as("n_churned"))
    act.join(churn, Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("n_new", "n_retained", "n_resurrected",
        "n_active", "n_churned"))
      .select(col("bucket"), col("n_new"), col("n_retained"),
        col("n_resurrected"), col("n_active"), col("n_churned"))
  }

  def cohortRetention(events: DataFrame, keyCol: String, timeCol: String,
                      bucket: Long): DataFrame = {
    // integer `div`, not float floor: double division misrounds at
    // exact bucket boundaries for micro-epoch magnitudes (~2^51).
    // Truncating vs flooring division only differ on a negative time
    // axis, which epoch-based time columns don't have.
    val w = Window.partitionBy(keyCol)
    val keyed = events.select(col(keyCol),
        TimeSeriesOps.floorDivCol(s"cast($timeCol as bigint)", bucket).as("__b"))
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

  /** Kaplan–Meier survival curve over entity lifetimes with
    * right-censoring at the observation horizon (Kaplan & Meier 1958
    * — THE churn estimator; [[retentionHalfLife]] fits a parametric
    * decay, this is its nonparametric sibling and the censoring-aware
    * one). An entity's lifetime is `last bucket − first bucket`; it
    * is a DEATH if its last activity precedes the corpus horizon
    * (max bucket over all events) and CENSORED at its observed
    * lifetime otherwise — still-alive-at-horizon entities carry risk
    * information without voting on deaths (the truncation-bias guard,
    * nonparametric edition).
    *
    * Exactness contract: the corpus collapses to the distinct-
    * lifetime frame (count-of-counts class); `n_risk(t) = Σ_{L≥t}
    * (deaths+censored)` is an exact descending cumulative on that
    * bounded frame, and each day's hazard term
    * `ln((n_risk−d)/n_risk)` quantizes ONCE to integer micro-nats
    * (the surprisal discipline — `exp` never runs, log-survival is
    * the exact-integer output; a consumer exponentiates downstream).
    * Days where deaths exhaust the risk set (S hits exactly 0, the
    * log diverges) set `absorbed` and null the log from there on —
    * stated, not averaged over.
    *
    * 100 TB plan: one shuffle to entity grain (min/max per key), one
    * map-side-combined count-of-counts aggregate, windows only on
    * the distinct-lifetime frame; the horizon attaches as a
    * broadcast scalar. Output: one row per distinct observed
    * lifetime — (t_day, n_risk, n_death, n_censored, log_s_micro,
    * absorbed), ordered by t_day.
    */
  def survivalKm(events: DataFrame, keyCol: String, timeCol: String,
                 bucket: Long): DataFrame = {
    val per = events
      .select(col(keyCol),
        TimeSeriesOps.floorDivCol(s"cast($timeCol as bigint)", bucket)
          .as("__b"))
      .groupBy(col(keyCol))
      .agg(min("__b").as("__b0"), max("__b").as("__b1"))
    val horizon = per.agg(max("__b1").as("__h"))
    val grain = per.crossJoin(broadcast(horizon))
      .select((col("__b1") - col("__b0")).as("t_day"),
        when(col("__b1") < col("__h"), 1L).otherwise(0L).as("__d"))
      .groupBy("t_day")
      .agg(sum("__d").as("n_death"),
        sum(lit(1L) - col("__d")).as("n_censored"))
    val wDesc = Window.orderBy(col("t_day").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAsc = Window.orderBy(col("t_day").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grain
      .withColumn("n_risk",
        sum(col("n_death") + col("n_censored")).over(wDesc))
      .withColumn("__term", when(
        col("n_death") > 0L && col("n_death") < col("n_risk"),
        floor(log((col("n_risk") - col("n_death")).cast("double") /
          col("n_risk").cast("double")) * lit(1000000.0) + lit(0.5))
          .cast("long")).otherwise(lit(0L)))
      .withColumn("__dead", sum(
        when(col("n_death") === col("n_risk"), 1L).otherwise(0L))
        .over(wAsc))
      .withColumn("__cum", sum(col("__term")).over(wAsc))
      .withColumn("absorbed", col("__dead") > 0L)
      .withColumn("log_s_micro",
        when(col("absorbed"), lit(null).cast("long"))
          .otherwise(col("__cum")))
      .select(col("t_day"), col("n_risk"), col("n_death"),
        col("n_censored"), col("log_s_micro"), col("absorbed"))
      .orderBy("t_day")
  }
}
