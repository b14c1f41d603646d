package graft

import org.apache.spark.sql.functions._

import graft.clean.Profiler
import graft.enrich.{Funnel, TimeSeriesOps}
import graft.llmdata.Classifier

/** Plan-shape contracts for the round-17 operators — the 100 TB
  * claims as assertions: populations collapse to bounded value-grain
  * frames before any window, corpus work map-side combines, and the
  * join-size audit never executes the join. */
class Round17PlanSpec extends SparkSpec {
  import spark.implicits._

  private def scored = (0L until 200L)
    .map(i => ((i % 13).toLong, (i % 2).toLong)).toDF("margin_micro", "y")

  private def events = (0L until 400L)
    .map(i => ((i % 23).toLong, i * 3600000000L)).toDF("u", "t_us")

  test("aucFromScores: the rank window rides the distinct-score frame only") {
    val plan = Classifier.aucFromScores(scored)
      .queryExecution.executedPlan.toString
    // one window, and it sits ABOVE the score-grain aggregate — the
    // document population is never sorted
    assert("WindowExec|Window ".r.findAllIn(plan).size <= 1,
      s"one bounded window expected:\n$plan")
    val firstWindow = plan.indexOf("Window")
    val lastAgg = plan.lastIndexOf("HashAggregate")
    assert(firstWindow >= 0 && lastAgg > firstWindow,
      s"window must consume the score-grain aggregate:\n$plan")
    assert(plan.toLowerCase.contains("partial"),
      s"the score-grain collapse must map-side combine:\n$plan")
  }

  test("joinSizeEstimate never executes a join") {
    val plan = Profiler.joinSizeEstimate(events, "u")
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"),
      s"the size audit must not join:\n$plan")
    assert(plan.toLowerCase.contains("partial"),
      s"key counts must map-side combine:\n$plan")
  }

  test("survivalKm: corpus collapses to entity grain before any window") {
    val plan = Funnel.survivalKm(events, "u", "t_us", 86400000000L)
      .queryExecution.executedPlan.toString
    // the horizon attaches by broadcast, never a shuffle join
    assert(!plan.toLowerCase.contains("sortmergejoin"),
      s"horizon must broadcast:\n$plan")
    val firstWindow = plan.indexOf("Window")
    val lastAgg = plan.lastIndexOf("HashAggregate")
    assert(firstWindow >= 0 && lastAgg > firstWindow,
      s"windows must ride the lifetime count-of-counts frame:\n$plan")
  }

  test("spearmanMatrix: rank attach is an equi-join, moments combine") {
    val df = (0L until 100L).map(i => ((i % 9).toDouble, (i % 7).toDouble))
      .toDF("x", "y")
    val plan = Profiler.spearmanMatrix(df, Seq(("x", 1L), ("y", 1L)))
      .queryExecution.executedPlan.toString
    // two rank windows (one per column), each above a value-grain
    // aggregate; the final moment rollup map-side combines
    assert("WindowExec|Window ".r.findAllIn(plan).size <= 2,
      s"one bounded rank window per column:\n$plan")
    assert(plan.toLowerCase.contains("partial"),
      s"moment aggregate must map-side combine:\n$plan")
  }

  test("categoryPsiDrift: one category-grain aggregate, broadcast midpoint") {
    val ev = events.withColumn("c", concat(lit("t"), col("u") % 3))
    val plan = TimeSeriesOps.categoryPsiDrift(ev, "c", "t_us")
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("sortmergejoin"),
      s"midpoint must broadcast:\n$plan")
    assert(plan.toLowerCase.contains("partial"),
      s"category counts must map-side combine:\n$plan")
  }

  test("anovaF: no window, no join — two aggregates, both combining") {
    val df = (0L until 120L).map(i => (s"g${i % 5}", (i % 11).toLong))
      .toDF("g", "x")
    val plan = Profiler.anovaF(df, "g", "x")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no window expected:\n$plan")
    assert(!plan.toLowerCase.contains("join"), s"no join expected:\n$plan")
    assert(plan.toLowerCase.contains("partial"),
      s"group moments must map-side combine:\n$plan")
  }

  test("prSweep: the threshold attach broadcasts, never shuffles") {
    val plan = Classifier.prSweep(
        scored.withColumnRenamed("margin_micro", "p_micro"),
        Seq(300000L, 600000L))
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("sortmergejoin"),
      s"thresholds must broadcast:\n$plan")
    assert(plan.toLowerCase.contains("partial"),
      s"confusion counts must map-side combine:\n$plan")
  }

  test("botRegularity: one key exchange feeds both the lag and the moments") {
    val plan = TimeSeriesOps.botRegularity(events, "u", "t_us")
      .queryExecution.executedPlan.toString
    // the lag window and the per-key aggregate share the key
    // partitioning: at most 2 exchanges (key, final order)
    assert("Exchange".r.findAllIn(plan).size <= 2,
      s"lag + moments must reuse one key exchange:\n$plan")
  }
}
