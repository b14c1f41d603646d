package graft

import org.apache.spark.sql.functions._

import graft.clean.Profiler
import graft.enrich.{EventPaths, TimeSeriesOps}
import graft.llmdata.TextAnalysis

/** Plan-shape contracts for the round-16 continuation waves — the
  * 100 TB claims as assertions: corpus-sized work is ONE map-side-
  * combined aggregate; pair/window work rides only bounded derived
  * frames; broadcast where a sort-merge join would shuffle the world.
  */
class ContinuationPlanSpec extends SparkSpec {
  import spark.implicits._

  private def events = (0L until 300L)
    .map(i => (i % 5 + 1L, i * 3600000000L))
    .toDF("user_id", "t_us")

  private def docs = (0L until 40L)
    .map(i => (i, s"tok${i % 7} tok${(i + 1) % 11} common filler",
      s"l${i % 3}", s"s${i % 4}"))
    .toDF("doc_id", "text", "lang", "source")

  test("mannKendall: raw scan collapses to the day aggregate FIRST") {
    val plan = TimeSeriesOps.mannKendall(
        events.select(col("t_us")), "t_us", 86400000000L)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("partial"),
      s"the daily rollup must map-side combine:\n$plan")
    // the O(d^2) sign pairs must ride a broadcast nested loop over the
    // calendar frame, never a sort-merge of anything corpus-sized
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"day-pair join must be a bounded-frame nested loop:\n$plan")
    assert(!plan.toLowerCase.contains("sortmergejoin"),
      s"no corpus-grain sort-merge join expected:\n$plan")
  }

  test("autocorrelation: lag spine broadcasts, moments combine") {
    val plan = TimeSeriesOps.autocorrelation(
        events.select(col("t_us")), "t_us", 86400000000L, maxLag = 7)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("partial"),
      s"the daily rollup must map-side combine:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"the shifted self-join rides broadcast frames:\n$plan")
  }

  test("mutualInfo: no window anywhere, marginals broadcast") {
    val plan = Profiler.mutualInfo(docs, "lang", "source")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec") && !plan.contains("Window "),
      s"the contingency chain needs no window:\n$plan")
    assert(!plan.toLowerCase.contains("sortmergejoin"),
      s"marginals must attach by broadcast:\n$plan")
    assert(plan.toLowerCase.contains("partial"),
      s"the cell aggregate must map-side combine:\n$plan")
  }

  test("correlationMatrix: ONE aggregate, no joins, no windows") {
    val plan = Profiler.correlationMatrix(
        docs.select(col("doc_id").cast("double").as("x"),
          (col("doc_id") * 2).cast("double").as("y")),
        Seq(("x", 100L), ("y", 100L)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"moment pass has no joins:\n$plan")
    assert(!plan.contains("WindowExec") && !plan.contains("Window "),
      s"moment pass has no windows:\n$plan")
    assert(plan.toLowerCase.contains("partial"),
      s"the moment aggregate must map-side combine:\n$plan")
  }

  test("sourceJsDivergence: term join stays vocab-grain, spine broadcasts") {
    val plan = TextAnalysis.sourceJsDivergence(docs)
      .queryExecution.executedPlan.toString
    // totals and the |S|^2 pair spine attach by broadcast — the only
    // sort-merge-eligible join is the term-keyed vocab self-join
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"totals/spine must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"no corpus-grain cartesian:\n$plan")
  }

  test("markovStationary: power chain runs driver-side on the bounded matrix") {
    val ev = (0L until 60L)
      .map(i => (i % 6 + 1L, s"t${i % 3}", i, i * 1000L))
      .toDF("user_id", "event_type", "event_id", "t_us")
    val df = EventPaths.markovStationary(ev, "user_id", "t_us",
      "event_type", "event_id", iters = 8)
    val plan = df.queryExecution.executedPlan.toString
    // r19 restructure: the n_types²-bounded matrix is collected ONCE
    // (the componentsOverPairs driver-fast-path discipline — the old
    // spelling already broadcast the n_types-row π per iteration, so
    // the bound is unchanged) and the 8 exact-integer iterations run
    // driver-side; the RETURNED frame is the tiny (state, pi, rank)
    // ranking alone — no per-iteration join/aggregate chain, no cache
    assert(!plan.contains("InMemoryTableScan") && !plan.contains("Join"),
      s"returned frame must be the bounded ranking, not the iteration chain:\n$plan")
    df.sparkSession.sharedState.cacheManager.clearCache()
  }

  test("seasonalResidualOutliers: cell stats broadcast onto the calendar") {
    val plan = TimeSeriesOps.seasonalResidualOutliers(
        events.select(col("t_us")), "t_us")
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("partial"),
      s"the hourly rollup must map-side combine:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the 168-cell stats must broadcast:\n$plan")
    assert(!plan.toLowerCase.contains("sortmergejoin"),
      s"no corpus-grain sort-merge expected:\n$plan")
  }
}
