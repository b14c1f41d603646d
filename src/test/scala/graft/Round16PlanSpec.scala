package graft

import org.apache.spark.sql.functions._

import graft.enrich.TimeSeriesOps
import graft.llmdata.TextAnalysis

/** Plan-shape contracts for the round-16 operators — the 100 TB
  * claims as assertions: corpus-sized work is map-side-combined
  * aggregates; windows ride only the bounded derived frames. */
class Round16PlanSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (0L until 40L)
    .map(i => (i, s"tok${i % 7} tok${(i + 1) % 11} common filler"))
    .toDF("doc_id", "text")

  private def events = (0L until 300L)
    .map(i => (s"t${i % 4}", (i % 97).toDouble, i * 3600000000L))
    .toDF("event_type", "value", "t_us")

  test("vocabHeadCoverage: one window (count-of-counts), map-side vocab agg") {
    val plan = TextAnalysis.vocabHeadCoverage(docs)
      .queryExecution.executedPlan.toString
    // the ONLY window is the cumulative over the bounded
    // distinct-frequency frame — the vocabulary itself is never
    // sorted or windowed
    assert("WindowExec|Window ".r.findAllIn(plan).size <= 1,
      s"one bounded window expected:\n$plan")
    assert(plan.toLowerCase.contains("partial"),
      s"vocabulary aggregate must map-side combine:\n$plan")
    assert(!plan.toLowerCase.contains("sortmergejoin"),
      s"the totals attach must broadcast:\n$plan")
  }

  test("histogramQuantiles: corpus work is ONE combined aggregate") {
    val plan = TimeSeriesOps.histogramQuantiles(events,
        "event_type", "value", 0.0, 100.0, 20)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("partial"),
      s"bucket-count aggregate must map-side combine:\n$plan")
    // windows (cum + total) ride the <= nBuckets-per-key frame behind
    // a single key exchange — no more than 3 exchanges in the whole
    // plan (bucket agg, key window, final order is collapsed by AQE)
    assert("Exchange".r.findAllIn(plan).size <= 3,
      s"too many exchanges:\n$plan")
  }

  test("cusumChangepoint: no corpus-keyed window, aggregates combine") {
    val df = TimeSeriesOps.cusumChangepoint(
      events.select(col("t_us")), "t_us", 86400000000L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("partial"),
      s"the daily rollup must map-side combine:\n$plan")
    // both windows (running sum, peak rank) order the CALENDAR frame,
    // which is bounded — assert the window inputs sort at most the
    // bucket grain by checking no window appears before the first
    // aggregate in the plan tree string (aggregates print deeper)
    val firstWindow = plan.indexOf("Window")
    val lastAgg = plan.lastIndexOf("HashAggregate")
    assert(firstWindow < lastAgg,
      s"windows must sit above the bucket aggregate:\n$plan")
  }
}
