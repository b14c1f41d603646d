package graft.enrich

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val stages = Seq("view", "click", "purchase")

  private def run(rows: (Long, Long, String)*) =
    Funnel.funnelTimes(rows.toDF("k", "t", "ty"), "k", "t", "ty", stages)
      .collect()
      .map(r => r.getLong(0) -> (
        (if (r.isNullAt(1)) -1L else r.getLong(1)),
        (if (r.isNullAt(2)) -1L else r.getLong(2)),
        (if (r.isNullAt(3)) -1L else r.getLong(3)),
        r.getLong(4), r.getBoolean(5)))
      .toMap

  test("in-order stages convert; earliest in-order time wins per stage") {
    val out = run(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 25L, "click"),
      (1L, 30L, "purchase"),
      (2L, 5L, "view"), (2L, 9L, "click"))
    assert(out(1L) == (10L, 20L, 30L, 3L, true))
    assert(out(2L) == (5L, 9L, -1L, 2L, false))
  }

  test("a stage BEFORE its predecessor's reach time never counts") {
    // click at t=5 precedes the first view at t=10 -> not in order;
    // the later click at t=50 is the one that counts
    val out = run(
      (1L, 5L, "click"), (1L, 10L, "view"), (1L, 50L, "click"),
      // purchase-only user reaches NO stage (prefix is monotone)
      (2L, 7L, "purchase"))
    assert(out(1L) == (10L, 50L, -1L, 2L, false))
    assert(out(2L) == (-1L, -1L, -1L, 0L, false))
  }

  test("same-timestamp stage pairs count as in-order (at-or-after)") {
    val out = run((1L, 10L, "view"), (1L, 10L, "click"), (1L, 10L, "purchase"))
    assert(out(1L) == (10L, 10L, 10L, 3L, true))
  }

  test("unknown event types are ignored; keys with no stage events still report") {
    val out = run((1L, 1L, "error"), (1L, 2L, "view"), (1L, 3L, "signup"))
    assert(out(1L) == (2L, -1L, -1L, 1L, false))
  }

  test("funnelDaily: cohort counts, exact conversion rate, rank-picked median duration") {
    val day = 100L // bucket width in the test's time units
    val out = Funnel.funnelDaily(Seq(
        // cohort 0: three entrants, two reach click, one converts
        (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
        (2L, 15L, "view"), (2L, 25L, "click"),
        (3L, 5L, "view"),
        (4L, 7L, "click"), // never views -> not an entrant
        // cohort 1: two entrants, both convert (durations 30 and 100)
        (5L, 110L, "view"), (5L, 120L, "click"), (5L, 140L, "purchase"),
        (6L, 100L, "view"), (6L, 101L, "click"), (6L, 200L, "purchase"))
        .toDF("k", "t", "ty"),
      "k", "t", "ty", stages, bucket = day)
      .collect()
      .map(r => r.getAs[Long]("cohort") ->
        ((r.getAs[Long]("n_entered"), r.getAs[Long]("n_reached_2"),
          r.getAs[Long]("n_converted"), r.getAs[Long]("conv_micro"),
          if (r.isNullAt(r.fieldIndex("p50_convert"))) -1L
          else r.getAs[Long]("p50_convert")))).toMap
    assert(out(0L) == ((3L, 2L, 1L, 333333L, 20L)))
    // two durations [30, 100]: ceil(2 * 0.5) = 1 -> the lower median
    assert(out(1L) == ((2L, 2L, 2L, 1000000L, 30L)))
    // a cohort with zero conversions keeps its row, null median
    val out2 = Funnel.funnelDaily(
      Seq((9L, 10L, "view")).toDF("k", "t", "ty"),
      "k", "t", "ty", stages, bucket = day).collect()
    assert(out2.length == 1 && out2(0).getAs[Long]("n_converted") == 0L
      && out2(0).isNullAt(out2(0).fieldIndex("p50_convert")))
  }

  test("plan shape: funnel is one key exchange, chained windows, no joins") {
    val plan = Funnel.funnelTimes(Seq((1L, 1L, "view")).toDF("k", "t", "ty"),
      "k", "t", "ty", stages).queryExecution.executedPlan.toString
    // one hash exchange feeds all three window minima AND the final
    // rollup (exchange reuse — the 100 TB claim in the scaladoc)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"), plan)
  }

  test("plan shape: retention shuffles the events once, cells ride the exchange") {
    val plan = Funnel.cohortRetention(Seq((1L, 1L, "x")).toDF("k", "t", "ty"),
      "k", "t", 10L).queryExecution.executedPlan.toString
    // the size branch reads the PERSISTED cell frame, so the corpus
    // chain (key window + cell agg) runs once — its exchanges appear
    // under both InMemoryTableScans in the printout but share plan
    // ids; the sizes join is broadcast, never shuffled
    assert(plan.contains("InMemoryTableScan"), plan)
    val exchangeIds = "Exchange hashpartitioning[^\\[]*\\[plan_id=(\\d+)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(exchangeIds.size <= 2, plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("attribution credits the first and last touch strictly before conversion") {
    val out = Funnel.attribution(Seq(
        // u1: classic path; post-conversion events never count
        (1L, 10L, "view", 100L), (1L, 20L, "click", 101L),
        (1L, 30L, "purchase", 102L), (1L, 40L, "view", 103L),
        // u2: converts with NO prior touch -> row kept, null touches
        (2L, 5L, "purchase", 200L),
        // u3: never converts -> no row
        (3L, 10L, "view", 300L),
        // u4: same-timestamp touches resolve by the tie column
        (4L, 10L, "view", 400L), (4L, 10L, "click", 401L),
        (4L, 15L, "purchase", 402L),
        // u5: a touch AT conversion time is not strictly before
        (5L, 8L, "view", 500L), (5L, 9L, "click", 501L),
        (5L, 9L, "purchase", 502L))
        .toDF("k", "t", "ty", "eid"),
      "k", "t", "ty", "eid", convType = "purchase")
      .collect()
      .map(r => r.getAs[Long]("k") ->
        ((r.getAs[Long]("conv_t"), r.getAs[Long]("n_touches"),
          Option(r.getAs[String]("first_touch")).getOrElse("-"),
          Option(r.getAs[String]("last_touch")).getOrElse("-")))).toMap
    assert(out.keySet == Set(1L, 2L, 4L, 5L))
    assert(out(1L) == ((30L, 2L, "view", "click")))
    assert(out(2L) == ((5L, 0L, "-", "-")))
    assert(out(4L) == ((15L, 2L, "view", "click")))
    assert(out(5L) == ((9L, 1L, "view", "view")))
    // plan shape: the funnelTimes claim holds here too — one key
    // exchange feeds the conversion window, both touch windows, and
    // the rollup; no joins
    val plan = Funnel.attribution(Seq((1L, 1L, "purchase", 1L))
        .toDF("k", "t", "ty", "eid"),
      "k", "t", "ty", "eid", convType = "purchase")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("Join"), plan)
  }

  test("plan shape: funnelDaily reuses the persisted funnel frame, windows bound per cohort") {
    val plan = Funnel.funnelDaily(
        Seq((1L, 1L, "view")).toDF("k", "t", "ty"),
        "k", "t", "ty", stages, bucket = 10L)
      .queryExecution.executedPlan.toString
    // both consumers (counts + median) read the persisted per-key
    // funnel frame — the events window chain runs once
    assert(plan.contains("InMemoryTableScan"), plan)
    // exchanges: the funnel's key exchange lives under the cached
    // frame; above it only cohort-keyed exchanges (counts agg, median
    // window, final join) — no whole-frame window anywhere
    assert(!plan.contains("Window.partitionBy()") &&
      !plan.contains("SinglePartition, ENSURE_REQUIREMENTS"), plan)
    val cohortExchanges = "Exchange hashpartitioning\\(cohort".r
      .findAllIn(plan).size
    assert(cohortExchanges >= 1, plan)
  }

  test("cohortRetention cohorts by first-event bucket, cells are distinct-entity counts") {
    // bucket = 10: u1/u2 cohort 0, u3 cohort 1; repeat visits in one
    // bucket count once
    val ev = Seq(
      (1L, 1L), (1L, 12L), (1L, 13L), (1L, 31L), // u1: offsets 0,1,1,3
      (2L, 5L), // u2: offset 0 only
      (3L, 11L), (3L, 22L)) // u3: cohort 1, offsets 0,1
      .toDF("k", "t")
    val out = Funnel.cohortRetention(ev, "k", "t", bucket = 10L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out == Map(
      (0L, 0L) -> (2L, 2L, 1000000L),
      (0L, 1L) -> (1L, 2L, 500000L),
      (0L, 3L) -> (1L, 2L, 500000L),
      (1L, 0L) -> (1L, 1L, 1000000L),
      (1L, 1L) -> (1L, 1L, 1000000L)))
  }
}
