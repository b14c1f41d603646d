package graft.integrate

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val intervals = Seq(
    (10L, 0.0, 5.0),    // spans buckets 0-2 at width 2
    (20L, 4.0, 4.5),    // inside bucket 2
    (30L, -3.0, -1.0),  // negative axis
    (40L, 9.0, 8.0))    // inverted -> dropped
    .toDF("iid", "lo", "hi")

  test("containment matches are exact and duplicate-free") {
    val points = Seq((1L, 0.0), (2L, 4.2), (3L, 5.0), (4L, -2.0), (5L, 7.0))
      .toDF("pid", "v")
    val got = RangeJoin.bucketed(points, intervals, "v", "lo", "hi", 2.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // pid 1: in [0,5]; pid 2: in [0,5] and [4,4.5]; pid 3: boundary of [0,5];
    // pid 4: in [-3,-1]; pid 5: nothing; inverted interval 40 never matches
    assert(got == Set((1L, 10L), (2L, 10L), (2L, 20L), (3L, 10L), (4L, 30L)))
    val n = RangeJoin.bucketed(points, intervals, "v", "lo", "hi", 2.0).count()
    assert(n == got.size) // one row per pair: bucketing introduces no dups
  }

  test("bucket width changes the plan, never the result") {
    val points = (0 until 100).map(i => (i.toLong, i / 10.0)).toDF("pid", "v")
    val wide = RangeJoin.bucketed(points, intervals, "v", "lo", "hi", 100.0)
      .select("pid", "iid").collect().toSet
    val narrow = RangeJoin.bucketed(points, intervals, "v", "lo", "hi", 0.5)
      .select("pid", "iid").collect().toSet
    assert(wide == narrow)
  }

  test("plans as a hash equi-join on the bucket, not a nested loop") {
    val points = Seq((1L, 1.0)).toDF("pid", "v")
    val plan = RangeJoin.bucketed(points, intervals, "v", "lo", "hi", 2.0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
  }

  test("intervalOverlap: each overlapping pair appears once, endpoints inclusive") {
    val a = Seq(
      (1L, 0.0, 10.0),   // wide: spans many buckets
      (2L, 20.0, 21.0),
      (3L, 5.0, 4.0),    // inverted -> dropped
      (4L, 30.0, 30.0))  // degenerate point interval
      .toDF("aid", "a_lo", "a_hi")
    val b = Seq(
      (10L, 2.0, 9.0),   // overlaps 1 across several shared buckets
      (11L, 10.0, 12.0), // touches 1 at exactly a_hi -> inclusive
      (12L, 21.0, 25.0), // touches 2
      (13L, 40.0, 41.0), // no partner
      (14L, 29.5, 30.5)) // contains the degenerate 4
      .toDF("bid", "b_lo", "b_hi")
    val out = RangeJoin.intervalOverlap(a, b, "a_lo", "a_hi", "b_lo", "b_hi",
        bucketWidth = 2.0)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    // ONCE each — the start-bucket dedup claim (pair (1,10) shares 4 buckets)
    assert(out.sorted.toSeq == Seq((1L, 10L), (1L, 11L), (2L, 12L), (4L, 14L)))
    // plan: bucket equi-join, never a nested-loop cartesian
    val plan = RangeJoin.intervalOverlap(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 2.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
