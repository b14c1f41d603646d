package graft.enrich

import graft.SparkSpec

class GroupStatsSpec extends SparkSpec {
  import spark.implicits._

  test("rank-pick quantiles use the integer ceiling row") {
    val df = (1 to 10).map(v => ("a", v.toDouble)).toDF("g", "v")
    val out = GroupStats.groupQuantiles(df, "g", "v").collect().head
    // ceil(10*q/100): p25 -> row 3, p50 -> row 5, p90 -> row 9, p99 -> row 10
    assert(out.getLong(1) == 10L)
    assert(out.getDouble(2) == 1.0 && out.getDouble(3) == 10.0)
    assert(out.getDouble(4) == 3.0)
    assert(out.getDouble(5) == 5.0)
    assert(out.getDouble(6) == 9.0)
    assert(out.getDouble(7) == 10.0)
  }

  test("nulls are excluded from n and from every pick") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)))
      .toDF("g", "v")
    val out = GroupStats.groupQuantiles(df, "g", "v").collect().head
    assert(out.getLong(1) == 2L)
    // p50 of [1, 3]: ceil(2*50/100) = row 1 -> 1.0
    assert(out.getDouble(5) == 1.0)
  }

  test("a single-row group answers every percentile with its value") {
    val df = Seq(("b", 42.0)).toDF("g", "v")
    val out = GroupStats.groupQuantiles(df, "g", "v").collect().head
    assert((4 to 7).forall(i => out.getDouble(i) == 42.0))
  }

  test("groups are independent; equal values pick identically regardless of order") {
    val df = (Seq.fill(4)(("a", 7.0)) ++ Seq(("b", 1.0), ("b", 2.0)))
      .toDF("g", "v")
    val out = GroupStats.groupQuantiles(df, "g", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(out("a") == 7.0)
    assert(out("b") == 1.0)
  }

  test("plan shape: one group-key exchange shared by window and rollup") {
    val plan = GroupStats.groupQuantiles(
        Seq(("a", 1.0)).toDF("g", "v"), "g", "v")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("SinglePartition"), plan)
  }
}
