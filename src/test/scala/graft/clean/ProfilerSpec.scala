package graft.clean

import graft.SparkSpec

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("tableProfile counts nulls/distincts and string min/max per column") {
    val df = Seq(
      (Some(1L), Some("b")), (Some(2L), None),
      (Some(2L), Some("a")), (None, Some("a"))
    ).toDF("k", "v")
    val out = Profiler.tableProfile(df, Seq("k", "v")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(out("k") == ((4L, 1L, 2L, "1", "2")))
    assert(out("v") == ((4L, 1L, 2L, "a", "b")))
  }

  test("fdAudit separates holding and violating determinants") {
    // 1 -> always "x" (holds); 2 -> {"x","y"} (violates); 3 -> only
    // nulls (nd = 0, holds)
    val df = Seq(
      (1L, Some("x")), (1L, Some("x")),
      (2L, Some("x")), (2L, Some("y")),
      (3L, None), (3L, None)
    ).toDF("lhs", "rhs")
    val r = Profiler.fdAudit(df, "lhs", "rhs").head()
    assert(r.getLong(0) == 3L)
    assert(r.getLong(1) == 2L)
    assert(r.getLong(2) == 1L)
    assert(r.getLong(3) == 333333L)
    assert(r.getLong(4) == 2L)
  }

  test("fdAudit on a true key dependency reports zero violations") {
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("lhs", "rhs")
    val r = Profiler.fdAudit(df, "lhs", "rhs").head()
    assert(r.getLong(2) == 0L && r.getLong(3) == 0L)
  }

  test("joinFanout predicts the join without running it") {
    val left = Seq((1L, "a"), (1L, "b"), (2L, "c"), (9L, "orphan"))
      .toDF("k", "lv")
    val right = Seq((1L, "x"), (1L, "y"), (1L, "z"), (3L, "unmatched"))
      .toDF("k", "rv")
    val r = Profiler.joinFanout(left, "k", right, "k").head()
    assert(r.getAs[Long]("n_left") == 4L)
    assert(r.getAs[Long]("n_right") == 4L)
    // key 1: 2x3 = 6 joined rows; key 2: 1x0; total joined = 6
    assert(r.getAs[Long]("n_joined") == 6L)
    assert(r.getAs[Long]("n_left_orphans") == 2L)   // keys 2 and 9, one row each
    assert(r.getAs[Long]("n_right_unmatched") == 1L)
    assert(r.getAs[Long]("n_shared_keys") == 1L)
    assert(r.getAs[Long]("max_fanout") == 6L)
    // cross-check against the actual inner join
    assert(left.join(right, "k").count() == r.getAs[Long]("n_joined"))
  }

  test("joinHotKeys ranks keys by predicted explosion, shares exact") {
    val left = (Seq.fill(5)(1L) ++ Seq.fill(2)(2L) ++ Seq(3L, 9L)).toDF("k")
    val right = (Seq.fill(4)(1L) ++ Seq.fill(3)(2L) ++ Seq(3L, 7L)).toDF("k")
    val out = Profiler.joinHotKeys(left, "k", right, "k", topN = 2)
      .orderBy("rank").collect()
    // key 1: 5*4 = 20; key 2: 2*3 = 6; key 3: 1; total joined = 27
    assert(out.length == 2)
    assert(out(0).getAs[Long]("key") == 1L)
    assert(out(0).getAs[Long]("n_joined") == 20L)
    assert(out(0).getAs[Long]("share_ppm") == 20L * 1000000L / 27L)
    assert(out(1).getAs[Long]("key") == 2L)
    assert(out(1).getAs[Long]("share_ppm") == 6L * 1000000L / 27L)
    // plan: the cut is a TakeOrdered over the count frame, never a
    // global window over all keys
    val plan = Profiler.joinHotKeys(left, "k", right, "k", topN = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("deterministic under repartitioning") {
    val df = (1L to 500L).map(i => (i % 37, s"v${i % 11}")).toDF("a", "b")
    val p1 = Profiler.tableProfile(df, Seq("a", "b")).collect().map(_.toSeq).toSet
    val p2 = Profiler.tableProfile(df.repartition(9), Seq("a", "b"))
      .collect().map(_.toSeq).toSet
    assert(p1 == p2)
    val f1 = Profiler.fdAudit(df, "a", "b").head().toSeq
    val f2 = Profiler.fdAudit(df.repartition(9), "a", "b").head().toSeq
    assert(f1 == f2)
  }
}
