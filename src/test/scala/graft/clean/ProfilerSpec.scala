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
