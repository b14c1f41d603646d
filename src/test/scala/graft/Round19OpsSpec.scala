package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-19 operators and the r18 advice
  * closures (the catalog oracles carry the exactness story; these
  * pin the invariants and the divergence edges the sf-fixtures
  * cannot reach). */
class Round19OpsSpec extends SparkSpec {
  import spark.implicits._

  test("keyUniqueness: nullable key column is never a candidate key") {
    // the r18 advice divergence edge: Spark's struct-distinct counts a
    // NULL member as a value while SQL DISTINCT drops it — the operator
    // now excludes NULL-bearing combinations on both engines instead
    val df = Seq((Some(1L), "a"), (None: Option[Long], "b"),
      (Some(2L), "a"), (Some(2L), "c")).toDF("u", "t")
    val out = graft.clean.Profiler.keyUniqueness(
        df, Seq(Seq("u"), Seq("u", "t")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getBoolean(6))).toMap
    // u: 4 rows, 1 null row, distinct {1, 2} = 2, dup = 4 - 1 - 2 = 1
    assert(out("u") == ((4L, 1L, 2L, 1L, 250000L, false)))
    // (u, t): 3 null-free combos all distinct — but the null row alone
    // disqualifies candidacy
    assert(out("u,t") == ((4L, 1L, 3L, 0L, 0L, false)))
  }

  test("keyUniqueness: empty frame reports explicit zeros, not NULL sums") {
    val df = Seq((1L, "a")).toDF("u", "t").filter(col("u") < 0L)
    val r = graft.clean.Profiler.keyUniqueness(df, Seq(Seq("u"))).collect()
    assert(r.length == 1)
    assert((r.head.getLong(1), r.head.getLong(2), r.head.getLong(3),
      r.head.getLong(4)) == ((0L, 0L, 0L, 0L)))
    assert(r.head.getBoolean(6)) // vacuously a key: no rows, no nulls
  }

  test("columnEntropy: all-NULL column reports the explicit zero row") {
    // the r18 advice divergence edge: the aggregate must emit one row
    // with zero counts (the oracle mirror runs without GROUP BY)
    val df = Seq(("a", Option.empty[String]), ("b", None), ("c", None))
      .toDF("u", "z")
    val out = graft.clean.Profiler.columnEntropy(df, Seq("u", "z"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5))).toMap
    assert(out("z") == ((0L, 0L, 0L, 0.0, 0.0)))
    // the sibling non-degenerate column is untouched by the coalesce
    val lnThird = math.floor(1.0 / 3.0 * math.log(3.0) * 1e12 + 0.5).toLong * 3
    assert((out("u")._1, out("u")._2, out("u")._3, out("u")._4)
      == ((3L, 3L, lnThird, lnThird / 1e12)))
    assert(math.abs(out("u")._5 - 1.0) < 1e-9)
  }
}
