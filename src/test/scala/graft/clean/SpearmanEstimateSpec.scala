package graft.clean

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-17 profiler wave: doubled-midrank Spearman (monotone
  * invariance, tie midranks, the textbook mixed-tie value) and the
  * end-biased self-join size estimate (exact on a uniform tail,
  * signed error on a non-uniform one).
  */
class SpearmanEstimateSpec extends SparkSpec {
  import spark.implicits._

  test("spearmanMatrix is 1 on any monotone map, -1 on its reverse") {
    val up = Seq((1.0, 1.0), (2.0, 4.0), (3.0, 9.0), (4.0, 16.0),
      (5.0, 25.0)).toDF("x", "y")
    val r1 = Profiler.spearmanMatrix(up, Seq(("x", 1L), ("y", 1L)))
      .collect()(0)
    assert(r1.getAs[Double]("rho") === 1.0)
    val down = Seq((1.0, 25.0), (2.0, 16.0), (3.0, 9.0), (4.0, 4.0),
      (5.0, 1.0)).toDF("x", "y")
    val r2 = Profiler.spearmanMatrix(down, Seq(("x", 1L), ("y", 1L)))
      .collect()(0)
    assert(r2.getAs[Double]("rho") === -1.0)
  }

  test("spearmanMatrix tie midranks: split ties cancel to 0") {
    // x ties 1,1 point at y 3 and 5 — the midrank split cancels
    val df = Seq((1L, 3L), (1L, 5L), (2L, 4L)).toDF("x", "y")
    val r = Profiler.spearmanMatrix(df, Seq(("x", 1L), ("y", 1L)))
      .collect()(0)
    assert(r.getAs[Long]("n_rows") === 3L)
    assert(r.getAs[Double]("rho") === 0.0)
  }

  test("spearmanMatrix matches the hand moments on the textbook tie case") {
    val df = Seq((1L, 5L), (2L, 6L), (3L, 7L), (4L, 8L), (5L, 7L))
      .toDF("x", "y")
    val r = Profiler.spearmanMatrix(df, Seq(("x", 1L), ("y", 1L)))
      .collect()(0)
    // doubled ranks x: 2,4,6,8,10; y: 2,4,7,10,7 (7s share midrank 3.5)
    val (num, va, vb) = (5.0 * 212 - 900, 5.0 * 220 - 900, 5.0 * 218 - 900)
    assert(r.getAs[Double]("rho") === num / math.sqrt(va * vb))
  }

  test("spearmanMatrix emits every pair once for k columns") {
    val df = Seq((1.0, 2.0, 3.0), (2.0, 1.0, 4.0), (3.0, 3.0, 1.0))
      .toDF("a", "b", "c")
    val rows = Profiler.spearmanMatrix(df,
        Seq(("a", 1L), ("b", 1L), ("c", 1L)))
      .orderBy("col_a", "col_b").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("a", "b"), ("a", "c"), ("b", "c")))
  }

  test("joinSizeEstimate: uniform tail is exact, skewed tail errs signed") {
    val uniform = (Seq.fill(3)("a") ++ Seq.fill(3)("b") ++
      Seq.fill(60)("h")).toDF("k")
    val r = Profiler.joinSizeEstimate(uniform, "k").collect()(0)
    assert(r.getAs[Long]("actual_pairs") === 3618L)
    assert(r.getAs[Long]("n_heavy") === 1L)
    assert(r.getAs[Long]("est_pairs") === 3618L)
    assert(r.getAs[Long]("err_ppm") === 0L)
    val skewed = (Seq.fill(3)("a") ++ Seq.fill(3)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(60)("h")).toDF("k")
    val s = Profiler.joinSizeEstimate(skewed, "k").collect()(0)
    assert(s.getAs[Long]("actual_pairs") === 3634L)
    assert(s.getAs[Long]("est_pairs") === 3633L) // 3600 + 100 div 3
    assert(s.getAs[Long]("err_ppm") === -1000000L / 3634L)
  }

  test("anovaF matches the textbook decomposition on hand groups") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 4L), ("b", 5L), ("b", 6L)).toDF("g", "x")
    val r = Profiler.anovaF(df, "g", "x").collect()(0)
    assert(r.getAs[Long]("n_rows") === 6L)
    assert(r.getAs[Long]("n_groups") === 2L)
    assert(r.getAs[Long]("ssb_micro") === 13500000L)
    assert(r.getAs[Long]("ssw_micro") === 4000000L)
    assert(r.getAs[Double]("f_stat") === 13.5)
  }

  test("anovaF is 0 on identical groups and guards the degenerate cases") {
    val same = Seq(("a", 2L), ("a", 4L), ("b", 2L), ("b", 4L))
      .toDF("g", "x")
    val r = Profiler.anovaF(same, "g", "x").collect()(0)
    assert(r.getAs[Long]("ssb_micro") === 0L)
    assert(r.getAs[Double]("f_stat") === 0.0)
    val one = Seq(("a", 2L), ("a", 3L)).toDF("g", "x")
    assert(Profiler.anovaF(one, "g", "x").collect()(0)
      .getAs[Double]("f_stat") === 0.0)
  }

  test("nullDrift reports exact per-half null shares and the signed delta") {
    def day(d: Long) = d * 86400000000L
    // days 0..3, midpoint 1: col a nulls 1/4 early vs 3/4 late
    val rows = Seq(
      (Some("x"), day(0)), (Some("x"), day(0)),
      (None: Option[String], day(1)), (Some("x"), day(1)),
      (None: Option[String], day(2)), (None: Option[String], day(2)),
      (Some("x"), day(3)), (None: Option[String], day(3)))
      .toDF("a", "t_us")
    val r = Profiler.nullDrift(rows, Seq("a"), "t_us").collect()(0)
    assert(r.getAs[String]("column") === "a")
    assert((r.getAs[Long]("n_first"), r.getAs[Long]("n_second")) ===
      ((4L, 4L)))
    assert(r.getAs[Long]("null_first_ppm") === 250000L)
    assert(r.getAs[Long]("null_second_ppm") === 750000L)
    assert(r.getAs[Long]("delta_ppm") === 500000L)
  }

  test("joinSizeEstimate: all-heavy input needs no tail term") {
    val df = Seq.fill(60)("h").toDF("k")
    val r = Profiler.joinSizeEstimate(df, "k").collect()(0)
    assert(r.getAs[Long]("est_pairs") === 3600L)
    assert(r.getAs[Long]("err_ppm") === 0L)
  }
}
