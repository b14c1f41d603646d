package graft

import graft.clean.Profiler
import graft.enrich.TimeSeriesOps

/** Semantic pins for the trend/dependence audit wave: Mann-Kendall,
  * lag autocorrelation, mutual-information/chi-squared, and the
  * Benford first-digit audit (the catalog oracles carry the
  * engine-parity story; these pin the statistics themselves).
  */
class TrendDependenceSpec extends SparkSpec {
  import spark.implicits._

  private val day = 86400000000L

  private def daily(counts: Seq[Int]) =
    counts.zipWithIndex
      .flatMap { case (c, d) => Seq.fill(c)(d.toLong * day + 1L) }
      .map(Tuple1(_)).toDF("t_us")

  test("mannKendall: strictly increasing series scores S = n(n-1)/2") {
    val out = TimeSeriesOps.mannKendall(daily(1 to 10), "t_us", day).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 10L)                 // n_days
    assert(r.getLong(2) == 45L)                 // S: all 45 pairs ascending
    // no ties: 18*Var = n(n-1)(2n+5) = 10*9*25
    assert(r.getLong(3) == 2250L)
    // z = 44 / sqrt(125) = 3.9355 > 1.96
    assert(math.abs(r.getDouble(4) - 44.0 / math.sqrt(125.0)) < 1e-9)
    assert(r.getString(5) == "increasing")
  }

  test("mannKendall: constant series has S = 0 and zero tie-corrected variance") {
    val out = TimeSeriesOps.mannKendall(daily(Seq.fill(5)(2)), "t_us", day)
      .collect().head
    assert(out.getLong(2) == 0L)
    // one tie group of 5: 5*4*25 - 5*4*15 = 500 - 300... n(n-1)(2n+5)
    // = 5*4*15 = 300 equals the tie term exactly -> Var = 0, z = 0
    assert(out.getLong(3) == 0L)
    assert(out.getDouble(4) == 0.0)
    assert(out.getString(5) == "none")
  }

  test("mannKendall: calendar gaps zero-fill (a gap day is a low observation)") {
    // events on days 0 and 3 only: the zero-filled days 1-2 rank below
    val ev = Seq(0L, 0L, 3L * day).map(Tuple1(_)).toDF("t_us")
    val out = TimeSeriesOps.mannKendall(ev, "t_us", day).collect().head
    assert(out.getLong(0) == 4L)                // 4 calendar days
    assert(out.getLong(1) == 2L)                // 2 non-zero days
    // series 2,0,0,1: pairs (i<j) signs: (2,0)-,(2,0)-,(2,1)-,(0,0)0,
    // (0,1)+,(0,1)+ -> S = -1
    assert(out.getLong(2) == -1L)
  }

  test("autocorrelation: period-2 series has r(1) = -1, r(2) = +1") {
    val out = TimeSeriesOps.autocorrelation(
        daily(Seq(1, 3, 1, 3, 1, 3)), "t_us", day, maxLag = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out(1L) == (5L, -1.0))
    assert(out(2L) == (4L, 1.0))
    assert(out(3L)._2 == -1.0)
  }

  test("autocorrelation: constant series guards to r = 0") {
    val out = TimeSeriesOps.autocorrelation(
        daily(Seq.fill(6)(2)), "t_us", day, maxLag = 2).collect()
    assert(out.forall(_.getDouble(2) == 0.0))
  }

  test("mutualInfo: perfect dependence = ln(2) nats, Cramér's V = 1") {
    val docs = (Seq.fill(5)(("a1", "b1")) ++ Seq.fill(5)(("a2", "b2")))
      .toDF("lang", "source")
    val r = Profiler.mutualInfo(docs, "lang", "source").collect().head
    assert(r.getAs[Long]("n_rows") == 10L && r.getAs[Long]("n_cells") == 2L)
    // each cell: 5*ln(2) unats quantized -> 2 * 3465736
    assert(r.getAs[Long]("mi_unats") == 6931472L)
    assert(math.abs(r.getAs[Double]("mi_nats") - math.log(2.0)) < 1e-5)
    // full 2x2 chi2 with empty cells folded in: 10 (= n)
    assert(math.abs(r.getAs[Double]("chi2") - 10.0) < 1e-5)
    assert(math.abs(r.getAs[Double]("cramers_v") - 1.0) < 1e-5)
  }

  test("mutualInfo: independence = 0 MI, 0 chi2") {
    val docs = Seq("a1", "a2").flatMap(a => Seq("b1", "b2").flatMap(b =>
      Seq.fill(2)((a, b)))).toDF("lang", "source")
    val r = Profiler.mutualInfo(docs, "lang", "source").collect().head
    assert(r.getAs[Long]("mi_unats") == 0L)
    assert(math.abs(r.getAs[Double]("chi2")) < 1e-6)
    assert(math.abs(r.getAs[Double]("cramers_v")) < 1e-3)
  }

  test("benfordAudit: digit extraction at the cents grain, spine complete") {
    val vals = Seq(1.0, 25.5, 999.99, 0.09, 0.005, -3.0)
      .map(Tuple1(_)).toDF("value")
    val out = Profiler.benfordAudit(vals, "value")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 0.005 -> cents 0 (excluded); -3.0 -> negative (excluded)
    // 1.0 -> 100 -> digit 1; 25.5 -> 2550 -> 2; 999.99 -> 99999 -> 9;
    // 0.09 -> 9 -> 9
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 0L, 4L -> 0L, 5L -> 0L,
      6L -> 0L, 7L -> 0L, 8L -> 0L, 9L -> 2L))
  }

  test("benfordAudit: expected shares are the quantized Benford closed form") {
    val vals = Seq(1.0).map(Tuple1(_)).toDF("value")
    val exp = Profiler.benfordAudit(vals, "value")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(exp(1L) == 301030L && exp(2L) == 176091L && exp(9L) == 45757L)
    // a probability distribution (up to ppm quantization)
    assert(math.abs(exp.values.sum - 1000000L) <= 5L)
  }
}
