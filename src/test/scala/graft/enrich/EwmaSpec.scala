package graft.enrich

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EwmaSpec extends SparkSpec {

  /** pandas ewm(span, adjust=False).mean() reimplemented directly. */
  private def pandasEwm(xs: Seq[Option[Double]], span: Int, minPeriods: Int): Seq[Option[Double]] = {
    val alpha = 2.0 / (span + 1.0)
    var ema: Option[Double] = None
    var cnt = 0
    xs.map {
      case Some(x) =>
        ema = Some(ema.fold(x)(e => alpha * x + (1.0 - alpha) * e))
        cnt += 1
        if (cnt >= math.max(minPeriods, 1)) ema else None
      case None =>
        if (ema.isDefined && cnt >= math.max(minPeriods, 1)) ema else None
    }
  }

  test("ewma matches pandas ewm(adjust=False) recursion") {
    val xs = Seq(Some(10.0), Some(12.0), None, Some(9.0), Some(11.5), Some(8.0), None, Some(14.0))
    import spark.implicits._
    val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("i", "x")
    val got = df.select($"i", Ewma.over($"x", 3, 0, Nil, Seq($"i")).as("e"))
      .orderBy("i").collect().map(r => Option(r.get(1)).map(_.asInstanceOf[Double]))
    val want = pandasEwm(xs, 3, 0)
    assert(got.toSeq == want)
  }

  test("ewma honors min_periods (null until n non-null seen)") {
    val xs = Seq(Some(10.0), None, Some(12.0), Some(9.0), Some(11.0))
    import spark.implicits._
    val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("i", "x")
    val got = df.select($"i", Ewma.over($"x", 3, 3, Nil, Seq($"i")).as("e"))
      .orderBy("i").collect().map(r => Option(r.get(1)).map(_.asInstanceOf[Double]))
    assert(got.take(3).forall(_.isEmpty)) // only 2 non-null seen by row 2
    assert(got(3).isDefined && got(4).isDefined)
    assert(got.toSeq == pandasEwm(xs, 3, 3))
  }

  test("ewma partitions independently") {
    import spark.implicits._
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("b", 1L, 100.0), ("b", 2L, 50.0))
      .toDF("g", "i", "x")
    val got = df.select($"g", $"i", Ewma.over($"x", 3, 0, Seq($"g"), Seq($"i")).as("e"))
      .orderBy("g", "i").as[(String, Long, Double)].collect()
    assert(got(0)._3 == 10.0)
    assert(got(1)._3 == 0.5 * 20.0 + 0.5 * 10.0)
    assert(got(2)._3 == 100.0)
    assert(got(3)._3 == 0.5 * 50.0 + 0.5 * 100.0)
  }
}
