package graft.enrich

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-17 events wave: Kaplan–Meier survival (censoring + the
  * micro-nat hazard quantization), inter-arrival bot regularity
  * (exact cv² edges), EWMA control-chart anomalies (replayed against
  * the textbook recursion), and the Lorenz decile table (tie runs at
  * decile boundaries) — all on hand fixtures.
  */
class Wave11OpsSpec extends SparkSpec {
  import spark.implicits._

  private def q6(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong

  test("survivalKm: risk sets, deaths vs censoring, micro-nat log survival") {
    // lifetimes: u1 L3 death, u2 L1 death, u3 L0 death,
    // u4 L4 censored (alive at horizon 5), u5 L0 censored
    val events = Seq(
      ("u1", 0L), ("u1", 1L), ("u1", 3L),
      ("u2", 0L), ("u2", 1L),
      ("u3", 2L),
      ("u4", 1L), ("u4", 5L),
      ("u5", 5L)).toDF("u", "t")
    val rows = Funnel.survivalKm(events, "u", "t", bucket = 1L).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq === Seq(
      (0L, 5L, 1L, 1L), (1L, 3L, 1L, 0L),
      (3L, 2L, 1L, 0L), (4L, 1L, 0L, 1L)))
    val t0 = q6(math.log(4.0 / 5.0))
    val t1 = t0 + q6(math.log(2.0 / 3.0))
    val t3 = t1 + q6(math.log(1.0 / 2.0))
    assert(rows.map(_.getAs[Long]("log_s_micro")).toSeq ===
      Seq(t0, t1, t3, t3))
    assert(rows.forall(!_.getAs[Boolean]("absorbed")))
  }

  test("survivalKm: deaths exhausting the risk set absorb the curve") {
    val events = Seq(("a", 0L), ("a", 2L), ("b", 5L)).toDF("u", "t")
    val rows = Funnel.survivalKm(events, "u", "t", bucket = 1L).collect()
    // t=0: b censored (alive at horizon); t=2: a dies with n_risk 1
    assert(rows.length === 2)
    assert(!rows(0).getAs[Boolean]("absorbed"))
    assert(rows(0).getAs[Long]("log_s_micro") === 0L) // censoring only
    assert(rows(1).getAs[Boolean]("absorbed"))
    assert(rows(1).isNullAt(rows(1).fieldIndex("log_s_micro")))
  }

  test("botRegularity: timer cadence and same-instant bursts flag, bursty traffic passes") {
    def us(s: Long) = s * 1000000L
    val events = (
      Seq(0L, 10L, 20L, 30L, 40L).map(s => ("timer", us(s))) ++
        Seq(0L, 1L, 101L, 102L, 202L).map(s => ("human", us(s))) ++
        Seq(0L, 5L, 9L).map(s => ("sparse", us(s))) ++
        Seq.fill(5)(("burst", us(7L)))).toDF("u", "t")
    val rows = TimeSeriesOps.botRegularity(events, "u", "t")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(!rows.contains("sparse")) // below minEvents
    assert(rows("timer").getAs[Long]("cv2_ppm") === 0L)
    assert(rows("timer").getAs[Long]("mean_gap_s") === 10L)
    assert(rows("timer").getAs[Boolean]("is_bot"))
    // gaps 1,100,1,100: cv² = (4·20002 − 202²)/202² = 39204/40804
    assert(rows("human").getAs[Long]("cv2_ppm") ===
      39204L * 1000000L / 40804L)
    assert(!rows("human").getAs[Boolean]("is_bot"))
    assert(rows("burst").getAs[Long]("span_s") === 0L)
    assert(rows("burst").getAs[Boolean]("is_bot"))
  }

  test("ewmaAnomaly replays the textbook recursion with zero-filled days") {
    def day(d: Long) = d * 86400000000L
    val counts = Map(0L -> 4, 1L -> 4, 3L -> 40, 4L -> 1) // day 2 silent
    val events = counts.toSeq.flatMap { case (d, n) =>
      Seq.fill(n)(Tuple1(day(d)))
    }.toDF("t")
    val rows = TimeSeriesOps.ewmaAnomaly(events, "t").collect()
    assert(rows.map(_.getLong(0)).toSeq === (0L to 4L))
    // textbook replay: e_0 = x_0, e_t = 0.25 x_t + 0.75 e_{t-1}
    val xs = (0L to 4L).map(d => counts.getOrElse(d, 0).toDouble)
    val es = xs.tail.scanLeft(xs.head)((e, x) => 0.25 * x + 0.75 * e)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("n_events") === xs(i).toLong)
      if (i == 0) {
        assert(r.getAs[Long]("dev_ppm") === 0L)
        assert(!r.getAs[Boolean]("is_anomaly"))
      } else {
        val prior = es(i - 1)
        assert(r.getAs[Double]("ewma_prior") ===
          math.floor(prior * 1e6 + 0.5) / 1e6)
        val dev = math.floor((xs(i) - prior) / prior * 1e6 + 0.5).toLong
        assert(r.getAs[Long]("dev_ppm") === dev)
        assert(r.getAs[Boolean]("is_anomaly") === (math.abs(dev) >= 500000L))
      }
    }
    // the silent day and the spike both flag
    assert(rows(2).getAs[Boolean]("is_anomaly"))
    assert(rows(3).getAs[Boolean]("is_anomaly"))
  }

  test("categoryPsiDrift: hand halves, Laplace smoothing, micro-nat terms") {
    def day(d: Long) = d * 86400000000L
    // days 0..3, midpoint 1: first half days 0-1, second half 2-3
    // cat x: 4 early, 0 late; cat y: 2 early, 6 late
    val events = (
      Seq.fill(2)(("x", day(0))) ++ Seq.fill(2)(("x", day(1))) ++
        Seq(("y", day(0)), ("y", day(1))) ++
        Seq.fill(3)(("y", day(2))) ++ Seq.fill(3)(("y", day(3))))
      .toDF("c", "t")
    val rows = TimeSeriesOps.categoryPsiDrift(events, "c", "t").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("x", "y"))
    val x = rows(0); val y = rows(1)
    assert((x.getAs[Long]("n_first"), x.getAs[Long]("n_second")) ===
      ((4L, 0L)))
    assert((x.getAs[Long]("p_ppm"), x.getAs[Long]("q_ppm")) ===
      ((625000L, 125000L)))
    def term(p: Double, q: Double): Long =
      math.floor((p - q) * math.log(p / q) * 1e6 + 0.5).toLong
    assert(x.getAs[Long]("term_micro") === term(5.0 / 8, 1.0 / 8))
    assert(y.getAs[Long]("term_micro") === term(3.0 / 8, 7.0 / 8))
    val tot = x.getAs[Long]("term_micro") + y.getAs[Long]("term_micro")
    assert(rows.forall(_.getAs[Long]("psi_total_micro") === tot))
  }

  test("categoryPsiDrift is ~0 on an unshifted mix") {
    def day(d: Long) = d * 86400000000L
    val events = (0L to 3L).flatMap(d =>
      Seq(("a", day(d)), ("a", day(d)), ("b", day(d)))).toDF("c", "t")
    val rows = TimeSeriesOps.categoryPsiDrift(events, "c", "t").collect()
    assert(rows.forall(_.getAs[Long]("term_micro") === 0L))
    assert(rows.forall(_.getAs[Long]("psi_total_micro") === 0L))
  }

  test("binarySegmentation: global cut plus the per-side rescaled bests") {
    def day(d: Long) = d * 86400000000L
    // two shifts: 10,10 | 2,2 | 20,20 — global cut after day 3,
    // the left side re-detects the first shift after day 1
    val counts = Seq(10, 10, 2, 2, 20, 20)
    val events = counts.zipWithIndex.flatMap { case (n, d) =>
      Seq.fill(n)(Tuple1(day(d.toLong)))
    }.toDF("t")
    val rows = TimeSeriesOps.binarySegmentation(events, "t", 86400000000L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.toSeq === Seq(
      (1L, -1L, 3L, 6L, 64L, -112L),
      (2L, 0L, 1L, 4L, 24L, 32L),
      (2L, 1L, 4L, 2L, 40L, 0L)))
  }

  test("binarySegmentation ties break on the earlier bucket per side") {
    def day(d: Long) = d * 86400000000L
    // flat halves: every within-side cusum is 0, ties -> first day
    val events = (0 to 5).flatMap(d => Seq.fill(6)(Tuple1(day(d.toLong))))
      .toDF("t")
    val rows = TimeSeriesOps.binarySegmentation(events, "t", 86400000000L)
      .collect()
    assert(rows(0).getLong(2) === 0L) // global tie -> day 0
    assert(rows(1).getLong(5) === 0L)
    assert(rows(2).getLong(5) === 0L)
  }

  test("lorenzDeciles lands whole tie runs at decile boundaries") {
    val events = (
      Seq.fill(1)("a") ++ Seq.fill(1)("b") ++
        Seq.fill(2)("c") ++ Seq.fill(6)("d"))
      .zipWithIndex.map { case (u, i) => (u, i.toLong) }.toDF("u", "x")
    val rows = graft.llmdata.TextAnalysis.lorenzDeciles(events, "u")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val want =
      (1L to 5L).map(d => (d, 2L, 2L, 200000L)) ++
        (6L to 7L).map(d => (d, 3L, 4L, 400000L)) ++
        (8L to 10L).map(d => (d, 4L, 10L, 1000000L))
    assert(rows.toSeq === want)
  }
}
