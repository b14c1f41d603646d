package graft

import org.apache.spark.sql.functions._

import graft.enrich.{EventPaths, TimeSeriesOps}
import graft.llmdata.TextAnalysis

/** Semantic pins for the round-16 report operators (the catalog
  * oracles carry their exactness story; these pin the invariants). */
class Round16OpsSpec extends SparkSpec {
  import spark.implicits._

  test("vocabHeadCoverage: exact under ties, monotone, full at k >= V") {
    // vocabulary: a×6, b×3, c×3, d×1, e×1 — ties at 3 and at 1
    val docs = Seq(
      (1L, "a a a b b c"), (2L, "a a a b c c"), (3L, "d e"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.vocabHeadCoverage(docs, Seq(1L, 2L, 3L, 5L, 99L))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // totals: 14 tokens, 5 types, everywhere
    out.values.foreach { case (_, _, tot, types, _) =>
      assert(tot == 14L && types == 5L)
    }
    assert(out(1L)._2 == 6L)            // top-1 = a
    // top-2: a + ONE of the tied (b, c) — both count 3, so coverage
    // is exact regardless of which the tie-break takes
    assert(out(2L)._2 == 9L)
    assert(out(3L)._2 == 12L)           // a + b + c
    assert(out(5L)._2 == 14L && out(5L)._5 == 1000000L)
    assert(out(99L)._1 == 5L && out(99L)._2 == 14L) // capped at V
    // coverage monotone in k
    val byK = out.toSeq.sortBy(_._1).map(_._2._2)
    assert(byK == byK.sorted)
  }

  test("cusumChangepoint: planted mean shift lands on the shift day") {
    // days 0-9 at 2/day, days 10-19 at 10/day: the |CUSUM| peak of a
    // single mean-shift model is the LAST day of the low regime
    val day = 86400000000L
    val events = ((0 until 10).flatMap(d => Seq.fill(2)(d)) ++
      (10 until 20).flatMap(d => Seq.fill(10)(d)))
      .map(d => Tuple1(d * day + 1L)).toDF("t_us")
    val out = TimeSeriesOps.cusumChangepoint(events, "t_us", day)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
        r.getBoolean(4)))
      .sortBy(_._1)
    assert(out.length == 20)
    assert(out.count(_._4) == 1)
    assert(out.find(_._4).get._1 == 9L, s"changepoint: $out")
    // the running sum ends at exactly zero (sum of all deviations)
    assert(out.last._3 == 0L)
    // calendar gap-fill: a day with no events still gets a row
    val gappy = Seq(0L, 0L, 3L).map(d => Tuple1(d * day)).toDF("t_us")
    val g = TimeSeriesOps.cusumChangepoint(gappy, "t_us", day).collect()
    assert(g.length == 4 && g.map(_.getLong(1)).toSeq == Seq(2L, 0L, 0L, 1L))
  }

  test("histogramQuantileAudit: the in-bucket invariant holds everywhere") {
    val events = (0 until 400).map { i =>
      (s"t${i % 3}", (i * 13 % 250) + (i % 7) * 0.5, i.toLong)
    }.toDF("event_type", "value", "event_id")
    val out = TimeSeriesOps.histogramQuantileAudit(events,
        "event_type", "value", "event_id", 0.0, 250.0, 25)
      .collect()
    assert(out.length == 9) // 3 keys x 3 quantiles
    assert(out.forall(_.getBoolean(6)),
      "the grid bucket must contain the exact quantile")
    // the exact value sits inside [value_lo, value_lo + width)
    out.foreach { r =>
      assert(r.getDouble(5) >= r.getDouble(4) &&
        r.getDouble(5) < r.getDouble(4) + 10.0)
    }
  }

  test("ivfProbeSweep: probe-2 recall dominates probe-1, bounds hold") {
    val emb = (0L until 120L).map { i =>
      (i, (0 until 8).map(d => ((i * 7 + d * 13) % 17 - 8) / 8.0f).toArray, 0)
    }.toDF("vec_id", "embedding", "label")
    val out = graft.llmdata.AnnSearch.ivfProbeSweep(emb,
        col("vec_id") < 20L, k = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.keySet == Set(1L, 2L))
    val (n1, h1, p1, r1) = out(1L)
    val (n2, h2, p2, r2) = out(2L)
    assert(n1 == n2 && p1 == n1 * 5 && p2 == p1)
    // probe-2 candidates are a superset: recall can only improve
    assert(h2 >= h1 && r2 >= r1)
    assert(r1 >= 0L && r2 <= 1000000L)
  }

  test("sourceReuseMatrix: within-source and cross-source mass separate") {
    val base = "alpha bravo charlie delta echo foxtrot golf hotel"
    val docs = Seq(
      (1L, base, "A"), (2L, base, "A"),          // within-A true pair
      (3L, base, "B"),                            // cross A-B true pairs
      (4L, "totally different words about nothing shared here", "C"))
      .toDF("doc_id", "text", "source")
    val out = graft.llmdata.Dedup.sourceReuseMatrix(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // pairs normalize to source_a <= source_b
    out.keys.foreach { case (a, b) => assert(a <= b) }
    assert(out(("A", "A")) == ((1L, 1L, 333333L)))
    assert(out(("A", "B"))._2 == 2L) // 1-3 and 2-3
    assert(!out.contains(("A", "C")) && !out.contains(("C", "C")))
    // shares are exact ppm of all true pairs (3 here)
    assert(out.values.map(_._3).sum <= 1000000L)
  }

  test("dimVariance: constant dims score zero, spread dims rank first") {
    val emb = (0L until 30L).map { i =>
      // dim 0 constant, dim 1 high spread, dims 2-7 small spread
      (i, (Array(0.5f, (i % 10).toFloat / 5.0f) ++
        (2 until 8).map(d => ((i + d) % 3).toFloat / 100.0f)).toArray, 0)
    }.toDF("vec_id", "embedding", "label")
    val out = graft.llmdata.EmbeddingOps.dimVariance(emb).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(0L)._1 == 0L && out(0L)._2 == 0L) // constant: zero var
    assert(out(1L)._3 == 1L, s"dim 1 must rank first: $out")
    assert(out.values.map(_._2).sum <= 1000000L) // truncating shares
    assert(out.size == 8)
  }

  test("fkOrphans: counts missing parents, null keys are orphans") {
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val out = graft.clean.Profiler
      .fkOrphans(child, "fk", parent, "pk", "c->p").collect().head
    assert(out.getString(0) == "c->p")
    assert(out.getLong(1) == 5L && out.getLong(2) == 4L) // rows, keys
    // orphans: fk=9 (1 row) + fk=null (1 row) = 2 rows, 2 keys
    assert(out.getLong(3) == 2L && out.getLong(4) == 2L)
    assert(out.getLong(5) == 2L * 1000000L / 5L)
    // a fully-covered relation reports zero
    val clean = graft.clean.Profiler
      .fkOrphans(Seq(1L, 2L).toDF("fk"), "fk", parent, "pk", "ok")
      .collect().head
    assert(clean.getLong(3) == 0L && clean.getLong(5) == 0L)
  }

  test("peakConcurrency: carry-ins, inclusive ends, adjacency rules") {
    val day = 86400000000L
    // s1: day0 10:00 -> day2 02:00 (spans three days)
    // s2: day0 12:00 -> day0 12:00 (point session, overlaps s1)
    // s3: day1 exactly [5:00, 6:00]; s4 starts the same microsecond
    //     s3 ends (inclusive ends -> concurrent with s3 AND s1)
    val h = 3600000000L
    val sessions = Seq(
      (0 * day + 10 * h, 2 * day + 2 * h),
      (0 * day + 12 * h, 0 * day + 12 * h),
      (1 * day + 5 * h, 1 * day + 6 * h),
      (1 * day + 6 * h, 1 * day + 7 * h))
      .toDF("t_start", "t_end")
    val out = graft.enrich.Sessionize
      .peakConcurrency(sessions, "t_start", "t_end", day)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out(0L) == ((2L, 2L))) // s1 + the point session
    // day1: s1 carried in (+1 at midnight), s3 and s4 overlap at 6:00
    // -> peak 3
    assert(out(1L) == ((3L, 3L)))
    assert(out(2L) == ((1L, 1L))) // s1's tail only
    // end-exclusive adjacency is NOT concurrency: a session starting
    // 1us after another ends never overlaps it
    val adj = Seq((0L, 10L), (11L, 20L)).toDF("t_start", "t_end")
    val a = graft.enrich.Sessionize
      .peakConcurrency(adj, "t_start", "t_end", day).collect().head
    assert(a.getLong(2) == 1L)
  }

  test("transitionEntropy: deterministic chain ~0, uniform fan ~ln(m)") {
    // user 1: a->b always (deterministic); users 2-4: c fans to
    // three distinct successors uniformly
    val events = Seq(
      (1L, 10L, "a", 1L), (1L, 20L, "b", 2L), (1L, 30L, "a", 3L),
      (1L, 40L, "b", 4L), (1L, 50L, "a", 5L), (1L, 60L, "b", 6L),
      (2L, 10L, "c", 7L), (2L, 20L, "x", 8L),
      (3L, 10L, "c", 9L), (3L, 20L, "y", 10L),
      (4L, 10L, "c", 11L), (4L, 20L, "z", 12L))
      .toDF("user_id", "t_us", "event_type", "event_id")
    val out = EventPaths.transitionEntropy(events,
        "user_id", "t_us", "event_type", "event_id")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    assert(out("a") == ((3L, 1L, 0L)))  // deterministic: H = 0
    val (cn, ct, ch) = out("c")
    assert(cn == 3L && ct == 3L)
    // uniform over 3: H = ln 3 = 1.0986 nats -> 1098612 micro-nats
    assert(math.abs(ch - 1098612L) <= 1L, s"got $ch")
  }
}
