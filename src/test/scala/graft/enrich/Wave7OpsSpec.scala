package graft.enrich

import graft.SparkSpec
import graft.clean.Profiler

/** Semantic pins for the conversion-latency / top-values wave. */
class Wave7OpsSpec extends SparkSpec {
  import spark.implicits._

  test("conversionLatency: first-from to first-at-or-after-to, per user") {
    val us = 1000000L
    // u1: signup@10s, purchase@70s -> 60s; u2: purchase@5s BEFORE
    // signup@20s, next purchase@140s -> 120s; u3: signup only -> never
    val ev = Seq(
      (1L, "signup", 10L), (1L, "purchase", 70L), (1L, "purchase", 500L),
      (2L, "purchase", 5L), (2L, "signup", 20L), (2L, "purchase", 140L),
      (3L, "signup", 30L))
      .map { case (u, t, s) => (u, t, s * us) }
      .toDF("user_id", "event_type", "t_us")
    val out = Funnel.conversionLatency(ev, "user_id", "t_us", "event_type",
        "signup", "purchase", qs = Seq(50, 100))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // converted: u1 (60s), u2 (120s); p50 = 60, p100 = 120
    assert(out(50L) == (2L, 60L))
    assert(out(100L) == (2L, 120L))
  }

  test("conversionLatency: same-timestamp conversion counts at 0 seconds") {
    val ev = Seq((1L, "signup", 5L), (1L, "purchase", 5L))
      .map { case (u, t, s) => (u, t, s * 1000000L) }
      .toDF("user_id", "event_type", "t_us")
    val out = Funnel.conversionLatency(ev, "user_id", "t_us", "event_type",
      "signup", "purchase", qs = Seq(50)).collect().head
    assert(out.getLong(1) == 1L && out.getLong(2) == 0L)
  }

  test("topValues: exact counts, shares, rank ties on value") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c") ++
      Seq("d")).map(v => (v, 1)).toDF("cat", "one")
    val out = Profiler.topValues(df, Seq("cat"), k = 3)
      .collect().map(r => (r.getLong(4), r.getString(1), r.getLong(2),
        r.getLong(3)))
      .sortBy(_._1)
    // ties at 3 break on value asc: b before c; d (count 1) cut at k=3
    assert(out.toSeq == Seq(
      (1L, "a", 5L, 416666L), (2L, "b", 3L, 250000L), (3L, "c", 3L, 250000L)))
  }

  test("rfmSegments: diagonal fixture lands each user on its own cell") {
    val day = 86400000000L
    // user u: u events on day u at value u -> r_val = 5-u, f_val = u,
    // m_val = u^2; every dimension's quintiles separate the 5 users,
    // recency inverts so user 5 (most recent) is segment 5
    val ev = (1 to 5).flatMap { u =>
      (1 to u).map(i => (u.toLong, u.toDouble, u * day + i))
    }.toDF("user_id", "value", "t_us")
    val out = GroupStats.rfmSegments(ev, "user_id", "t_us", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(out.toSeq == (1 to 5).map(u =>
      (u.toLong, u.toLong, u.toLong, 1L, 200000L)))
  }

  test("topValues: nulls excluded, shares over non-null rows") {
    val df = Seq[Tuple1[java.lang.Long]](Tuple1(1L), Tuple1(1L),
      Tuple1(null), Tuple1(2L)).toDF("x")
    val out = Profiler.topValues(df, Seq("x"), k = 5).collect()
      .map(r => r.getString(1) -> r.getLong(3)).toMap
    assert(out == Map("1" -> 666666L, "2" -> 333333L))
  }
}
