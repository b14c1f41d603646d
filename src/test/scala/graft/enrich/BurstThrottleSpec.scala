package graft.enrich

import graft.SparkSpec

class BurstThrottleSpec extends SparkSpec {
  import spark.implicits._

  test("burstThrottle keeps burst heads and counts suppressed chains") {
    // user 1: events at t=0,5,9,30 with cooldown 10 — 0,5,9 chain
    // (5-0=5<=10, 9-5=4<=10), 30 starts a new burst (30-9=21>10)
    val ev = Seq(
      (1L, 1L, 0L), (2L, 1L, 5L), (3L, 1L, 9L), (4L, 1L, 30L),
      // user 2: a drizzle every 8 under cooldown 10 — ONE burst
      (10L, 2L, 0L), (11L, 2L, 8L), (12L, 2L, 16L), (13L, 2L, 24L)
    ).toDF("event_id", "user_id", "t")
    val out = Sessionize.burstThrottle(ev, "user_id", "t", "event_id", 10L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out((1L, 1L)) == ((0L, 2L, 9L)))
    assert(out((1L, 2L)) == ((30L, 0L, 0L)))
    // the chain rule: every event within cooldown of its PREDECESSOR
    // joins the burst, so a sustained drizzle stays one burst
    assert(out((2L, 1L)) == ((0L, 3L, 24L)))
    assert(out.size == 3)
  }

  test("deterministic under repartitioning") {
    val ev = (0L until 200L).map(i => (i, i % 7, (i * 13) % 997))
      .toDF("event_id", "user_id", "t")
    val a = Sessionize.burstThrottle(ev, "user_id", "t", "event_id", 50L)
      .collect().map(_.toSeq).toSet
    val b = Sessionize.burstThrottle(ev.repartition(9), "user_id", "t",
      "event_id", 50L).collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
