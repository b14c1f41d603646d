package graft.enrich

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("sessions break on gaps above the threshold, per key") {
    val ev = Seq(
      // user 1: gaps 5, 100 (break), 5
      (1L, 1L, 0L), (2L, 1L, 5L), (3L, 1L, 105L), (4L, 1L, 110L),
      // user 2: single event
      (5L, 2L, 50L))
      .toDF("event_id", "user_id", "t")
    val got = Sessionize.sessionize(ev, "user_id", "t", "event_id", gap = 10L)
      .select("event_id", "session_seq").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
  }

  test("a gap exactly at the threshold stays in-session; ties break on tieCol") {
    val ev = Seq(
      (1L, 1L, 0L), (2L, 1L, 10L), // gap == 10 -> same session
      (3L, 1L, 10L))               // tie on t: ordered after event 2, gap 0
      .toDF("event_id", "user_id", "t")
    val got = Sessionize.sessionize(ev, "user_id", "t", "event_id", gap = 10L)
      .select("event_id", "session_seq").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
