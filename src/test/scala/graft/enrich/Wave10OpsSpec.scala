package graft.enrich

import graft.SparkSpec
import graft.llmdata.TextAnalysis

/** Semantic pins for the retention-half-life / vocab-growth wave. */
class Wave10OpsSpec extends SparkSpec {
  import spark.implicits._

  test("retentionHalfLife: planted 1/2^d decay fits lambda = ln 2 exactly") {
    val day = 86400000000L
    // one cohort of 16 users, all first active day 0; day d keeps
    // 16/2^d of them -> R(d) = 2^-d, lambda = ln2, half-life 1 day
    val ev = (1 to 16).map(u => (u.toLong, 0L)) ++
      (1 to 8).map(u => (u.toLong, 1L)) ++
      (1 to 4).map(u => (u.toLong, 2L)) ++
      (1 to 2).map(u => (u.toLong, 3L)) ++
      Seq((1L, 4L))
    val df = ev.map { case (u, d) => (u, d * day + 1L) }
      .toDF("user_id", "t_us")
    val r = Funnel.retentionHalfLife(df, "user_id", "t_us", day)
      .collect().head
    assert(r.getLong(0) == 4L)
    assert(math.abs(r.getDouble(1) - math.log(2.0)) < 1e-3, s"lambda: $r")
    assert(math.abs(r.getDouble(2) - 1.0) < 2e-3, s"half-life: $r")
  }

  test("retentionHalfLife: young cohorts never vote past their horizon") {
    val day = 86400000000L
    // cohort A (u1,u2) spans days 0-2 with perfect retention; cohort B
    // (u3) starts on day 2 -- it can observe offsets 0 only, so the
    // pooled denominators for offsets 1-2 exclude it
    val ev = Seq((1L, 0L), (2L, 0L), (1L, 1L), (2L, 1L), (1L, 2L),
      (2L, 2L), (3L, 2L))
    val df = ev.map { case (u, d) => (u, d * day) }.toDF("user_id", "t_us")
    val r = Funnel.retentionHalfLife(df, "user_id", "t_us", day)
      .collect().head
    // perfect retention among observing cohorts: R(1) = R(2) = 1,
    // ln R = 0 -> slope 0 -> lambda 0 -> guarded half-life -1
    assert(r.getLong(0) == 2L)
    assert(r.getDouble(1) == 0.0)
    assert(r.getDouble(2) == -1.0)
  }

  test("vocabGrowthCurve: prefix vocabulary via first-doc membership") {
    val docs = Seq((0L, "a b"), (1L, "a c"), (2L, "d"), (3L, "a b"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.vocabGrowthCurve(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (25L, 0L, 1L, 2L, 2L),
      (50L, 1L, 2L, 4L, 3L),
      (75L, 2L, 3L, 5L, 4L),
      (100L, 3L, 4L, 7L, 4L)))
  }
}
