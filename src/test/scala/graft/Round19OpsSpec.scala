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

  // ---- int64 overflow-edge fixtures (VERDICT r17 next-3): each op
  // must auto-pre-divide above its documented exact window instead of
  // silently wrapping (the temperatureEss/cv2 defect class). Fixture
  // sizes are chosen as powers of two so the double fallback is
  // exactly representable and the assertions stay equality-tight.

  test("tCloseness above the exact int64 window auto-pre-divides (no wrap)") {
    import graft.llmdata.Curation
    // two disjoint 2^22-row groups: n_g*N = 2^45 ~ 3.5e13 >> 4.6e12,
    // and the old expression's numerator*1e6 ~ 3.5e19 wrapped negative
    val n = 1L << 22
    val df = spark.range(2L * n)
      .select(when(col("id") < n, "g1").otherwise("g2").as("q"),
        when(col("id") < n, "a").otherwise("b").as("v"))
    val out = Curation.tCloseness(df, Seq("q"), "v").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("tvd_ppm")).toMap
    // fully disjoint halves: tvd = 1/2 exactly on both groups
    assert(out == Map("g1" -> 500000L, "g2" -> 500000L))
  }

  test("shuffleAudit above the exact window auto-pre-divides (no wrap)") {
    import graft.llmdata.Curation
    // one source of 3.1e6 docs: n_s(n_s-1)*1e6 ~ 9.6e18 wrapped before
    val n = 3100000L
    val df = spark.range(n).select(col("id").as("doc_id"), lit("s").as("source"))
    val r = Curation.shuffleAudit(df).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_docs") == n)
    assert(r.head.getAs[Long]("n_adjacent_same") == n - 1)
    // all-same-source expectation: n(n-1)*1e6/n = (n-1)*1e6 exactly
    assert(r.head.getAs[Long]("expected_same_micro") == (n - 1) * 1000000L)
  }

  test("epochsReport above the exact budget window pre-scales (no wrap)") {
    import graft.llmdata.Curation
    val docs = Seq(("s1", "a b c d e f g h i j")).toDF("source", "text")
    val budget = 16_000_000_000_000L // 1.6e13 > the ~9.2e12 window
    // full-share target: the allocation itself exceeds the x1e6
    // window, so the epochs ratio takes the double path
    val full = Curation.epochsReport(docs, budget, Map("s1" -> 1000000L))
      .collect().head
    assert(full.getAs[Long]("alloc_tokens") == budget)
    assert(full.getAs[Long]("epochs_micro") == budget / 10L * 1000000L)
    // half-share target: allocation back inside the window — exact path
    val half = Curation.epochsReport(docs, budget, Map("s1" -> 500000L))
      .collect().head
    assert(half.getAs[Long]("alloc_tokens") == budget / 2L)
    assert(half.getAs[Long]("epochs_micro") == budget / 2L / 10L * 1000000L)
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
