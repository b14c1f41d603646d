package graft.enrich

import graft.SparkSpec

class EventPathsSpec extends SparkSpec {
  import spark.implicits._

  private def transitions(k: Int, rows: (Long, Long, String, Long)*) =
    EventPaths.transitionTopK(
        rows.toDF("k", "t", "ty", "id"), "k", "t", "ty", "id", k)
      .collect()
      .map(r => (r.getString(0), r.getLong(5)) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

  test("transitions: per-key lead order, exact ppm, count-desc/dst-asc rank") {
    val out = transitions(3,
      (1L, 10L, "a", 1L), (1L, 20L, "b", 2L), (1L, 30L, "a", 3L),
      (2L, 5L, "a", 4L), (2L, 6L, "b", 5L),
      // equal-count tie between dst b and dst c from src z -> dst asc
      (3L, 1L, "z", 6L), (3L, 2L, "c", 7L),
      (4L, 1L, "z", 8L), (4L, 2L, "b", 9L))
    assert(out(("a", 1L)) == (("b", 2L, 2L, 1000000L)))
    assert(out(("b", 1L)) == (("a", 1L, 1L, 1000000L)))
    assert(out(("z", 1L)) == (("b", 1L, 2L, 500000L)))
    assert(out(("z", 2L)) == (("c", 1L, 2L, 500000L)))
  }

  test("transitions: k cuts each source independently; last events emit none") {
    val out = transitions(1,
      (1L, 1L, "a", 1L), (1L, 2L, "b", 2L), (1L, 3L, "c", 3L),
      (2L, 1L, "a", 4L), (2L, 2L, "b", 5L))
    // src a: only (a->b) x2 ranked 1; src b: (b->c) x1; c is terminal
    assert(out.keySet == Set(("a", 1L), ("b", 1L)))
    assert(out(("a", 1L))._2 == 2L)
  }

  test("transitions: cross-key boundaries never fabricate a step") {
    val out = transitions(3,
      (1L, 1L, "a", 1L),
      (2L, 2L, "b", 2L))
    assert(out.isEmpty)
  }

  test("keySkewTopK: exact shares of ALL rows, cut then cumulated") {
    val df = (Seq.fill(5)(10L) ++ Seq.fill(3)(20L) ++ Seq.fill(2)(30L))
      .toDF("k")
    val out = EventPaths.keySkewTopK(df, "k", topN = 2)
      .orderBy("rank")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // columns: (k, n_rows, rank, share_ppm, cum_share_ppm); shares are
    // over the FULL 10 rows even though only 2 survive the cut
    assert(out.toSeq == Seq(
      (10L, 5L, 1L, 500000L, 500000L),
      (20L, 3L, 2L, 300000L, 800000L)))
  }

  test("plan shape: transitionTopK rank cut compiles to WindowGroupLimit") {
    // enough input rows that maxRows > k — on a known-tiny relation
    // InferWindowGroupLimit legitimately skips (the limit is free)
    val rows = (1L to 12L).map(i => (i % 3, i, s"t${i % 4}", i))
    val plan = EventPaths.transitionTopK(
        rows.toDF("k", "t", "ty", "id"),
        "k", "t", "ty", "id", k = 3)
      .queryExecution.executedPlan.toString
    // the rank <= k filter pushes into the src-keyed window as a
    // per-partition group limit — the pair frame never materializes
    // beyond k rows per source past this node
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(!plan.contains("SinglePartition"), plan)
    // one exchange on the raw event key (the lead window); the rest
    // are over the n_types^2-bounded pair frame
    assert("Exchange hashpartitioning\\(k".r.findAllIn(plan).size == 1, plan)
  }

  test("plan shape: keySkewTopK cuts with TakeOrdered BEFORE any global window") {
    // more input rows than topN, else EliminateLimits (correctly)
    // drops the limit on a known-tiny relation and nothing fuses
    val plan = EventPaths.keySkewTopK(
        (1L to 40L).toDF("k"), "k", topN = 20)
      .queryExecution.executedPlan.toString
    // sort+limit fuse into TakeOrderedAndProject (per-partition heaps,
    // k-row driver merge) — the full key frame is never globally sorted;
    // the single-partition exchange that follows feeds the cumulative
    // window with exactly topN rows by construction
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("keySkewTopK: equal counts break ties by key ascending") {
    val df = (Seq.fill(2)(7L) ++ Seq.fill(2)(3L) ++ Seq.fill(2)(5L)).toDF("k")
    val out = EventPaths.keySkewTopK(df, "k", topN = 3)
      .orderBy("rank").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(3L, 5L, 7L))
  }

  test("topPaths counts overlapping length-3 windows per key, exact shares") {
    val ev = Seq(
      // user 1: a b c d  -> triples (a,b,c), (b,c,d)
      (1L, 10L, "a", 1L), (1L, 20L, "b", 2L), (1L, 30L, "c", 3L),
      (1L, 40L, "d", 4L),
      // user 2: a b c -> (a,b,c); cross-user never chains
      (2L, 10L, "a", 5L), (2L, 20L, "b", 6L), (2L, 30L, "c", 7L),
      // user 3: too short for a triple
      (3L, 10L, "x", 8L), (3L, 20L, "y", 9L))
      .toDF("k", "t", "e", "id")
    val out = EventPaths.topPaths(ev, "k", "t", "e", "id", k = 5)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out(("a", "b", "c")) == ((2L, 666666L, 1L)))
    assert(out(("b", "c", "d")) == ((1L, 333333L, 2L)))
    assert(out.size == 2)
  }

  test("plan shape: topPaths cuts with TakeOrdered, windows only k rows") {
    val ev = (1L to 60L).map(i => (i % 5, i, s"e${i % 3}", i))
      .toDF("k", "t", "e", "id")
    val plan = EventPaths.topPaths(ev, "k", "t", "e", "id", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("interArrivalStats: hand-checked gaps, NULL for single-event keys") {
    val ev = Seq(
      // user 1 at t = 100, 130, 190: gaps 30, 60
      (1L, 100L, 1L), (1L, 130L, 2L), (1L, 190L, 3L),
      // user 2: one event -> no gaps, NULL min/max/mean
      (2L, 500L, 4L),
      // user 3: simultaneous pair, tie broken by id -> gap 0
      (3L, 400L, 5L), (3L, 400L, 6L))
      .toDF("k", "t", "id")
    val out = EventPaths.interArrivalStats(ev, "k", "t", "id")
      .orderBy("k").collect()
    val r1 = out(0)
    assert(r1.getLong(1) == 3L && r1.getLong(2) == 2L)
    assert(r1.getLong(3) == 30L && r1.getLong(4) == 60L)
    assert(r1.getLong(5) == 45L)                 // (30 + 60) div 2
    assert(r1.getLong(6) == 500L - 190L)         // vs corpus max t = 500
    val r2 = out(1)
    assert(r2.getLong(1) == 1L && r2.getLong(2) == 0L)
    assert(r2.isNullAt(3) && r2.isNullAt(4) && r2.isNullAt(5))
    assert(r2.getLong(6) == 0L)                  // user 2 holds the max
    val r3 = out(2)
    assert(r3.getLong(3) == 0L && r3.getLong(4) == 0L && r3.getLong(5) == 0L)
  }

  test("plan shape: interArrivalStats reuses the window exchange for the aggregate") {
    val ev = (1L to 200L).map(i => (i % 9, i * 10, i)).toDF("k", "t", "id")
    val plan = EventPaths.interArrivalStats(ev, "k", "t", "id")
      .queryExecution.executedPlan.toString
    // ONE exchange on the key: the lag window sorts per key, and the
    // groupBy on the same key rides that partitioning; the corpus max
    // arrives as a broadcast scalar, never a second key shuffle
    assert("Exchange hashpartitioning\\(k".r.findAllIn(plan).size == 1, plan)
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
  }
}
