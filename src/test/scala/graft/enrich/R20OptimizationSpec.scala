package graft.enrich

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Focused pins for the round-20 optimization restructures:
  *
  *  - `markovStationary`'s driver chain now replays the ORACLE
  *    semantics exactly (ADVICE r19 #1/#3/#4): states and the initial
  *    mass divisor come from the full source set (not the restricted
  *    cells), a source whose transitions all lead to terminal states
  *    survives with pi_micro = 0, and the driver-cell cap is enforced
  *    with a count BEFORE the collect;
  *  - `groupedMedianPick` gained the dual-path discipline (VERDICT r19
  *    §next-2): many-group shapes auto-fall back to the rank-window
  *    spelling (no require-crash), both paths agree bit-for-bit on
  *    shapes both handle, and NULL group keys flow through
  *    `madOutliers` end to end (ADVICE r19 #2);
  *  - the classifier fit is one lazy in-engine plan — the learned
  *    weight table must never appear as a collected LocalRelation.
  */
class R20OptimizationSpec extends SparkSpec {
  import spark.implicits._

  test("markovStationary: terminal-led source keeps its uniform share slot") {
    // q's only transition leads to z, and z never transitions out —
    // so the q->z cell is dropped by the restriction, but q is still
    // a SOURCE: the oracle's ss frame keeps it, the divisor is
    // |{q, a, b}| = 3, and q emits pi_micro = 0 via the final
    // left-join-with-fill. (The r19 spelling derived states from the
    // restricted cells: q vanished and the divisor shrank to 2.)
    val ev = Seq(
      (1L, "q", 1L, 10L), (1L, "z", 2L, 20L),
      (2L, "a", 3L, 10L), (2L, "b", 4L, 20L),
      (2L, "a", 5L, 30L), (2L, "b", 6L, 40L),
      (3L, "b", 7L, 10L), (3L, "a", 8L, 20L))
      .toDF("user_id", "event_type", "event_id", "t_us")
    val out = EventPaths.markovStationary(ev, "user_id", "t_us",
        "event_type", "event_id", iters = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // restricted cells: a->b (c=2, tot=2), b->a (c=1, tot=1); the
    // uniform start is 1000000 div 3 = 333333 and the chain just swaps
    // the (equal) a/b masses each round; q receives nothing.
    assert(out.toSeq == Seq(("a", 333333L, 1L), ("b", 333333L, 2L),
      ("q", 0L, 3L)), s"got ${out.toSeq}")
  }

  test("markovStationary: cell cap fails loudly before the collect") {
    val ev = Seq(
      (1L, "a", 1L, 10L), (1L, "b", 2L, 20L), (1L, "a", 3L, 30L))
      .toDF("user_id", "event_type", "event_id", "t_us")
    val e = intercept[IllegalArgumentException] {
      EventPaths.markovStationary(ev, "user_id", "t_us",
        "event_type", "event_id", iters = 2, maxDriverCells = 1L)
    }
    assert(e.getMessage.contains("transition cells"),
      s"guard message: ${e.getMessage}")
  }

  test("groupedMedianPick: many-group shapes fall back to the rank window") {
    // 300 groups > the 256 fallback bar: the old spelling
    // require-crashed here; now the pick must both SUCCEED and agree
    // with the histogram path run on the same data (fallbackGroups
    // raised so it stays on the histogram side).
    val df = (1L to 3000L)
      .map(i => (s"g${i % 300}", (i * 2654435761L) % 997L))
      .toDF("group", "__v")
    val viaWindow = GroupStats.groupedMedianPick(df)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaHistogram = GroupStats.groupedMedianPick(df,
        fallbackGroups = 1000)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaWindow.size == 300)
    assert(viaWindow == viaHistogram,
      s"paths disagree on ${viaWindow.toSet.diff(viaHistogram.toSet).take(5)}")
  }

  test("madOutliers: NULL group keys survive as their own partition") {
    val rows: Seq[(String, Long)] = Seq(
      (null, 1L), (null, 3L), (null, 5L),
      ("g", 10L), ("g", 12L), ("g", 14L), ("g", 100L))
    val out = GroupStats.madOutliers(rows.toDF("g", "v"), "g", "v")
      .collect()
      .map(r => Option(r.getString(0)) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // null group: values {1,3,5} -> median 3 (2nd smallest), devs
    // {2,0,2} -> mad 2, no dev exceeds 3*2
    assert(out(None) == ((3L, 3L, 2L, 0L)), s"null group: $out")
    // g: median = 2nd smallest of {10,12,14,100} = 12; devs
    // {2,0,2,88} -> mad 2; 88 > 6 -> one outlier
    assert(out(Some("g")) == ((4L, 12L, 2L, 1L)), s"g group: $out")
  }

  test("classifier fit: weights materialize at construction, driver-local") {
    // the r19 loop ran 1 + epochs sequential driver actions per fit
    // and re-broadcast a fresh LocalRelation per epoch; the r20 chain
    // runs the unrolled epochs under ONE final collect. Pin the
    // contract: the returned weight table is a pure driver-local
    // frame (scoring broadcasts serialize rows with no build job —
    // its plan has no scans, joins, or aggregates left).
    val corpus = (0L until 40L)
      .map(i => (i, s"tok${i % 7} tok${(i + 1) % 7} filler common",
        i % 2 == 0))
      .toDF("doc_id", "text", "is_target")
    val weights = graft.llmdata.Classifier
      .trainWeights(corpus, col("is_target"), epochs = 2)
    val plan = weights.queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Join, Aggregate, LocalRelation}
    assert(plan.collectLeaves().forall(_.isInstanceOf[LocalRelation]),
      s"weight table must be driver-local after the fit:\n$plan")
    assert(plan.collect { case j: Join => j }.isEmpty &&
      plan.collect { case a: Aggregate => a }.isEmpty,
      s"no residual fit computation in the returned frame:\n$plan")
    assert(weights.count() > 0)
    // the epoch-intermediate weight caches were released inside the fit
    // (nothing holds a ≤65537-row cache after construction)
  }
}
