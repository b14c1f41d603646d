package graft.llmdata

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-17 wave: threshold-free ranking eval (tie-aware exact AUC)
  * and the precision/recall operating-point sweep — hand-computed
  * fixtures pin the average-rank tie handling and the confusion
  * counts, then the trained compositions are checked on the
  * ClassifierSpec separable corpus.
  */
class EvalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = {
    val pos = (0L until 25L).map(i =>
      (i, s"good fine the a good${i % 4} filler", true))
    val neg = (100L until 125L).map(i =>
      (i, s"bad awful the a bad${i % 4} filler", false))
    (pos ++ neg).toDF("doc_id", "text", "is_target")
  }

  test("aucFromScores matches the hand rank-sum with average-rank ties") {
    // scores 5,5,10,10,20 with y 0,0,1,0,1: avg ranks 1.5/1.5/3.5/3.5/5,
    // Σranks⁺ = 3.5 + 5 = 8.5, AUC = (8.5 − 3)/6 = 11/12
    val scored = Seq((10L, 1L), (10L, 0L), (20L, 1L), (5L, 0L), (5L, 0L))
      .toDF("margin_micro", "y")
    val r = Classifier.aucFromScores(scored).collect()(0)
    assert(r.getAs[Long]("n_pos") === 2L)
    assert(r.getAs[Long]("n_neg") === 3L)
    assert(r.getAs[Long]("n_score_groups") === 3L)
    assert(r.getAs[Long]("auc_ppm") === 916666L) // floor(11/12 · 1e6)
    assert(r.getAs[Long]("gini_ppm") === 833332L)
  }

  test("aucFromScores equals the pairwise concordance definition on a random fixture") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 80).map(_ =>
      (rnd.nextInt(12).toLong, if (rnd.nextBoolean()) 1L else 0L))
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    // concordant pairs count twice, tied pairs once, over 2·n⁺·n⁻
    val num2 = (for (p <- pos; q <- neg) yield {
      if (p > q) 2L else if (p == q) 1L else 0L
    }).sum
    val want = num2 * 1000000L / (2L * pos.size * neg.size)
    val r = Classifier.aucFromScores(rows.toDF("margin_micro", "y"))
      .collect()(0)
    assert(r.getAs[Long]("auc_ppm") === want)
  }

  test("aucFromScores boundary values: perfect, inverted, single-class") {
    val perfect = Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L))
      .toDF("margin_micro", "y")
    assert(Classifier.aucFromScores(perfect).collect()(0)
      .getAs[Long]("auc_ppm") === 1000000L)
    val inverted = Seq((1L, 1L), (2L, 1L), (3L, 0L), (4L, 0L))
      .toDF("margin_micro", "y")
    assert(Classifier.aucFromScores(inverted).collect()(0)
      .getAs[Long]("auc_ppm") === 0L)
    val oneClass = Seq((1L, 1L), (2L, 1L)).toDF("margin_micro", "y")
    val r = Classifier.aucFromScores(oneClass).collect()(0)
    assert(r.getAs[Long]("auc_ppm") === 500000L)
    assert(r.getAs[Long]("gini_ppm") === 0L)
  }

  test("trainAuc separates the separable corpus perfectly") {
    val r = Classifier.trainAuc(corpus, col("is_target")).collect()(0)
    assert(r.getAs[Long]("n_pos") === 25L)
    assert(r.getAs[Long]("n_neg") === 25L)
    assert(r.getAs[Long]("auc_ppm") === 1000000L)
  }

  test("trainAucHoldout ranks the held-out slice with the learned weights") {
    val r = Classifier.trainAucHoldout(corpus, col("is_target")).collect()(0)
    // holdout = id % 5 == 0: 5 positives (0,5,10,15,20), 5 negatives
    // (100,105,110,115,120); the planted vocabulary generalizes
    assert(r.getAs[Long]("n_pos") === 5L)
    assert(r.getAs[Long]("n_neg") === 5L)
    assert(r.getAs[Long]("auc_ppm") === 1000000L)
  }

  test("prSweep confusion counts match the hand fixture and are monotone") {
    val scored = Seq(
      (100000L, 0L), (350000L, 1L), (500000L, 1L),
      (650000L, 0L), (900000L, 1L)).toDF("p_micro", "y")
    val rows = Classifier.prSweep(scored, Seq(300000L, 600000L))
      .collect()
    assert(rows.length === 2)
    val t3 = rows(0)
    assert(t3.getAs[Long]("threshold_ppm") === 300000L)
    // preds at ≥3e5: 350000,500000,650000,900000 → tp 3, fp 1, fn 0, tn 1
    assert((t3.getAs[Long]("tp"), t3.getAs[Long]("fp"),
      t3.getAs[Long]("fn"), t3.getAs[Long]("tn")) === ((3L, 1L, 0L, 1L)))
    assert(t3.getAs[Long]("precision_micro") === 750000L)
    assert(t3.getAs[Long]("recall_micro") === 1000000L)
    assert(t3.getAs[Long]("f1_micro") === 857142L) // floor(6/7 · 1e6)
    val t6 = rows(1)
    // preds at ≥6e5: 650000,900000 → tp 1, fp 1, fn 2, tn 1
    assert((t6.getAs[Long]("tp"), t6.getAs[Long]("fp"),
      t6.getAs[Long]("fn"), t6.getAs[Long]("tn")) === ((1L, 1L, 2L, 1L)))
    // monotone: raising the bar never adds predicted positives
    assert(t6.getAs[Long]("tp") <= t3.getAs[Long]("tp"))
    assert(t6.getAs[Long]("fp") <= t3.getAs[Long]("fp"))
  }

  test("retrievalRecallCurve counts misses as never-hit and is monotone in k") {
    val perQuery = Seq(
      (1L, Some(1L)), (2L, Some(3L)), (3L, None), (4L, Some(7L)))
      .toDF("query_id", "first_rank")
    val rows = TextAnalysis.retrievalRecallCurve(perQuery,
      Seq(1L, 2L, 3L, 5L, 10L)).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(2))).toSeq ===
      Seq((1L, 1L), (2L, 1L), (3L, 2L), (5L, 2L), (10L, 3L)))
    assert(rows.forall(_.getAs[Long]("n_queries") === 4L))
    assert(rows.map(_.getAs[Long]("hit_rate_micro")).toSeq ===
      Seq(250000L, 250000L, 500000L, 500000L, 750000L))
  }

  test("trainPrSweep covers every configured threshold with a total confusion") {
    val rows = Classifier.trainPrSweep(corpus, col("is_target")).collect()
    assert(rows.map(_.getAs[Long]("threshold_ppm")).toSeq ===
      LlmDataParams.prSweepThresholdsPpm)
    rows.foreach { r =>
      assert(r.getAs[Long]("tp") + r.getAs[Long]("fp") +
        r.getAs[Long]("fn") + r.getAs[Long]("tn") === 50L)
    }
    // the separable fit puts every doc on the right side of chance
    val mid = rows.find(_.getAs[Long]("threshold_ppm") == 500000L).get
    assert(mid.getAs[Long]("tp") === 25L)
    assert(mid.getAs[Long]("tn") === 25L)
  }
}
