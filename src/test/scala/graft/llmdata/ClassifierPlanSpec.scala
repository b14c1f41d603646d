package graft.llmdata

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Plan-shape contracts for the in-engine classifier fit — the 100 TB
  * claims as assertions, not prose: per-epoch work is aggregates and
  * one broadcast join; no corpus-keyed Window ever appears; the weight
  * table always joins broadcast. */
class ClassifierPlanSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (0L until 40L)
    .map(i => (i, s"tok${i % 7} tok${(i + 1) % 7} filler common", i % 2 == 0))
    .toDF("doc_id", "text", "is_target")

  test("the feature frame plan has no Window and no sort") {
    val plan = Classifier.features(corpus)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"), s"no window expected:\n$plan")
    assert(!plan.toLowerCase.contains("sortmergejoin"),
      s"no join at all in the feature build:\n$plan")
  }

  test("scoring with learned weights broadcast-joins the weight table") {
    val plan = Classifier.trainScores(corpus, col("is_target"), epochs = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"weights must broadcast:\n$plan")
    assert(!plan.contains("WindowExec"),
      s"no corpus-keyed window anywhere in the fit/score plan:\n$plan")
  }

  test("gradient aggregation map-side combines (partial then final)") {
    // one epoch's gradient frame: margins are 0, so the err frame is a
    // pure projection of labels — the bucket aggregate must show a
    // partial/final HashAggregate pair (vocabulary never shuffles raw
    // feature rows to a single reducer)
    val feats = Classifier.features(corpus)
    val labels = corpus.select(col("doc_id"),
      when(col("is_target"), 1L).otherwise(0L).as("__y"))
      .withColumn("__err", expr("500000 - 1000000 * __y"))
      .select("doc_id", "__err")
    val grad = feats.join(labels, Seq("doc_id"))
      .groupBy("bucket").agg(sum(col("x") * col("__err")).as("__g"))
    val plan = grad.queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum") || plan.contains("partial sum")
      || plan.toLowerCase.contains("partial"),
      s"gradient aggregate must map-side combine:\n$plan")
  }
}
