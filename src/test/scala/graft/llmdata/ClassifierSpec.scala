package graft.llmdata

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Training is data-dependent per-step state (weights feed the next
  * epoch's margins), so like bpeTrain the fit is verified
  * weight-for-weight against an in-memory textbook replay of the same
  * quantized rule, plus semantic checks on a separable fixture.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // separable fixture: positive docs speak "good/fine", negative docs
  // speak "bad/awful"; shared filler tokens carry no signal
  private def corpus = {
    val pos = (0L until 25L).map(i =>
      (i, s"good fine the a good${i % 4} filler", true))
    val neg = (100L until 125L).map(i =>
      (i, s"bad awful the a bad${i % 4} filler", false))
    (pos ++ neg).toDF("doc_id", "text", "is_target")
  }

  /** The scorer's 16-bit bucket of a feature string. */
  private def bucket(feat: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(
      feat.getBytes("UTF-8"))
    (((d(0) & 0xff) << 8) | (d(1) & 0xff)).toLong
  }

  /** In-memory textbook replay of the exact-integer fit: same
    * features (unigrams + adjacent bigrams), same hard-sigmoid
    * quantized errors, same truncating updates.
    */
  private def referenceFit(docs: Seq[(Long, String, Boolean)],
                           epochs: Int): Map[Long, Long] = {
    val feats: Seq[(Long, Map[Long, Long])] = docs.map { case (id, text, _) =>
      val w = text.split(" ", -1)
      val fs = w.toSeq ++ w.toSeq.zip(w.toSeq.drop(1)).map { case (a, b) => s"$a $b" }
      val fm = fs.groupBy(bucket).map { case (b, g) => b -> g.size.toLong }
      id -> (fm + (Classifier.biasBucket ->
        (fm.getOrElse(Classifier.biasBucket, 0L) + 1L)))
    }
    val y = docs.map(d => d._1 -> (if (d._3) 1L else 0L)).toMap
    val n = docs.size.toLong
    var w = Map.empty[Long, Long]
    (0 until epochs).foreach { _ =>
      val errs = feats.map { case (id, fm) =>
        val m = fm.map { case (b, x) => x * w.getOrElse(b, 0L) }.sum
        val p = math.min(math.max(500000L + m / 4, 0L), 1000000L)
        id -> (p - 1000000L * y(id))
      }.toMap
      val grad = scala.collection.mutable.Map.empty[Long, Long]
      feats.foreach { case (id, fm) =>
        fm.foreach { case (b, x) =>
          grad(b) = grad.getOrElse(b, 0L) + x * errs(id)
        }
      }
      grad.foreach { case (b, g) =>
        w = w.updated(b, w.getOrElse(b, 0L) - g / (2L * n))
      }
    }
    w
  }

  test("trainWeights matches the in-memory textbook fit weight-for-weight") {
    val docs = corpus.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getBoolean(2))).toSeq
    (1 to 3).foreach { epochs =>
      val dist = Classifier.trainWeights(corpus, col("is_target"), epochs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val ref = referenceFit(docs, epochs)
      assert(dist == ref.filter(_._2 != 0L) || dist == ref,
        s"epoch $epochs diverged: ${dist.toSeq.sorted.take(5)} vs ${ref.toSeq.sorted.take(5)}")
    }
  }

  test("learned weights separate the planted vocabulary") {
    val w = Classifier.trainWeights(corpus, col("is_target"), epochs = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w(bucket("good")) > 0L)
    assert(w(bucket("fine")) > 0L)
    assert(w(bucket("bad")) < 0L)
    assert(w(bucket("awful")) < 0L)
  }

  test("trainScores reaches 100% train accuracy on the separable fixture") {
    val out = Classifier.trainScores(corpus, col("is_target"), epochs = 2)
      .collect()
    assert(out.length == 50)
    assert(out.forall(_.getBoolean(5)), "every doc must classify correctly")
    // margins themselves separate, not just signs at a boundary
    val margins = out.map(r => (r.getLong(1), r.getLong(2)))
    assert(margins.filter(_._1 == 1L).map(_._2).min
      > margins.filter(_._1 == 0L).map(_._2).max)
  }

  test("trainCurve: analytic epoch 0, converging loss, final-row parity") {
    val curve = Classifier.trainCurve(corpus, col("is_target"), epochs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1)
    assert(curve.map(_._1).toSeq == Seq(0L, 1L, 2L)) // epochs + 1 rows
    // epoch 0 is the analytic w = 0 state: margins all zero, so
    // |err| = 5e5 per doc and every doc predicts positive
    assert(curve(0)._3 == 500000L * 50L)
    assert(curve(0)._5 == 25L) // the positives
    assert(curve(0)._6 == 500000L)
    // on the separable fixture the L1 loss strictly improves and
    // train accuracy reaches 100% (the trainScores pin, as a curve)
    assert(curve(1)._3 < curve(0)._3 && curve(2)._3 < curve(1)._3,
      s"loss must fall: ${curve.map(_._3).toSeq}")
    assert(curve(2)._6 == 1000000L)
    // final-row parity with trainScores' correct flags
    val nCorrect = Classifier.trainScores(corpus, col("is_target"), 2)
      .filter(col("correct")).count()
    assert(curve(2)._5 == nCorrect)
    // mean is the truncating integer division of the sums
    curve.foreach { c => assert(c._4 == c._3 / c._2) }
  }

  test("the fit is partition-order invariant (exact integers end to end)") {
    val once = Classifier.trainWeights(corpus, col("is_target"), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val again = Classifier.trainWeights(corpus.repartition(7), col("is_target"), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(once == again)
  }
}
