package graft.llmdata

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // two disjoint vocabularies: target docs speak "alpha", raw-only
  // docs speak "beta" — importance weights must separate them
  private def corpus = {
    val tgt = (0L until 20L).map(i =>
      (i, s"alpha${i % 3} alpha${(i + 1) % 3} alpha0 alpha1", "en"))
    val raw = (100L until 140L).map(i =>
      (i, s"beta${i % 5} beta${(i + 1) % 5} beta0 beta1", "de"))
    (tgt ++ raw).toDF("doc_id", "text", "lang")
  }

  test("dsirWeights upweights target-vocabulary documents") {
    val w = Dsir.dsirWeights(corpus, target = col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w.size == 60)
    val tgtMin = (0L until 20L).map(w).min
    val rawMax = (100L until 140L).map(w).max
    assert(tgtMin > 0L, s"target docs must score positive, min=$tgtMin")
    assert(rawMax < 0L, s"raw-only docs must score negative, max=$rawMax")
    assert(tgtMin > rawMax)
  }

  test("dsirWeights is exact-integer deterministic under repartitioning") {
    val once = Dsir.dsirWeights(corpus, col("lang") === "en")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val again = Dsir.dsirWeights(corpus.repartition(7), col("lang") === "en")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(once == again)
  }

  test("dsirResample draws k ranked rows with key = logw + gumbel") {
    val out = Dsir.dsirResample(corpus, col("lang") === "en", k = 10)
      .orderBy("rank").collect()
    assert(out.length == 10)
    assert(out.map(_.getLong(0)).toSeq == (1L to 10L))
    out.foreach { r =>
      assert(r.getLong(3) + r.getLong(4) == r.getLong(5),
        s"key must be logw + gumbel on ${r.getLong(1)}")
    }
    // keys non-increasing down the ranks
    val keys = out.map(_.getLong(5)).toSeq
    assert(keys == keys.sorted(Ordering[Long].reverse))
  }

  test("dsirResample top-k is the global key top-k (TakeOrdered cut)") {
    val all = Dsir.dsirResample(corpus, col("lang") === "en", k = 60)
      .collect().map(r => r.getLong(1) -> r.getLong(5)).toMap
    assert(all.size == 60)
    val top10 = Dsir.dsirResample(corpus, col("lang") === "en", k = 10)
      .collect().map(_.getLong(1)).toSet
    val expected = all.toSeq.sortBy { case (id, key) => (-key, id) }
      .take(10).map(_._1).toSet
    assert(top10 == expected)
  }

  test("target-likeness dominates the draw: most sampled docs are target-like") {
    val picked = Dsir.dsirResample(corpus, col("lang") === "en", k = 15)
      .collect().map(_.getLong(1))
    val tgtPicked = picked.count(_ < 100L)
    assert(tgtPicked >= 12,
      s"expected the softmax draw to prefer target-like docs, got $tgtPicked/15")
  }
}
