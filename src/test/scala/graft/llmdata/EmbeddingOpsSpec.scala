package graft.llmdata

import graft.SparkSpec

class EmbeddingOpsSpec extends SparkSpec {
  import spark.implicits._

  test("quantizeInt8: codes in [-127,127], max-component hits +/-127, zero vector safe") {
    val emb = Seq(
      (0L, Seq(0.5f, -1.0f, 0.25f)), // scale 1.0 -> codes 64, -127, 32
      (1L, Seq(0.0f, 0.0f, 0.0f)),   // zero vector: scale 0, codes 0
      (2L, Seq(2.0f, 1.0f, -2.0f))   // scale 2 -> 127, 64, -127
    ).toDF("vec_id", "embedding")
    val q = EmbeddingOps.quantizeInt8(emb).orderBy("vec_id").collect()
    assert(q(0).getAs[String]("q_csv") == "64,-127,32")
    assert(q(1).getAs[Double]("scale") == 0.0)
    assert(q(1).getAs[String]("q_csv") == "0,0,0")
    assert(q(1).getAs[Double]("max_abs_err") == 0.0)
    assert(q(2).getAs[String]("q_csv") == "127,64,-127")
    // L-inf error bounded by half a quantization step
    q.foreach { r =>
      val bound = r.getAs[Double]("scale") / 127.0 / 2.0 + 1e-12
      assert(r.getAs[Double]("max_abs_err") <= bound)
    }
  }

  test("corpusStats: exact rank-picked quantiles and totals per stratum") {
    val docs = (1 to 100).map { i =>
      (i.toLong, "en", i.toLong, "a b c")
    }.toDF("doc_id", "lang", "n_chars", "text")
    val st = TextAnalysis.corpusStats(docs).collect().head
    assert(st.getAs[Long]("n_docs") == 100L)
    assert(st.getAs[Long]("total_tokens") == 300L)
    assert(st.getAs[Long]("min_chars") == 1L && st.getAs[Long]("max_chars") == 100L)
    assert(st.getAs[Long]("p50_chars") == 50L)  // ceil(100 * 0.5) = 50th of 1..100
    assert(st.getAs[Long]("p95_chars") == 95L)
  }
}
