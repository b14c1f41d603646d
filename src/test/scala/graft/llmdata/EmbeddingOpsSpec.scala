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

  test("QuantizeInt8Expression matches the three-HOF spelling exactly") {
    import org.apache.spark.sql.functions.{col, concat_ws, expr}
    val rnd = new scala.util.Random(13)
    val vecs = Seq(
      Seq.empty[Float],                       // null scale, empty csv, null err
      Seq(0.0f, 0.0f),                        // zero vector
      Seq(1.0f),                              // exact scale member
      Seq(-0.0f, 0.0f),                       // signed zero
      Seq(0.1f, -0.2f, 0.3f, -0.4f)) ++
      (0 until 60).map(_ => Seq.fill(1 + rnd.nextInt(16))(rnd.nextFloat() * 4f - 2f))
    val emb = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), expr("cast(embedding as array<double>)").as("v"))
    val ref = emb
      .withColumn("scale", expr("array_max(transform(v, x -> abs(x)))"))
      .withColumn("q", expr(
        """transform(v, x -> cast(CASE WHEN scale = 0.0 THEN 0.0
          |  ELSE floor(x * 127.0 / scale + 0.5) END as bigint))""".stripMargin))
      .withColumn("max_abs_err", expr(
        """array_max(zip_with(q, v,
          |  (qi, xi) -> abs(cast(qi as double) * scale / 127.0 - xi)))""".stripMargin))
      .select(col("vec_id"), col("scale").as("scale_ref"),
        concat_ws(",", col("q")).as("csv_ref"), col("max_abs_err").as("err_ref"),
        QuantizeInt8Expression.quantizeInt8(col("v")).as("qs"))
    ref.collect().foreach { r =>
      val qs = r.getAs[org.apache.spark.sql.Row]("qs")
      val id = r.getLong(0)
      assert(qs.getAs[String]("q_csv") == r.getAs[String]("csv_ref"), s"vec $id csv")
      if (r.isNullAt(1)) assert(qs.isNullAt(0), s"vec $id scale null")
      else assert(qs.getAs[Double]("scale") == r.getAs[Double]("scale_ref"), s"vec $id scale")
      if (r.isNullAt(3)) assert(qs.isNullAt(2), s"vec $id err null")
      else assert(qs.getAs[Double]("max_abs_err") == r.getAs[Double]("err_ref"), s"vec $id err")
    }
  }

  test("labelCentroidDrift: exact squared L2 between label and corpus centroids") {
    // two labels on orthogonal axes: both centroids sit (0.5, 0.5)
    // from the corpus centroid -> drift_sq = 2 * 500000^2 = 5e11 each
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f), "A"), (1L, Seq(1.0f, 0.0f), "A"),
      (2L, Seq(0.0f, 1.0f), "B"), (3L, Seq(0.0f, 1.0f), "B"))
      .toDF("vec_id", "embedding", "label")
    val out = EmbeddingOps.labelCentroidDrift(emb).collect()
      .map(r => r.getAs[String]("label") ->
        ((r.getAs[Long]("n_vecs"), r.getAs[Long]("drift_sq")))).toMap
    assert(out == Map("A" -> ((2L, 500000000000L)), "B" -> ((2L, 500000000000L))))
    // a label matching the corpus distribution drifts zero; a shifted
    // one drifts more — and the result is layout-independent
    val emb2 = Seq(
      (0L, Seq(1.0f, 0.0f), "same"), (1L, Seq(-1.0f, 0.0f), "same"),
      (2L, Seq(1.0f, 0.0f), "same2"), (3L, Seq(-1.0f, 0.0f), "same2"),
      (4L, Seq(1.0f, 1.0f), "shift"), (5L, Seq(1.0f, 1.0f), "shift"))
      .toDF("vec_id", "embedding", "label")
    val d2 = EmbeddingOps.labelCentroidDrift(emb2).collect()
      .map(r => r.getAs[String]("label") -> r.getAs[Long]("drift_sq")).toMap
    assert(d2("shift") > d2("same"))
    val d2r = EmbeddingOps.labelCentroidDrift(emb2.repartition(5)).collect()
      .map(r => r.getAs[String]("label") -> r.getAs[Long]("drift_sq")).toMap
    assert(d2r == d2)
  }

  test("plan shape: labelCentroidDrift derives corpus sums from the label aggregate") {
    val emb = Seq((0L, Seq(1.0f, 0.0f), "A")).toDF("vec_id", "embedding", "label")
    val plan = EmbeddingOps.labelCentroidDrift(emb)
      .queryExecution.executedPlan.toString
    // global sums read the PERSISTED (label x dim) frame — no second
    // corpus scan feeds them
    assert(plan.contains("InMemoryTableScan"), plan)
    // the dim-keyed centroid join is broadcast, never shuffled
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
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

  test("covarianceMatrix: exact population covariance on a known cloud") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(1.0, 0.0, 2.0)),
      (2L, Seq(3.0, 0.0, 4.0))).toDF("vec_id", "embedding")
    val out = EmbeddingOps.covarianceMatrix(emb, dim = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.size == 6) // upper triangle of dim 3
    // values (1,3) on dim 0: population variance 1.0 -> 1e6 micro
    assert(out((0L, 0L))._3 == 1000000L)
    // dims (0,2) = (1,2),(3,4): covariance 1.0
    assert(out((0L, 2L))._3 == 1000000L)
    // the zero dim contributes zero variance and zero covariance
    assert(out((1L, 1L))._3 == 0L && out((0L, 1L))._3 == 0L)
    assert(out((0L, 0L))._1 == 2L) // n
    // layout-stable
    val again = EmbeddingOps.covarianceMatrix(emb.repartition(5), dim = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    assert(again == out.view.mapValues(_._3).toMap)
  }

  test("zscoreOutliers: an injected far vector flags, constant dims contribute zero") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val normal = (0L until 60L).map(i =>
      (i, Seq.fill(4)(rnd.nextDouble() * 0.2 - 0.1) :+ 5.0)) // dim 4 constant
    val far = Seq((99L, Seq(3.0, -3.0, 3.0, -3.0, 5.0)))
    val emb = (normal ++ far).toDF("vec_id", "embedding")
    val out = EmbeddingOps.zscoreOutliers(emb, dim = 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(99L)._2, s"far vector should flag: ${out(99L)}")
    assert(out.filter(_._1 != 99L).count(_._2._2) == 0,
      "normal cloud should not flag")
    // the constant 5th dim is variance-free: drop it and the scores
    // are unchanged (zero-contribution contract)
    val noConst = EmbeddingOps.zscoreOutliers(
        emb.select($"vec_id",
          org.apache.spark.sql.functions.expr("slice(embedding, 1, 4)").as("embedding")), dim = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (id, (s, _)) => assert(noConst(id) == s, s"dim-5 $id") }
  }
}
