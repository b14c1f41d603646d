package graft.llmdata

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-column storage/serving ops (builder brief; no reference
  * counterpart): symmetric int8 scalar quantization with its
  * reconstruction-error audit.
  *
  * 100 TB design: quantization is a pure per-row projection (no
  * shuffle, no state) that shrinks an `array<float>` embedding column
  * ~4x for the ANN/serving tier; the error audit rides the same
  * projection, so deciding "is int8 good enough for this corpus" is
  * one scan. All arithmetic is an explicit portable spelling
  * (`floor(x * 127 / scale + 0.5)`, left-to-right) so any engine —
  * and the DuckDB oracle — reproduces the quantized bytes exactly.
  */
object EmbeddingOps {

  /** Symmetric per-vector int8 quantization: scale = max |x_d|,
    * q_d = floor(x_d * 127 / scale + 0.5) in [-127, 127] (round half
    * up; an all-zero vector keeps scale 0 and quantizes to zeros).
    * Output: vec_id, scale, q_csv (comma-joined int8 codes — a
    * portable rendering of the code array), max_abs_err (the L∞
    * reconstruction error of dequantizing with q * scale / 127).
    */
  def quantizeInt8(emb: DataFrame, idCol: String = "vec_id",
                   embCol: String = "embedding"): DataFrame =
    emb
      .select(col(idCol), expr(s"cast($embCol as array<double>)").as("v"))
      // one JIT'd pass for scale, codes-as-csv, and the error audit —
      // value-identical to the three-HOF spelling (see
      // QuantizeInt8Expression for the replicated edge semantics)
      .withColumn("_q", QuantizeInt8Expression.quantizeInt8(col("v")))
      .select(col(idCol), col("_q.scale").as("scale"),
        col("_q.q_csv").as("q_csv"), col("_q.max_abs_err").as("max_abs_err"))

  /** Pairwise LABEL-CENTROID cosine matrix — the class-geometry
    * report next to [[labelStats]]/[[labelDrift]]: how separable the
    * label clusters are in embedding space (a near-1 off-diagonal
    * cosine says two labels are indistinguishable to any
    * retrieval/classification head trained on these vectors). The
    * centroid cosine is computed on per-label SUM vectors — cosine is
    * scale-invariant, so cos(mean_a, mean_b) = cos(sum_a, sum_b) and
    * no per-label division ever happens: sums of milli-quantized
    * components (`floor(x·1e3)`, the covariance convention) are exact
    * BIGINTs, the pairwise dot is an exact BIGINT, and the single
    * final quotient is one fixed-shape double (engine-exact on
    * integer operands).
    *
    * Exactness bound: components ≤ 1e3·max|x|·n_label, so the dot
    * stays inside int64 while n_label ≲ 1e7 for unit-scale
    * embeddings (dim·(1e3·n)² ≤ 2^63); beyond that pre-divide the
    * label sums by a power of two (cosine-invariant), the
    * temperatureEss discipline.
    *
    * 100 TB plan: ONE posexplode into a map-side-combined
    * (label, dim) sum aggregate — |labels|·dim rows, the ONLY
    * corpus-sized work; the pair matrix is a broadcast self-join of
    * that bounded frame. Output: one row per unordered label pair
    * incl. the diagonal — (label_a, label_b, n_a, n_b, dot, cos).
    */
  def labelCentroidMatrix(emb: DataFrame, labelCol: String = "label",
                          embCol: String = "embedding"): DataFrame = {
    val sums = emb
      .select(col(labelCol).cast("long").as("__l"), posexplode(expr(
        s"transform(cast($embCol as array<double>), " +
          "x -> cast(floor(x * 1000) as bigint))")))
      .groupBy(col("__l"), col("pos"))
      .agg(sum("col").as("__s"))
    val counts = emb.groupBy(col(labelCol).cast("long").as("__l"))
      .agg(count(lit(1)).as("__n"))
    val a = sums.select(col("__l").as("label_a"), col("pos"),
      col("__s").as("__sa"))
    val b = sums.select(col("__l").as("label_b"), col("pos"),
      col("__s").as("__sb"))
    val dots = a.join(broadcast(b), Seq("pos"))
      .filter(col("label_a") <= col("label_b"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(sum(col("__sa") * col("__sb")).as("dot"))
    val self = dots.filter(col("label_a") === col("label_b"))
      .select(col("label_a").as("__l"), col("dot").as("__dd"))
    dots
      .join(broadcast(self.withColumnRenamed("__l", "label_a")
        .withColumnRenamed("__dd", "__da")), "label_a")
      .join(broadcast(self.withColumnRenamed("__l", "label_b")
        .withColumnRenamed("__dd", "__db")), "label_b")
      .join(broadcast(counts.withColumnRenamed("__l", "label_a")
        .withColumnRenamed("__n", "n_a")), "label_a")
      .join(broadcast(counts.withColumnRenamed("__l", "label_b")
        .withColumnRenamed("__n", "n_b")), "label_b")
      .withColumn("cos", expr(
        "case when dot = 0 and label_a = label_b then 0.0 " +
          "when __da <= 0 or __db <= 0 then 0.0 else " +
          "cast(dot as double) / sqrt(cast(__da as double) " +
          "* cast(__db as double)) end"))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        col("dot"), col("cos"))
  }

  /** Exact integer covariance matrix of the embedding cloud — the
    * input to whitening / PCA / Mahalanobis screens, as a first-class
    * bounded-output query: upper-triangle cells
    * `cov_ij = (n * S_ij - S_i * S_j) / n^2` over milli-quantized
    * vectors (`floor(x * 1e3)` longs — the coarser scale keeps every
    * intermediate product inside BIGINT at replica-sf1 row counts:
    * |S_ij| <= 1e6 * n, n * S_ij <= ~4e17 at n = 6e5). Sums are exact
    * integers; the single final division per cell runs in DOUBLE and
    * rounds via the catalog's r6 — deterministic cross-engine because
    * the operands are exact integers and IEEE division is.
    *
    * 100 TB plan: the dim(dim+1)/2 products per row are the inherent
    * FLOP cost of covariance, but they must NOT materialize as rows —
    * a naive pair explode turns a 600k-vector corpus into 1.25
    * BILLION aggregate inputs (measured 6.4x wall for 10x data; the
    * row machinery, not the multiplies, dominates). Instead each
    * partition folds its vectors into ONE flat accumulator (count +
    * dim sums + triangle products — `mapPartitions`, the Misra-Gries
    * justification: a fixed-size fold with no Catalyst equivalent
    * that avoids the row blowup), so only |partitions| partial rows
    * ever exist; they merge through a tiny posexplode aggregate.
    * Integer sums are order-free, so the result is partitioning-
    * independent and engine-exact. Output: (dim_i, dim_j, n, sum_ab,
    * cov_micro).
    */
  def covarianceMatrix(emb: DataFrame, embCol: String = "embedding",
                       dim: Int = LlmDataParams.embDim): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val nPairs = dim * (dim + 1) / 2
    val vi = emb.select(expr(
      s"transform(cast($embCol as array<double>), " +
        "x -> cast(floor(x * 1000) as bigint))").as("v"))
      .as[Array[Long]]
    // one (n, dimSums, pairSums) row per partition
    val parts = vi.mapPartitions { it =>
      var n = 0L
      val s = new Array[Long](dim)
      val p = new Array[Long](nPairs)
      while (it.hasNext) {
        val v = it.next()
        require(v.length == dim,
          s"covarianceMatrix: expected dim $dim, got ${v.length}")
        n += 1
        var i = 0
        var k = 0
        while (i < dim) {
          s(i) += v(i)
          var j = i
          while (j < dim) { p(k) += v(i) * v(j); j += 1; k += 1 }
          i += 1
        }
      }
      if (n == 0L) Iterator.empty else Iterator.single((n, s, p))
    }.toDF("__n", "__s", "__p")
    // bounded merge: |partitions| partial rows explode into
    // |partitions| x nPairs cells — thousands, not billions
    val nTotal = parts.agg(sum("__n").as("n"))
    val dimSums = parts.select(posexplode(col("__s")))
      .groupBy(col("pos")).agg(sum("col").as("s"))
    val pairSums = parts.select(posexplode(col("__p")))
      .groupBy(col("pos").as("__k")).agg(sum("col").as("sum_ab"))
    // flat triangle index k -> (i, j), broadcast-joined
    val mapping = (for {
      i <- 0 until dim
      j <- i until dim
    } yield (((2 * dim - i + 1) * i) / 2 + (j - i), i.toLong, j.toLong))
      .toDF("__k", "dim_i", "dim_j")
    pairSums
      .join(broadcast(mapping), "__k")
      .join(broadcast(dimSums.select(col("pos").cast("long").as("dim_i"),
        col("s").as("__si"))), "dim_i")
      .join(broadcast(dimSums.select(col("pos").cast("long").as("dim_j"),
        col("s").as("__sj"))), "dim_j")
      .crossJoin(broadcast(nTotal))
      .withColumn("cov_micro", expr(
        "cast(floor(cast(n * sum_ab - __si * __sj as double) / (n * n) " +
          "+ 0.5) as bigint)"))
      .select(col("dim_i"), col("dim_j"), col("n"), col("sum_ab"),
        col("cov_micro"))
  }

  /** All-dims standardized outlier screen — the diagonal-Mahalanobis
    * complement of the single-direction [[graft.llmdata.AnnSearch]]
    * projection outliers: per vector, the sum of squared per-dim
    * z-scores `sum_d (v_d - mean_d)^2 / var_d`, computed EXACTLY in
    * the quantized integer space via the n-scaled identity
    * `(n v_d - S_d)^2 / (n Q_d - S_d^2)` (the n^2 cancels), each term
    * quantized to micro before the order-free sum. A healthy vector
    * scores ~dim x 1e6 (each z^2 ~ 1); encoder glitches and
    * out-of-distribution rows sit far above. Constant dims
    * (zero variance) contribute zero by contract.
    *
    * 100 TB plan: one dim-explode into a 64-row stats aggregate
    * (map-side combined), broadcast back onto the same exploded
    * frame, one vec-keyed re-agg — the [[labelCentroidDrift]] shape,
    * row-linear, no window. `outlier` flags scores above
    * `3 x dim x 1e6`. Output: (vec_id, score_micro, outlier).
    */
  /** Per-dimension VARIANCE report — the compact importance table the
    * full covariance matrix buries: each embedding dimension's exact
    * variance (the covarianceMatrix diagonal identity,
    * `⌊(n·Σv² − (Σv)²)/n² + ½⌋` in 1e-3-quantized integer space), its
    * exact ppm share of total variance, and the variance rank — the
    * table behind truncation decisions (Matryoshka cuts, PCA dim
    * budgets) and dead-dimension screens (share ~0 = the encoder
    * never uses the axis).
    *
    * 100 TB plan: one posexplode scan into a dim-grain map-side-
    * combined aggregate (≤ dim rows); the share attach broadcasts and
    * the rank window rides the dim-bounded frame. Output:
    * (dim, var_micro, share_ppm, rank).
    */
  def dimVariance(emb: DataFrame,
                  embCol: String = "embedding"): DataFrame = {
    val dx = emb.select(posexplode(expr(
        s"transform(cast($embCol as array<double>), " +
          "x -> cast(floor(x * 1000) as bigint))")))
      .select(col("pos").cast("long").as("dim"), col("col").as("val"))
    val vv = dx.groupBy("dim").agg(
        count(lit(1)).as("__n"), sum("val").as("__s"),
        sum(col("val") * col("val")).as("__q"))
      .withColumn("var_micro", expr(
        "cast(floor(cast(__n * __q - __s * __s as double) / (__n * __n) " +
          "+ 0.5) as bigint)"))
      .select(col("dim"), col("var_micro"))
      .persist() // dim-bounded: the total and the attach both read it
    val tot = vv.agg(sum("var_micro").as("__t"))
    vv.crossJoin(broadcast(tot))
      .withColumn("share_ppm",
        expr("var_micro * 1000000 div greatest(__t, 1)"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("var_micro").desc, col("dim"))).cast("long"))
      .select(col("dim"), col("var_micro"), col("share_ppm"), col("rank"))
  }

  def zscoreOutliers(emb: DataFrame, idCol: String = "vec_id",
                     embCol: String = "embedding",
                     dim: Int = LlmDataParams.embDim): DataFrame = {
    val dx = emb.select(col(idCol), posexplode(expr(
        s"transform(cast($embCol as array<double>), " +
          "x -> cast(floor(x * 1000) as bigint))")))
      .select(col(idCol), col("pos").as("d"), col("col").as("val"))
    val st = dx.groupBy("d").agg(
      count(lit(1)).as("n"), sum("val").as("s"),
      sum(expr("val * val")).as("q"))
    dx.join(broadcast(st), "d")
      .withColumn("__t", expr(
        """CASE WHEN n * q - s * s = 0 THEN CAST(0 AS BIGINT)
          |ELSE cast(floor(cast(n * val - s as double) * (n * val - s)
          |  / (n * q - s * s) * 1000000 + 0.5) as bigint) END""".stripMargin))
      .groupBy(col(idCol))
      .agg(sum("__t").as("score_micro"))
      .withColumn("outlier",
        col("score_micro") > lit(3L * dim * 1000000L))
      .select(col(idCol), col("score_micro"), col("outlier"))
  }

  /** Per-label centroid DRIFT — the embedding-space sibling of
    * `TextAnalysis.sourceKlDrift`: how far each label's centroid sits
    * from the corpus centroid, as the exact integer squared L2
    * distance in the catalog's 1e6-quantized space. The monitor that
    * flags a stratum whose embedding distribution moved (encoder
    * regression, upstream content shift) before it poisons an index
    * or a sampling scheme.
    *
    * Replay contract: vectors quantize to `floor(x * 1e6)` longs;
    * per-(label, dim) sums are exact BIGINT; centroids are one
    * integral division per cell (Spark `div` truncates toward zero —
    * the oracle sign-splits DuckDB's flooring `//` to match); the
    * drift is an exact sum of squared long differences (|cl - cg| <=
    * 2e6, squared 4e12, x dim 64 -> ~2.6e14, far inside Long). No
    * float anywhere.
    *
    * 100 TB plan: ONE scan into a (label x dim)-row map-side-combined
    * aggregate; corpus sums derive from THAT frame (no second corpus
    * pass); the centroid join is dim-keyed on label-sized frames.
    * Output: (label, n_vecs, drift_sq).
    */
  def labelCentroidDrift(emb: DataFrame, labelCol: String = "label",
                         embCol: String = "embedding"): DataFrame = {
    val byDim = emb
      .select(col(labelCol).as("label"),
        expr(s"transform(cast($embCol as array<double>), " +
          "x -> cast(floor(x * 1000000) as bigint))").as("vi"))
      .select(col("label"), posexplode(col("vi")).as(Seq("d", "x")))
    val perLabel = byDim.groupBy("label", "d")
      .agg(sum("x").as("sx"), count(lit(1)).as("n"))
      .persist() // label x dim rows; global sums derive from it
    val global = perLabel.groupBy("d")
      .agg(sum("sx").as("gx"), sum("n").as("gn"))
    perLabel.join(broadcast(global), "d")
      .withColumn("cl", expr("sx div n"))
      .withColumn("cg", expr("gx div gn"))
      .groupBy("label")
      .agg(max("n").as("n_vecs"),
        sum((col("cl") - col("cg")) * (col("cl") - col("cg"))).as("drift_sq"))
  }
}
