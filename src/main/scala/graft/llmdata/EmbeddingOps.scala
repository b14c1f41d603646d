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
