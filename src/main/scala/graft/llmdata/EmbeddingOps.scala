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
}
