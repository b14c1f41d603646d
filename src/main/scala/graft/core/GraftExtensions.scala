package graft.core

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.integrate.PairFeaturesExpression
import graft.llmdata.{DotProductExpression, MinHashSignatureExpression}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so `spark.sql(...)` users
  * (and SQL-only surfaces like thriftserver/notebooks) reach the same
  * codegen kernels the DataFrame API uses:
  *
  *   - `graft_dot(a, b)`            — left-fold dot product
  *   - `graft_minhash(shingles, k)` — k-hash MinHash signature
  *   - `graft_pair_features(a, b)`  — the 26-feature join kernel
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.core.GraftExtensions")` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`.
  * This is the (c) extension path of the build brief — only the
  * kernels that genuinely cannot be expressed with built-in operators
  * live here; everything else in the engine is plain Catalyst.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - sequential dot product of two double arrays"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "graft_dot expects (array, array)")
        DotProductExpression(args(0), args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      info("graft_minhash",
        "graft_minhash(shingles, k) - k-hash MinHash signature (hex strings)"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "graft_minhash expects (array<string>, int literal)")
        val k = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_minhash: k must be an int literal, got $other")
        }
        MinHashSignatureExpression(args(0), k)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_pair_features"),
      info("graft_pair_features",
        "graft_pair_features(a, b) - 26-feature similarity-join kernel struct"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "graft_pair_features expects (array, array)")
        PairFeaturesExpression(args(0), args(1),
          eps = 1e-10, closeTol = 0.1, veryCloseTol = 0.01)
      }))
  }
}
