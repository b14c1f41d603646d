package graft.enrich

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group distribution summaries (no reference counterpart —
  * builder-brief event tooling). Quantiles are the rank-pick kind
  * (the value AT row `ceil(n*q/100)` of the sorted group, computed
  * with integer ceiling `(n*q + 99) div 100`), not interpolated —
  * picked values are raw inputs, so engines agree bit-for-bit with no
  * rounding contract, and the pick replays identically in any SQL
  * engine.
  *
  * Scale: one exchange on the group key; the rank window and the
  * rollup share its sort. This is the per-GROUP quantile operator —
  * each group sorts only its own rows under a keyed exchange. (A
  * whole-corpus quantile would need a different design — sampling or
  * sketch — since a global sort window single-partitions.)
  */
object GroupStats {

  /** @param qs percentiles to pick, each in (0, 100]
    * @return one row per group: n, min/max, and `p{q}` per requested q
    */
  def groupQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                     qs: Seq[Int] = Seq(25, 50, 90, 99)): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 100),
      s"percentiles must be in (0, 100], got $qs")
    val byGroup = Window.partitionBy(groupCol)
    val ranked = df
      .filter(col(valueCol).isNotNull)
      .withColumn("__rn",
        row_number().over(byGroup.orderBy(col(valueCol).asc)).cast("long"))
      .withColumn("__n", count(lit(1)).over(byGroup))
    val picks = qs.map { q =>
      max(when(col("__rn") === expr(s"(__n * $q + 99) div 100"),
        col(valueCol))).as(s"p$q")
    }
    ranked.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        (min(col(valueCol)).as("min_value") +: max(col(valueCol)).as("max_value")
          +: picks): _*)
  }
}
