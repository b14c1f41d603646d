package graft.integrate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: pair each point row with every interval row
  * whose [lo, hi] contains the point — with NO equality key. Spark
  * plans a bare inequality join as a broadcast-nested-loop / cartesian
  * and filters after the fact: |points| x |intervals| comparisons, the
  * classic scale cliff (the builder brief names range join explicitly).
  *
  * Scale design — overlap bucketing: the point axis is cut into
  * fixed-width buckets; each point maps to exactly ONE bucket, each
  * interval explodes to the buckets it overlaps (⌈span/width⌉ + 1 rows,
  * a few for width ≈ interval span), and the join becomes a hash
  * EQUI-join on the bucket id followed by the exact containment filter.
  * Cost drops from |P| x |I| to sum-over-buckets of |P_b| x |I_b| —
  * shuffle-partitioned by bucket, skew handled by AQE like any hash
  * join. No dedup pass is needed: a (point, interval) pair can only
  * meet in the point's single bucket. The containment filter keeps
  * results exact, so bucket width tunes performance, never semantics.
  *
  * DuckDB replays the semantics directly (`BETWEEN` join via its
  * IEJoin), which is what the correctness oracle does.
  */
object RangeJoin {

  /** @param bucketWidth width of the bucketing grid on the point axis;
    *                    pick ≈ the typical interval span so intervals
    *                    explode to ~2 buckets
    */
  def bucketed(points: DataFrame, intervals: DataFrame,
               pointCol: String, loCol: String, hiCol: String,
               bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val w = lit(bucketWidth)
    val pb = points
      .filter(col(pointCol).isNotNull)
      .withColumn("__b", floor(col(pointCol) / w).cast("long"))
    val ib = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull &&
        col(loCol) <= col(hiCol))
      .withColumn("__b", explode(sequence(
        floor(col(loCol) / w).cast("long"),
        floor(col(hiCol) / w).cast("long"))))
    pb.join(ib, "__b")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__b")
  }
}
