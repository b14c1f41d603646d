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

  /** INTERVAL-interval overlap join: pair every left interval with
    * every right interval it overlaps (`l.lo <= r.hi AND r.lo <=
    * l.hi`, touching endpoints inclusive) — the two-sided
    * generalization of [[bucketed]]; the four bound columns must have
    * names distinct across the two frames.
    *
    * Same bucketing scale design, plus the trick the two-sided case
    * needs: an overlapping PAIR now meets in every bucket both
    * intervals cover, so pairs are counted ONLY in the bucket where
    * their overlap STARTS (`floor(greatest(l.lo, r.lo) / width)`) —
    * exact dedup as a row-local filter, no distinct pass, no
    * join-multiplied shuffle of a dedup key. Cost is
    * sum-over-buckets |L_b| x |R_b| exactly as the point variant;
    * invalid (null / inverted) intervals drop on both sides.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lLo: String, lHi: String, rLo: String, rHi: String,
                      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val w = lit(bucketWidth)
    def valid(lo: String, hi: String) =
      col(lo).isNotNull && col(hi).isNotNull && col(lo) <= col(hi)
    def burst(df: DataFrame, lo: String, hi: String) =
      df.filter(valid(lo, hi))
        .withColumn("__b", explode(sequence(
          floor(col(lo) / w).cast("long"), floor(col(hi) / w).cast("long"))))
    burst(left, lLo, lHi).join(burst(right, rLo, rHi), "__b")
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      // count each pair once: only where the overlap starts
      .filter(floor(greatest(col(lLo), col(rLo)) / w).cast("long") === col("__b"))
      .drop("__b")
  }
}
