package graft.enrich

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage-layout operators: the table-layout side of 100 TB
  * performance. A scan can only skip files whose min/max metadata
  * excludes the predicate, and that only works if rows co-locate on
  * the filter columns — Z-ordering (bit interleaving, the
  * Delta/Iceberg OPTIMIZE ZORDER technique) co-locates on TWO columns
  * at once, so both `user_id = ?` and `day = ?` predicates prune.
  */
object Layout {

  /** Morton (Z-order) key: interleave the low `bits` bits of two
    * NON-NEGATIVE integer columns — a's bit i lands at position
    * 2i+1, b's at 2i. Exact integer shift-and-mask terms (both
    * engines share `>>`/`&` semantics on non-negative longs), folded
    * by codegen into one projection.
    */
  def zKey(a: Column, b: Column, bits: Int = 10): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31]: $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftright(a.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)),
        shiftright(b.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)))
    }
    terms.reduce(_ + _)
  }

  /** The DuckDB spelling of [[zKey]] — same shift/mask terms. */
  def zKeySql(a: String, b: String, bits: Int = 10): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($a) >> $i) & 1) * ${1L << (2 * i + 1)}",
        s"((($b) >> $i) & 1) * ${1L << (2 * i)}")
    }.mkString(" + ")

  /** Z-order layout AUDIT: bucket rows into `rowsPerFile`-keyspace
    * "files" along the Morton curve and report, per file, how many
    * distinct values of EACH dimension it touches — the number that
    * predicts file-skipping effectiveness (a perfect layout gives
    * every file a small value-span on BOTH columns; a linear sort
    * gives one column span 1 and the other everything).
    *
    * 100 TB plan: the z-key is a scan projection; the audit is ONE
    * map-side-combined aggregate to file grain (distinct counts
    * expand to (file × value) internally — bounded by the real
    * distinct mass per file, which is exactly what a good layout
    * keeps small). No sort happens here: writing the layout is the
    * storage engine's `ORDER BY z_key` and this operator is its
    * decision audit. Output: (file_id, n_rows, n_a, n_b).
    */
  def zOrderFileAudit(df: DataFrame, aCol: String, bCol: String,
                      bits: Int = 10, fileSpan: Long = 4096L): DataFrame = {
    require(fileSpan > 0, s"fileSpan must be positive: $fileSpan")
    df.select(col(aCol).as("__a"), col(bCol).as("__b"))
      .withColumn("__z", zKey(col("__a"), col("__b"), bits))
      .withColumn("file_id", expr(s"__z div $fileSpan"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("__a")).as("n_a"),
        countDistinct(col("__b")).as("n_b"))
  }
}
