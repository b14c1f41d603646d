package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for catalog queries and their DuckDB oracles. */
object QuerySupport {

  /** Deterministic 6-decimal rounding used on BOTH the Spark side and
    * the oracle side ([[r6Sql]]). Plain `round()` is engine-specific on
    * exact .5 ties (Spark: BigDecimal HALF_UP; DuckDB: its own tie
    * rule), which shows up on money-like inputs; `floor(x*1e6 + 0.5)`
    * is the same IEEE-754 op sequence in every engine.
    */
  def r6(c: Column): Column = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)

  /** SQL twin of [[r6]] for oracle strings. */
  def r6Sql(expr: String): String = s"floor(($expr) * 1000000.0 + 0.5) / 1000000.0"

  /** Reads a testdata parquet table. Enables nanos-as-long so the
    * driver's TIMESTAMP(NANOS) `events.ts` column is readable (Spark
    * has no nanosecond timestamp type); `ts` then arrives as an
    * epoch-nanos long, which orders identically.
    */
  def table(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The engine replicates pandas/reference coercion semantics
    // (invalid cast -> null, x/0 -> null-ish), not ANSI SQL errors.
    // (Known divergence: pandas emits inf for x/0 in pct_change; Spark
    // non-ANSI yields null.)
    s.conf.set("spark.sql.ansi.enabled", "false")
    s.read.parquet(s"$dir/$name.parquet")
  }
}
