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

  /** Reads a testdata parquet table. Enables nanos-as-long so a
    * TIMESTAMP(NANOS) `events.ts` column is readable (Spark has no
    * nanosecond timestamp type); `ts` then arrives as an epoch-nanos
    * long. Testdata written with microsecond timestamps (the r10
    * regeneration) instead yields a TIMESTAMP_NTZ `ts` — consumers
    * that need time arithmetic must go through [[tsMicros]], which
    * adapts to whichever representation arrived.
    */
  def table(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The engine replicates pandas/reference coercion semantics
    // (invalid cast -> null, x/0 -> null-ish), not ANSI SQL errors.
    // (Known divergence: pandas emits inf for x/0 in pct_change; Spark
    // non-ANSI yields null.)
    s.conf.set("spark.sql.ansi.enabled", "false")
    // NTZ->timestamp casts in tsMicros are identity only under UTC.
    s.conf.set("spark.sql.session.timeZone", "UTC")
    s.read.parquet(s"$dir/$name.parquet")
  }

  /** `events.ts` as epoch-MICROS bigint, independent of how the driver
    * wrote the parquet: TIMESTAMP(NANOS) reads as a nanos long (via
    * nanosAsLong above), TIMESTAMP(MICROS) reads as TIMESTAMP_NTZ.
    * The r10 testdata regeneration silently switched the former to the
    * latter, and every `ts div 1000` site failed analysis — exactly
    * the five queries absent from CORRECTNESS_r10 (VERDICT r10
    * §next-2). Micros is the shared axis: exact in both
    * representations, and what the DuckDB oracles' epoch_us(ts)
    * yields for either physical type.
    */
  def tsMicros(df: DataFrame, c: String = "ts"): Column =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.LongType => expr(s"$c div 1000")
      case _ => unix_micros(col(c).cast("timestamp"))
    }
}
