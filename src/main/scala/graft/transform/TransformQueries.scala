package graft.transform

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{CatalogEntry, QuerySupport}

/** Driver correctness query for the transform orchestrator (SURVEY §3.1
  * transformation stage): clean -> DSL enrichment -> clean over a
  * deterministic dirty OHLCV frame.
  *
  * The dirt is chosen so every cleaning decision is engine-exact (a
  * `positive` validation drop; integer finalization of volume; no
  * nulls, so the random imputation path never fires — that path is
  * covered by CleanerSpec and the clean_pipeline query). The
  * enrichment recipe (rolling_avg + obv + session_flags) uses only
  * min_periods=1 / cumulative / calendar features, so the enriched
  * frame is null-free and the post-clean is pure validation + sort.
  */
object TransformQueries {

  private val recipe =
    """{"features": [
      |  {"name": "rolling_avg", "params": {"on": "close", "window": 5}},
      |  {"name": "obv", "params": {"close": "close", "volume": "volume"}},
      |  {"name": "session_flags", "params": {}}
      |]}""".stripMargin

  private def dirty(df: DataFrame): DataFrame = df.select(
    concat(lit("T"), (col("user_id") % 5).cast("string")).as("ticker"),
    expr("timestamp_micros(event_id * 60000000)").as("ts"),
    when(col("event_id") % 7 === 0, -(col("value") + 1.0))
      .otherwise(col("value") + 1.0).as("open"),
    ((col("value") + 2.0) * 1.1).as("high"),
    ((col("value") + 1.0) * 0.5).as("low"),
    (col("value") + 2.0).as("close"),
    (col("value") * 3.0 + 0.1).as("volume"),
    (col("value") + 1.5).as("vwap"))

  private val dirtySql =
    """dirty AS (
      |  SELECT 'T' || CAST(user_id % 5 AS VARCHAR) AS ticker,
      |         make_timestamp(event_id * 60000000) AS ts,
      |         CASE WHEN event_id % 7 = 0 THEN -(value + 1.0) ELSE value + 1.0 END AS open,
      |         (value + 2.0) * 1.1 AS high,
      |         (value + 1.0) * 0.5 AS low,
      |         value + 2.0 AS close,
      |         CAST(round_even(value * 3.0 + 0.1, 0) AS BIGINT) AS volume,
      |         value + 1.5 AS vwap
      |  FROM events
      |), clean AS (
      |  SELECT * FROM dirty
      |  WHERE open > 0 AND high > 0 AND low > 0 AND close > 0 AND volume >= 0
      |    AND ts <= now()
      |    AND high >= greatest(open, close) AND low <= least(open, close)
      |)""".stripMargin

  private val transformPipeline = CatalogEntry(
    "transform_pipeline",
    (s: SparkSession, dir: String) => {
      val input = dirty(QuerySupport.table(s, dir, "events"))
      val (outputs, report) = new TransformPipeline().run(Seq(input), Some(recipe))
      assert(report.status == "success" && outputs.size == 1)
      outputs.head.select(
        col("ticker"), col("ts"), col("open"), col("high"), col("low"), col("close"),
        col("volume"), col("vwap"),
        QuerySupport.r6(col("rolling_avg_close_5")).as("rolling_avg_close_5"),
        QuerySupport.r6(col("obv")).as("obv"),
        col("session_flags_dow"), col("session_flags_month"),
        col("session_flags_is_month_start"))
        .orderBy("ticker", "ts")
    },
    Some {
      val po = "PARTITION BY ticker ORDER BY ts"
      s"""WITH $dirtySql, sv AS (
         |  SELECT *, volume * sign(coalesce(close - lag(close) OVER ($po), 0.0)) AS __sv
         |  FROM clean
         |)
         |SELECT ticker, ts, open, high, low, close, volume, vwap,
         |  ${QuerySupport.r6Sql(s"avg(close) OVER ($po ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)")} AS rolling_avg_close_5,
         |  ${QuerySupport.r6Sql(s"sum(__sv) OVER ($po ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")} AS obv,
         |  CAST(isodow(ts) - 1 AS BIGINT) AS session_flags_dow,
         |  CAST(month(ts) AS BIGINT) AS session_flags_month,
         |  CAST(CASE WHEN day(ts) = 1 THEN 1 ELSE 0 END AS BIGINT) AS session_flags_is_month_start
         |FROM sv
         |ORDER BY ticker, ts""".stripMargin
    })

  val entries: Seq[CatalogEntry] = Seq(transformPipeline)
}
