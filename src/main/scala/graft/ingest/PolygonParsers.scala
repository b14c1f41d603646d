package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Response normalizers for the Polygon endpoint family (SURVEY §2.1
  * S1-S6): pure `from_json` + explode + rename DataFrame work over raw
  * JSON payload strings — the HTTP layer stays a driver-side adapter
  * (out of engine scope), exactly as the reference separates fetch
  * from parse (polygon_client.py:76-247).
  *
  * Input contract: a DataFrame with a `json` string column, one row
  * per API response (so a batch of fetched payloads normalizes in one
  * distributed pass; a single response is just a 1-row frame).
  */
object PolygonParsers {

  /** P1: Polygon's terse field names -> canonical vocabulary
    * (polygon_client.py:14-23).
    */
  val columnMap: Seq[(String, String)] = Seq(
    "o" -> "open", "h" -> "high", "l" -> "low", "c" -> "close",
    "v" -> "volume", "vw" -> "vwap", "t" -> "timestamp", "n" -> "transactions")

  private val aggsSchema =
    "struct<ticker: string, results: array<struct<" +
      "o: double, h: double, l: double, c: double, v: double, vw: double, " +
      "t: bigint, n: bigint>>>"

  /** S1-S4: OHLCV aggregate bars (get_aggs / grouped daily / daily
    * open-close / previous close share this record shape). Epoch-ms
    * `t` becomes a UTC date; a ticker literal is injected when the
    * payload carries none (P14; polygon_client.py:100-118).
    */
  def parseAggs(raw: DataFrame, ticker: Option[String] = None): DataFrame = {
    val bars = raw
      .select(from_json(col("json"), aggsSchema, Map.empty[String, String]).as("j"))
      .select(col("j.ticker").as("__payload_ticker"), explode(col("j.results")).as("r"))
    val named = bars.select(
      coalesce(col("__payload_ticker"), lit(ticker.orNull)).as("ticker"),
      to_date(timestamp_millis(col("r.t"))).as("timestamp"),
      col("r.o").as("open"), col("r.h").as("high"), col("r.l").as("low"),
      col("r.c").as("close"), col("r.v").cast("long").as("volume"),
      col("r.vw").as("vwap"), col("r.n").as("transactions"))
    named.orderBy("timestamp")
  }

  private val dailyOpenCloseSchema =
    "struct<symbol: string, `from`: string, open: double, high: double, " +
      "low: double, close: double, volume: double, afterHours: double, " +
      "preMarket: double>"

  /** S3 flat shape: `get_daily_open_close_agg` returns one object, not
    * a `results[]` array — the reference wraps it as a single record
    * (`records = raw.get('results', [raw])`, polygon_client.py:93-98).
    * Field names are already full words, so only the date parse and
    * ticker injection apply.
    */
  def parseDailyOpenClose(raw: DataFrame, ticker: Option[String] = None): DataFrame =
    raw
      .select(from_json(col("json"), dailyOpenCloseSchema, Map.empty[String, String]).as("j"))
      .select(
        coalesce(col("j.symbol"), lit(ticker.orNull)).as("ticker"),
        to_date(col("j.from")).as("timestamp"),
        col("j.open").as("open"), col("j.high").as("high"),
        col("j.low").as("low"), col("j.close").as("close"),
        col("j.volume").cast("long").as("volume"),
        col("j.afterHours").as("afterHours"), col("j.preMarket").as("preMarket"))

  private val snapshotSchema =
    "struct<tickers: array<struct<" +
      "ticker: string, " +
      "day: struct<o: double, h: double, l: double, c: double, v: double, vw: double>, " +
      "prevDay: struct<c: double>, " +
      "updated: bigint>>>"

  /** S5: full-market snapshot flatten — nested `day`/`prevDay` structs
    * to flat columns, epoch-ns `updated` to a UTC date
    * (polygon_client.py:121-173). One row per ticker in the snapshot.
    */
  def parseSnapshot(raw: DataFrame): DataFrame =
    raw
      .select(from_json(col("json"), snapshotSchema, Map.empty[String, String]).as("j"))
      .select(explode(col("j.tickers")).as("t"))
      .select(
        col("t.ticker").as("ticker"),
        col("t.day.o").as("open"), col("t.day.h").as("high"),
        col("t.day.l").as("low"), col("t.day.c").as("close"),
        col("t.day.v").as("volume"), col("t.day.vw").as("vwap"),
        col("t.prevDay.c").as("prev_close"),
        to_date(timestamp_micros(expr("t.updated div 1000"))).as("timestamp"))

  private val economicSchema =
    "struct<results: array<struct<date: string, value: string>>>"

  /** S6: economic indicator normalize — `results[]` to
    * `(timestamp, value)` rows, date-parsed and numeric-coerced,
    * sorted by timestamp (polygon_client.py:193-229).
    */
  def parseEconomic(raw: DataFrame): DataFrame =
    raw
      .select(from_json(col("json"), economicSchema, Map.empty[String, String]).as("j"))
      .select(explode(col("j.results")).as("r"))
      .select(
        to_date(col("r.date")).as("timestamp"),
        col("r.value").cast("double").as("value"))
      .orderBy("timestamp")

  /** Wraps one payload string as the 1-row `json` frame. */
  def payload(spark: SparkSession, json: String): DataFrame = {
    import spark.implicits._
    Seq(json).toDF("json")
  }
}
