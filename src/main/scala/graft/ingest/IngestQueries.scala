package graft.ingest

import java.time.LocalDate
import java.util.Locale

import org.apache.spark.sql.functions._

import graft.CatalogEntry

/** Driver correctness queries for the ingest normalizers (S1-S10, P12).
  *
  * Each query feeds a deterministic, formula-generated API payload
  * (the parsed shape of a real Polygon / Alpha Vantage response)
  * through the REAL parser plumbing — `from_json`, explodes, field
  * discovery, pivots, coercions, window trim — while the DuckDB oracle
  * derives the expected output independently from the same integer
  * formulas (no JSON involved), so the two sides only agree if the
  * parser's semantics are right.
  */
object IngestQueries {

  private def f2(x: Double): String = String.format(Locale.ROOT, "%.2f", Double.box(x))
  private def f1(x: Double): String = String.format(Locale.ROOT, "%.1f", Double.box(x))

  // ---------------------------------------------------- S7 time series

  private val tsDays = 100

  /** open_i = ((i*7)%13)+1.25; close offset by (i%3-1)*0.25. */
  private def tsPayload: String = {
    val rows = (0 until tsDays).map { i =>
      val d = LocalDate.of(2024, 1, 1).plusDays(i.toLong)
      val o = ((i * 7) % 13) + 1.25
      s""""$d": {"1. open": "${f2(o)}", "2. high": "${f2(o + 1.5)}", """ +
        s""""3. low": "${f2(o - 0.5)}", "4. close": "${f2(o + ((i % 3) - 1) * 0.25)}", """ +
        s""""5. volume": "${1000 + i * 13}"}"""
    }.mkString(", ")
    s"""{"Meta Data": {"2. Symbol": "TST"}, "Time Series (Daily)": {$rows}}"""
  }

  private val tsOracleCte =
    s"""ts AS (
       |  SELECT DATE '2024-01-01' + i::INT AS timestamp,
       |         ((i * 7) % 13) + 1.25 AS open,
       |         ((i * 7) % 13) + 1.25 + 1.5 AS high,
       |         ((i * 7) % 13) + 1.25 - 0.5 AS low,
       |         ((i * 7) % 13) + 1.25 + ((i % 3) - 1) * 0.25 AS close,
       |         CAST(1000 + i * 13 AS BIGINT) AS volume
       |  FROM range(0, $tsDays) t(i)
       |)""".stripMargin

  private val avTimeSeries = CatalogEntry(
    "ingest_av_timeseries",
    (s, _) => AlphaVantageParsers
      .parseTimeSeries(PolygonParsers.payload(s, tsPayload), Some("TST"))
      .select(col("ticker"), col("timestamp").cast("timestamp").as("timestamp"),
        col("open"), col("high"), col("low"), col("close"), col("volume"))
      .orderBy("timestamp"),
    Some(s"""WITH $tsOracleCte
            |SELECT 'TST' AS ticker, timestamp, open, high, low, close, volume
            |FROM ts ORDER BY timestamp""".stripMargin))

  // ------------------------------------------------------- P12 window trim

  private val windowTrim = CatalogEntry(
    "ingest_window_trim",
    (s, _) => {
      val parsed = AlphaVantageParsers
        .parseTimeSeries(PolygonParsers.payload(s, tsPayload), Some("TST"))
        .select("ticker", "timestamp", "close")
      import AlphaVantageParsers.WindowSpec
      val a = AlphaVantageParsers.applyRequestedWindow(parsed, WindowSpec(
        from = Some(LocalDate.of(2024, 2, 1)), to = Some(LocalDate.of(2024, 3, 1))))
        .select(lit("a_between").as("scenario"), col("ticker"), col("timestamp"), col("close"))
      val b = AlphaVantageParsers.applyRequestedWindow(parsed, WindowSpec(limit = Some(7)))
        .select(lit("b_limit").as("scenario"), col("ticker"), col("timestamp"), col("close"))
      val c = AlphaVantageParsers.applyRequestedWindow(parsed, WindowSpec(
        frequency = Some("weekly")))
        .select(lit("c_freq").as("scenario"), col("ticker"), col("timestamp"), col("close"))
      a.union(b).union(c)
        .withColumn("timestamp", col("timestamp").cast("timestamp"))
        .orderBy("scenario", "timestamp")
    },
    Some(s"""WITH $tsOracleCte
            |SELECT 'a_between' AS scenario, 'TST' AS ticker, timestamp, close FROM ts
            | WHERE timestamp BETWEEN DATE '2024-02-01' AND DATE '2024-03-01'
            |UNION ALL
            |SELECT 'b_limit', 'TST', timestamp, close FROM
            | (SELECT * FROM ts ORDER BY timestamp DESC LIMIT 7)
            |UNION ALL
            |SELECT 'c_freq', 'TST', timestamp, close FROM
            | (SELECT * FROM ts ORDER BY timestamp DESC LIMIT 26)
            |ORDER BY scenario, timestamp""".stripMargin))

  // ------------------------------------------------------ S8 economic

  private val econPoints = 60

  private def econPayload: String = {
    val rows = (0 until econPoints).map { i =>
      val d = LocalDate.of(2019, 1, 1).plusMonths(i.toLong)
      s"""{"date": "$d", "value": "${f1((25 + i) / 10.0)}"}"""
    }.mkString(", ")
    s"""{"name": "CPI", "interval": "monthly", "unit": "index", "data": [$rows]}"""
  }

  private val avEconomic = CatalogEntry(
    "ingest_av_economic",
    (s, _) => AlphaVantageParsers.parseEconomic(PolygonParsers.payload(s, econPayload))
      .withColumn("timestamp", col("timestamp").cast("timestamp")),
    Some(s"""SELECT (DATE '2019-01-01' + INTERVAL (i) MONTH)::DATE AS timestamp,
            |       (25 + i) / 10.0 AS value
            |FROM range(0, $econPoints) t(i) ORDER BY timestamp""".stripMargin))

  // ------------------------------------------- S6 polygon economic

  private def polygonEconPayload: String = {
    val rows = (0 until 40).map { i =>
      val d = LocalDate.of(2021, 1, 1).plusMonths(i.toLong)
      s"""{"date": "$d", "value": "${f2((400 + i * 3) / 100.0)}"}"""
    }.mkString(", ")
    s"""{"results": [$rows]}"""
  }

  private val polygonEconomic = CatalogEntry(
    "ingest_polygon_economic",
    (s, _) => PolygonParsers.parseEconomic(PolygonParsers.payload(s, polygonEconPayload))
      .withColumn("timestamp", col("timestamp").cast("timestamp")),
    Some("""SELECT (DATE '2021-01-01' + INTERVAL (i) MONTH)::DATE AS timestamp,
           |       (400 + i * 3) / 100.0 AS value
           |FROM range(0, 40) t(i) ORDER BY timestamp""".stripMargin))

  // -------------------------------------------------- S9 fundamentals

  private val quarterEnds = Seq(
    "2022-03-31", "2022-06-30", "2022-09-30", "2022-12-31",
    "2023-03-31", "2023-06-30", "2023-09-30", "2023-12-31")

  private def balanceSheetPayload: String = {
    val reports = quarterEnds.zipWithIndex.map { case (d, q) =>
      val inventory = if (q % 4 == 3) "\"None\"" else s""""${20000 + q * 11}""""
      s"""{"fiscalDateEnding": "$d", "reportedCurrency": "USD",
         | "totalAssets": "${1000000 + q * 12345}",
         | "totalLiabilities": "${600000 + q * 2345}",
         | "totalShareholderEquity": "${400000 + q * 10000}",
         | "inventory": $inventory}""".stripMargin.replace("\n", "")
    }.mkString(", ")
    s"""{"symbol": "TST", "quarterlyReports": [$reports]}"""
  }

  private val avFundamentals = CatalogEntry(
    "ingest_av_fundamentals",
    (s, _) => AlphaVantageParsers
      .parseStatement(PolygonParsers.payload(s, balanceSheetPayload), "balance_sheet")
      .withColumn("timestamp", col("timestamp").cast("timestamp")),
    Some {
      val dates = quarterEnds.map(d => s"'$d'").mkString("[", ", ", "]")
      s"""SELECT 'TST' AS ticker, ($dates)[q + 1]::DATE AS timestamp,
         |  CASE WHEN q % 4 = 3 THEN NULL
         |       ELSE CAST(20000 + q * 11 AS DOUBLE) END AS balance_sheet_inventory,
         |  CAST(1000000 + q * 12345 AS DOUBLE) AS balance_sheet_totalAssets,
         |  CAST(600000 + q * 2345 AS DOUBLE) AS balance_sheet_totalLiabilities,
         |  CAST(400000 + q * 10000 AS DOUBLE) AS balance_sheet_totalShareholderEquity,
         |  'USD' AS reportedCurrency, 'quarterly' AS period
         |FROM range(0, ${quarterEnds.size}) t(q) ORDER BY timestamp""".stripMargin
    })

  // --------------------------------------------------- S5 snapshot

  private val snapTickers = 50

  private def snapshotPayload: String = {
    val rows = (0 until snapTickers).map { i =>
      val o = 10 + i * 0.5
      val updated = 1704067200000000000L + i.toLong * 60000000000L
      s"""{"ticker": "T$i", "day": {"o": ${f2(o)}, "h": ${f2(o + 1)}, "l": ${f2(o - 1)},
         | "c": ${f2(o + 0.25)}, "v": ${1000 + i}, "vw": ${f2(o + 0.75)}},
         | "prevDay": {"c": ${f2(o - 0.25)}}, "updated": $updated}""".stripMargin.replace("\n", "")
    }.mkString(", ")
    s"""{"tickers": [$rows]}"""
  }

  private val polygonSnapshot = CatalogEntry(
    "ingest_polygon_snapshot",
    (s, _) => PolygonParsers.parseSnapshot(PolygonParsers.payload(s, snapshotPayload))
      .withColumn("timestamp", col("timestamp").cast("timestamp"))
      .orderBy("ticker"),
    Some(s"""SELECT 'T' || i AS ticker,
            |  10 + i * 0.5 AS open, 10 + i * 0.5 + 1 AS high, 10 + i * 0.5 - 1 AS low,
            |  10 + i * 0.5 + 0.25 AS close, CAST(1000 + i AS DOUBLE) AS volume,
            |  10 + i * 0.5 + 0.75 AS vwap, 10 + i * 0.5 - 0.25 AS prev_close,
            |  DATE '2024-01-01' AS timestamp
            |FROM range(0, $snapTickers) t(i) ORDER BY ticker""".stripMargin))

  // ------------------------------------------------------- S1-S4 aggs

  private val aggBars = 100

  private def aggsPayload: String = {
    val rows = (0 until aggBars).map { i =>
      val o = 5 + (i % 7) * 0.5
      val t = (19723L + i) * 86400000L // epoch-ms midnight UTC from 2024-01-01
      s"""{"o": ${f2(o)}, "h": ${f2(o + 0.75)}, "l": ${f2(o - 0.25)}, "c": ${f2(o + (i % 2) * 0.25)},
         | "v": ${10000 + i * 3}, "vw": ${f2(o + 0.5)}, "t": $t, "n": ${100 + i}}"""
        .stripMargin.replace("\n", "")
    }.mkString(", ")
    s"""{"ticker": "AGG", "results": [$rows]}"""
  }

  private val polygonAggs = CatalogEntry(
    "ingest_polygon_aggs",
    (s, _) => PolygonParsers.parseAggs(PolygonParsers.payload(s, aggsPayload))
      .withColumn("timestamp", col("timestamp").cast("timestamp")),
    Some(s"""SELECT 'AGG' AS ticker, DATE '2024-01-01' + i::INT AS timestamp,
            |  5 + (i % 7) * 0.5 AS open, 5 + (i % 7) * 0.5 + 0.75 AS high,
            |  5 + (i % 7) * 0.5 - 0.25 AS low, 5 + (i % 7) * 0.5 + (i % 2) * 0.25 AS close,
            |  CAST(10000 + i * 3 AS BIGINT) AS volume, 5 + (i % 7) * 0.5 + 0.5 AS vwap,
            |  CAST(100 + i AS BIGINT) AS transactions
            |FROM range(0, $aggBars) t(i) ORDER BY timestamp""".stripMargin))

  // --------------------------------------------------------- S10 csv

  private val csvRows = 20

  private def listingCsv: Seq[String] = {
    val header = "symbol,name,exchange,ipoDate,status"
    val rows = (0 until csvRows).map { i =>
      val d = LocalDate.of(2000, 1, 1).plusDays(i.toLong * 100)
      val ex = if (i % 2 == 0) "NYSE" else "NASDAQ"
      val st = if (i % 5 == 0) "Delisted" else "Active"
      s"S$i,Company $i,$ex,$d,$st"
    }
    header +: rows
  }

  private val csvListing = CatalogEntry(
    "ingest_csv_listing",
    (s, _) => {
      import s.implicits._
      AlphaVantageParsers.parseCsv(s.createDataset(listingCsv))
        .withColumn("ipoDate", col("ipoDate").cast("timestamp")).orderBy("symbol")
    },
    Some(s"""SELECT 'S' || i AS symbol, 'Company ' || i AS name,
            |  CASE WHEN i % 2 = 0 THEN 'NYSE' ELSE 'NASDAQ' END AS exchange,
            |  DATE '2000-01-01' + (i * 100)::INT AS ipoDate,
            |  CASE WHEN i % 5 = 0 THEN 'Delisted' ELSE 'Active' END AS status
            |FROM range(0, $csvRows) t(i) ORDER BY symbol""".stripMargin))

  val entries: Seq[CatalogEntry] = Seq(
    avTimeSeries, windowTrim, avEconomic, avFundamentals,
    polygonSnapshot, polygonAggs, polygonEconomic, csvListing)
}
