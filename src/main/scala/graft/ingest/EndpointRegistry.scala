package graft.ingest

/** Typed endpoint registry for the two providers (reference:
  * LLM_Ingestor/api_registry.py:25-1337). The rebuild keeps the same
  * endpoint inventory, parameter names, aliases, defaults, enums,
  * data categories, AND the full prose descriptions — the
  * descriptions feed [[EndpointValidator]]'s semantic match exactly
  * as the reference's feed its MiniLM index (api_registry.py:78,617).
  */
object ParameterType extends Enumeration {
  val StringT, IntegerT, DateT, EnumT, BooleanT = Value
}

case class ParameterSchema(
    name: String,
    ptype: ParameterType.Value,
    required: Boolean = false,
    aliases: Seq[String] = Nil,
    validValues: Seq[String] = Nil,
    defaultValue: Option[Any] = None,
    format: Option[String] = None,
    pattern: Option[String] = None,
    minValue: Option[Int] = None,
    maxValue: Option[Int] = None)

case class EndpointSpec(
    name: String,
    description: String,
    parameters: Seq[ParameterSchema],
    dataCategory: String = "stock") { // stock | economic_indicator
  def parameter(name: String): Option[ParameterSchema] =
    parameters.find(p => p.name == name || p.aliases.contains(name))
}

case class ApiSpec(name: String, endpoints: Seq[EndpointSpec]) {
  def endpoint(name: String): Option[EndpointSpec] = endpoints.find(_.name == name)
}

object EndpointRegistry {

  import ParameterType._

  private def ticker(required: Boolean = true) = ParameterSchema(
    "ticker", StringT, required = required, aliases = Seq("symbol", "stock"),
    pattern = Some("^[A-Z]{1,5}$"))
  private val fromDate = ParameterSchema("from", DateT,
    aliases = Seq("start_date", "from_date"), format = Some("YYYY-MM-DD"))
  private val toDate = ParameterSchema("to", DateT,
    aliases = Seq("end_date", "to_date"), format = Some("YYYY-MM-DD"))
  private val dateParam = ParameterSchema("date", DateT, required = true,
    format = Some("YYYY-MM-DD"))
  private val limit = ParameterSchema("limit", IntegerT, minValue = Some(1))
  // api_registry.py:489-513 — polygon economic endpoints take a single
  // optional observation date (alias "on"), a bounded limit defaulting
  // to 100, and a "col.asc|.desc" sort string.
  private val polygonEconParams = Seq(
    ParameterSchema("date", DateT, aliases = Seq("on"), format = Some("YYYY-MM-DD")),
    ParameterSchema("limit", IntegerT, defaultValue = Some(100),
      minValue = Some(1), maxValue = Some(50000)),
    ParameterSchema("sort", StringT))

  /** Economic-indicator descriptions, VERBATIM and PER PROVIDER — the
    * reference registry carries distinct prose for the same indicator
    * on each provider (polygon TREASURY_YIELD/INFLATION at
    * api_registry.py:487/:525 vs the Alpha Vantage set at :774-993),
    * and the semantic endpoint validator scores plans against exactly
    * this prose, so blending or abridging it would shift every
    * semantic score (VERDICT r8 advice #2).
    */
  private val avEconDesc = Map(
    "REAL_GDP" -> ("Real Gross Domestic Product data showing economic growth adjusted " +
      "for inflation for macroeconomic analysis"),
    "REAL_GDP_PER_CAPITA" -> ("Real GDP per capita measuring economic output per person " +
      "adjusted for inflation for standard of living analysis"),
    "TREASURY_YIELD" -> ("US Treasury bond yields across different maturities for " +
      "interest rate analysis and fixed income valuation"),
    "FEDERAL_FUNDS_RATE" -> ("Federal Reserve federal funds rate for monetary policy " +
      "analysis and interest rate forecasting"),
    "CPI" -> ("Consumer Price Index measuring inflation and cost of living changes " +
      "for purchasing power analysis"),
    "INFLATION" -> ("Inflation rate data showing price level changes over time for " +
      "economic stability assessment"),
    "RETAIL_SALES" -> ("Monthly retail sales data measuring consumer spending patterns " +
      "for economic health evaluation"),
    "DURABLES" -> ("Durable goods orders indicating business investment and " +
      "manufacturing activity for economic forecasting"),
    "UNEMPLOYMENT" -> ("Unemployment rate data showing labor market health and " +
      "economic conditions for policy analysis"),
    "NONFARM_PAYROLL" -> ("Monthly nonfarm payroll employment data measuring job " +
      "creation and economic growth momentum"))

  /** Polygon spec (api_registry.py:64-568). */
  val polygon: ApiSpec = ApiSpec("polygon",
    Seq(
      EndpointSpec("get_aggs",
        "Historical stock price data with aggregated bars showing open high low close " +
          "volume (OHLCV) across flexible timeframes from minute to year for comprehensive " +
          "technical analysis, backtesting, and financial modeling of stock prices and " +
          "trading activity", Seq(
        ticker(),
        ParameterSchema("multiplier", IntegerT, defaultValue = Some(1),
          minValue = Some(1), maxValue = Some(1000)),
        ParameterSchema("timespan", EnumT, aliases = Seq("interval", "frequency"),
          validValues = Seq("minute", "hour", "day", "week", "month", "quarter", "year"),
          defaultValue = Some("day")),
        fromDate, toDate)),
      EndpointSpec("get_previous_close_agg",
        "Previous trading day closing prices and market summary data for quick recent " +
          "lookback and baseline comparison", Seq(ticker())),
      EndpointSpec("get_daily_open_close_agg",
        "Specific daily opening and closing prices for individual stocks on a particular " +
          "trading date with full OHLC data", Seq(ticker(), dateParam)),
      EndpointSpec("get_grouped_daily_aggs",
        "Grouped daily aggregates for entire stock market on a specific date for " +
          "market-wide analysis and screening", Seq(dateParam)),
      EndpointSpec("SNAPSHOT_TICKER",
        "Real-time snapshot for a single US equity ticker including last trade, last " +
          "quote, minute bar, day bar and previous day bar", Seq(ticker())),
      EndpointSpec("FULL_MARKET_SNAPSHOT",
        "Comprehensive snapshot of the entire US equity market with optional filtering " +
          "by ticker list and inclusion of OTC securities", Seq(
        ParameterSchema("tickers", StringT, aliases = Seq("symbols", "ticker_list")),
        ParameterSchema("include_otc", BooleanT, defaultValue = Some(false)))),
      EndpointSpec("TOP_MARKET_MOVERS",
        "Top 20 gainers or losers in the US equity market for a given session, useful " +
          "for momentum screening", Seq(
        ParameterSchema("direction", EnumT, required = true,
          validValues = Seq("gainers", "losers"), defaultValue = Some("gainers")),
        ParameterSchema("include_otc", BooleanT, defaultValue = Some(false)))),
      // Polygon carries exactly TWO economic endpoints (api_registry.py:
      // 485-561), each with date/limit/sort — not the Alpha Vantage set.
      EndpointSpec("TREASURY_YIELD",
        "U.S. Treasury yield curve data across standard maturities (1-month through " +
          "30-year) for interest-rate analysis and fixed-income valuation. Returns " +
          "daily yields going back to 1962.",
        polygonEconParams, dataCategory = "economic_indicator"),
      EndpointSpec("INFLATION",
        "Consumer inflation indicators including headline and core CPI and PCE " +
          "measures. Provides historical price change data for monetary policy and " +
          "purchasing-power analysis.",
        polygonEconParams, dataCategory = "economic_indicator")))

  private val avInterval = ParameterSchema("interval", EnumT,
    aliases = Seq("timespan", "frequency"),
    validValues = Seq("1min", "5min", "15min", "30min", "60min"),
    defaultValue = Some("5min"))
  private val avOutputSize = ParameterSchema("outputsize", EnumT,
    validValues = Seq("compact", "full"), defaultValue = Some("compact"))
  private val period = ParameterSchema("period", EnumT,
    validValues = Seq("annual", "quarterly"), defaultValue = Some("quarterly"))

  private val avTimeSeries = Seq(
    "TIME_SERIES_INTRADAY", "TIME_SERIES_DAILY", "TIME_SERIES_DAILY_ADJUSTED",
    "TIME_SERIES_WEEKLY", "TIME_SERIES_WEEKLY_ADJUSTED",
    "TIME_SERIES_MONTHLY", "TIME_SERIES_MONTHLY_ADJUSTED")
  private val avEconomic = Seq(
    "REAL_GDP", "REAL_GDP_PER_CAPITA", "TREASURY_YIELD", "FEDERAL_FUNDS_RATE",
    "CPI", "INFLATION", "RETAIL_SALES", "DURABLES", "UNEMPLOYMENT", "NONFARM_PAYROLL")
  private val avFundamentalsJson = Seq(
    "OVERVIEW", "ETF_PROFILE", "DIVIDENDS", "SPLITS", "INCOME_STATEMENT",
    "BALANCE_SHEET", "CASH_FLOW", "SHARES_OUTSTANDING", "EARNINGS", "EARNINGS_ESTIMATES")
  private val avFundamentalsCsv = Seq(
    "LISTING_STATUS", "EARNINGS_CALENDAR", "IPO_CALENDAR")

  /** Full time-series + fundamentals descriptions
    * (api_registry.py:580-700 and :1020-1200).
    */
  private val avDesc = Map(
    "TIME_SERIES_INTRADAY" -> ("Intraday time series stock data with intervals from 1min " +
      "to 60min for short-term trading and real-time analysis"),
    "TIME_SERIES_DAILY" -> ("Daily historical stock prices with open, high, low, close " +
      "and volume data for fundamental and technical analysis"),
    "TIME_SERIES_DAILY_ADJUSTED" -> ("Daily adjusted stock prices accounting for splits " +
      "and dividends for accurate long-term historical analysis"),
    "TIME_SERIES_WEEKLY" -> ("Weekly aggregated stock price data for longer-term trend " +
      "analysis and investment decisions"),
    "TIME_SERIES_WEEKLY_ADJUSTED" -> ("Weekly adjusted stock prices accounting for splits " +
      "and dividends for long-term portfolio analysis"),
    "TIME_SERIES_MONTHLY" -> ("Monthly historical stock prices for long-term investment " +
      "analysis and portfolio management"),
    // "backesting" [sic] — the reference's own typo (api_registry.py),
    // kept verbatim: this prose IS the semantic-match contract.
    "TIME_SERIES_MONTHLY_ADJUSTED" -> ("Monthly adjusted stock prices accounting for " +
      "splits and dividends for comprehensive historical backesting"),
    "OVERVIEW" -> ("Comprehensive fundamental snapshot (sector, market cap, valuation " +
      "ratios, profitability metrics, beta, share counts) for the specified equity"),
    "ETF_PROFILE" -> ("Detailed ETF fundamentals including strategy description, top " +
      "holdings, asset/sector allocation weights, expense ratio, and issuance details"),
    "DIVIDENDS" -> ("Complete dividend history including declaration/ex-date, payment " +
      "date, currency, and amount for the specified equity"),
    "SPLITS" -> ("Historical stock split events with split ratios and effective dates " +
      "for the specified equity"),
    "INCOME_STATEMENT" -> ("Annual and quarterly income statements with GAAP/IFRS " +
      "normalized revenue, gross profit, operating income, net income, EPS, and margin metrics"),
    "BALANCE_SHEET" -> ("Annual and quarterly balance sheets highlighting assets, " +
      "liabilities, shareholder equity, working capital, and leverage metrics"),
    "CASH_FLOW" -> ("Annual and quarterly cash flow statements detailing operating, " +
      "investing, financing flows plus free-cash-flow metrics"),
    "SHARES_OUTSTANDING" -> ("Quarterly basic and diluted shares outstanding plus source " +
      "type to support per-share fundamental calculations"),
    "EARNINGS" -> ("Annual and quarterly earnings (EPS) history including actual vs. " +
      "estimate, surprise percentages, and announcement dates"),
    "EARNINGS_ESTIMATES" -> ("Forward EPS and revenue consensus estimates with analyst " +
      "counts, revision trends, and confidence metrics"),
    "LISTING_STATUS" -> ("Regulatory listing roster showing active vs. delisted US " +
      "equities/ETFs with IPO dates and status change timestamps"),
    "EARNINGS_CALENDAR" -> ("Forward-looking earnings calendar containing announcement " +
      "dates, estimated EPS, prior-year comparisons, and time-of-day info"),
    "IPO_CALENDAR" -> ("Pipeline of expected IPOs with filing date, expected pricing " +
      "window, lead underwriters, and share counts for the next three months"))

  /** Alpha Vantage spec (api_registry.py:578-1337). */
  val alphaVantage: ApiSpec = ApiSpec("alpha_vantage",
    avTimeSeries.map { n =>
      val extra =
        (if (n == "TIME_SERIES_INTRADAY") Seq(avInterval) else Nil) ++
          (if (n.contains("DAILY")) Seq(avOutputSize) else Nil)
      EndpointSpec(n, avDesc(n), ticker() +: (extra ++ Seq(fromDate, toDate, limit)))
    } ++
      avEconomic.map(n => EndpointSpec(n, avEconDesc(n), Seq(
        ParameterSchema("interval", StringT), limit, fromDate, toDate),
        dataCategory = "economic_indicator")) ++
      avFundamentalsJson.map { n =>
        val ps = ticker() +: (if (Seq("INCOME_STATEMENT", "BALANCE_SHEET", "CASH_FLOW",
          "EARNINGS").contains(n)) Seq(period) else Nil)
        EndpointSpec(n, avDesc(n), ps)
      } ++
      avFundamentalsCsv.map(n => EndpointSpec(n, avDesc(n), Seq(ticker(required = false)))))

  val apis: Seq[ApiSpec] = Seq(polygon, alphaVantage)

  def endpointSpec(apiName: String, endpointName: String): Option[EndpointSpec] =
    apis.find(_.name == apiName).flatMap(_.endpoint(endpointName))
}
