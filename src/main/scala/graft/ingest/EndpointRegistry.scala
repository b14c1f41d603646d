package graft.ingest

/** Typed endpoint registry for the two providers (reference:
  * LLM_Ingestor/api_registry.py:25-1337). The rebuild keeps the same
  * endpoint inventory, parameter names, aliases, defaults, enums and
  * data categories; long prose descriptions (which only feed the
  * reference's LLM semantic validator) are abbreviated.
  */
object ParameterType extends Enumeration {
  val StringT, IntegerT, DateT, EnumT = Value
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

  private val economicIndicators = Seq(
    "INFLATION", "TREASURY_YIELD", "CPI", "FEDERAL_FUNDS_RATE",
    "RETAIL_SALES", "DURABLES", "UNEMPLOYMENT", "NONFARM_PAYROLL")

  /** Polygon spec (api_registry.py:64-568). */
  val polygon: ApiSpec = ApiSpec("polygon",
    Seq(
      EndpointSpec("get_aggs", "OHLCV aggregate bars", Seq(
        ticker(),
        ParameterSchema("multiplier", IntegerT, defaultValue = Some(1),
          minValue = Some(1), maxValue = Some(1000)),
        ParameterSchema("timespan", EnumT, aliases = Seq("interval", "frequency"),
          validValues = Seq("minute", "hour", "day", "week", "month", "quarter", "year"),
          defaultValue = Some("day")),
        fromDate, toDate)),
      EndpointSpec("get_previous_close_agg", "previous session bar", Seq(ticker())),
      EndpointSpec("get_daily_open_close_agg", "single day OHLC", Seq(ticker(), dateParam)),
      EndpointSpec("get_grouped_daily_aggs", "whole-market daily bars", Seq(dateParam)),
      EndpointSpec("FULL_MARKET_SNAPSHOT", "snapshot of all tickers", Nil)) ++
      economicIndicators.map(n => EndpointSpec(n, s"economic indicator $n", Seq(
        fromDate.copy(name = "from", required = false), toDate, limit,
        ParameterSchema("sort", StringT)), dataCategory = "economic_indicator")))

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

  /** Alpha Vantage spec (api_registry.py:578-1337). */
  val alphaVantage: ApiSpec = ApiSpec("alpha_vantage",
    avTimeSeries.map { n =>
      val extra =
        (if (n == "TIME_SERIES_INTRADAY") Seq(avInterval) else Nil) ++
          (if (n.contains("DAILY")) Seq(avOutputSize) else Nil)
      EndpointSpec(n, s"time series $n", ticker() +: (extra ++ Seq(fromDate, toDate, limit)))
    } ++
      avEconomic.map(n => EndpointSpec(n, s"economic $n", Seq(
        ParameterSchema("interval", StringT), limit, fromDate, toDate),
        dataCategory = "economic_indicator")) ++
      avFundamentalsJson.map { n =>
        val ps = ticker() +: (if (Seq("INCOME_STATEMENT", "BALANCE_SHEET", "CASH_FLOW",
          "EARNINGS").contains(n)) Seq(period) else Nil)
        EndpointSpec(n, s"fundamentals $n", ps)
      } ++
      avFundamentalsCsv.map(n => EndpointSpec(n, s"fundamentals CSV $n", Seq(ticker(required = false)))))

  val apis: Seq[ApiSpec] = Seq(polygon, alphaVantage)

  def endpointSpec(apiName: String, endpointName: String): Option[EndpointSpec] =
    apis.find(_.name == apiName).flatMap(_.endpoint(endpointName))
}
