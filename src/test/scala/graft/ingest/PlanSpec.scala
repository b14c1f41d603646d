package graft.ingest

import java.time.LocalDate

import graft.SparkSpec

class PlanSpec extends SparkSpec {

  private val today = LocalDate.of(2026, 8, 12)
  private val validator = new ParameterValidator(today)

  test("registry covers both providers' endpoint families") {
    assert(EndpointRegistry.endpointSpec("polygon", "get_aggs").isDefined)
    assert(EndpointRegistry.endpointSpec("polygon", "FULL_MARKET_SNAPSHOT").isDefined)
    // Polygon carries exactly two economic endpoints (api_registry.py:485-561);
    // CPI is Alpha-Vantage-only — a polygon CPI request must be a registry miss.
    assert(EndpointRegistry.endpointSpec("polygon", "TREASURY_YIELD").exists(_.dataCategory == "economic_indicator"))
    assert(EndpointRegistry.endpointSpec("polygon", "INFLATION").exists(_.dataCategory == "economic_indicator"))
    assert(EndpointRegistry.endpointSpec("polygon", "CPI").isEmpty)
    assert(EndpointRegistry.endpointSpec("alpha_vantage", "CPI").exists(_.dataCategory == "economic_indicator"))
    assert(EndpointRegistry.endpointSpec("alpha_vantage", "TIME_SERIES_DAILY").isDefined)
    assert(EndpointRegistry.endpointSpec("alpha_vantage", "BALANCE_SHEET").isDefined)
    assert(EndpointRegistry.endpointSpec("alpha_vantage", "LISTING_STATUS").isDefined)
    assert(EndpointRegistry.endpointSpec("nope", "x").isEmpty)
  }

  test("missing required param errors; alias satisfies; default warns") {
    val missing = validator.validateRequest(
      ApiRequest("polygon", "get_aggs", Map.empty))
    assert(missing.validationStatus == "ERROR")
    assert(missing.validationErrors.exists(_.contains("Missing required: ticker")))

    val viaAlias = validator.validateRequest(
      ApiRequest("polygon", "get_aggs", Map("symbol" -> "AAPL")))
    assert(viaAlias.validationStatus == "VALID")

    val defaulted = validator.validateRequest(
      ApiRequest("polygon", "get_daily_open_close_agg",
        Map("ticker" -> "AAPL", "date" -> "2026-01-05")))
    assert(defaulted.validationStatus == "VALID")
  }

  test("future dates clamp with warning; bad dates error; enums checked") {
    val future = validator.validateRequest(
      ApiRequest("polygon", "get_aggs", Map("ticker" -> "AAPL", "to" -> "2030-01-01")))
    assert(future.validationStatus == "WARNING")
    assert(future.parameters("to") == "2026-08-12")

    val bad = validator.validateRequest(
      ApiRequest("polygon", "get_aggs", Map("ticker" -> "AAPL", "from" -> "Jan 5")))
    assert(bad.validationStatus == "ERROR")

    val badEnum = validator.validateRequest(
      ApiRequest("polygon", "get_aggs", Map("ticker" -> "AAPL", "timespan" -> "decade")))
    assert(badEnum.validationStatus == "ERROR")
  }

  test("polygon enrichment injects endpoint_type codes and economic defaults") {
    val aggs = validator.validateRequest(
      ApiRequest("polygon", "get_aggs", Map("ticker" -> "A")))
    assert(aggs.parameters("endpoint_type") == 0)

    val econ = validator.validateRequest(ApiRequest("polygon", "TREASURY_YIELD", Map.empty))
    assert(econ.parameters("endpoint_type") == "economic_indicator")
    assert(econ.parameters("indicator") == "TREASURY_YIELD")
    assert(econ.parameters("limit") == 30)
    assert(econ.parameters("sort") == "date.desc")

    val dated = validator.validateRequest(
      ApiRequest("polygon", "get_daily_open_close_agg",
        Map("ticker" -> "A", "date" -> "2026-01-05")))
    assert(dated.parameters("from") == "2026-01-05")
  }

  test("alpha vantage enrichment injects function/symbol/interval/outputsize") {
    val intraday = validator.validateRequest(
      ApiRequest("alpha_vantage", "TIME_SERIES_INTRADAY", Map("ticker" -> "IBM")))
    assert(intraday.parameters("function") == "TIME_SERIES_INTRADAY")
    assert(intraday.parameters("symbol") == "IBM")
    assert(intraday.parameters("interval") == "5min")

    val dailyAdj = validator.validateRequest(
      ApiRequest("alpha_vantage", "TIME_SERIES_DAILY_ADJUSTED", Map("ticker" -> "IBM")))
    assert(dailyAdj.parameters("outputsize") == "full")
  }

  test("semantic validation: matching keywords VALID, mismatched WARNING, never blocks") {
    val sem = new EndpointValidator()
    // endpoint_validator.py:61-64 — keywords that the description covers
    val good = sem.validateRequest(
      Seq("daily", "stock", "prices", "volume"),
      ApiRequest("alpha_vantage", "TIME_SERIES_DAILY", Map("ticker" -> "IBM")))
    assert(good.validationStatus == "VALID")
    assert(good.semanticScore.exists(_ >= 0.7))

    // :65-71 — intent that doesn't match the endpoint warns, never errors
    val off = sem.validateRequest(
      Seq("unemployment", "labor", "jobless"),
      ApiRequest("polygon", "get_aggs", Map("ticker" -> "A")))
    assert(off.validationStatus == "WARNING")
    assert(off.semanticScore.exists(_ < 0.7))
    assert(off.validationWarnings.exists(_.contains("semantic match")))

    // :40-42 — only an unknown endpoint is an ERROR
    val unknown = sem.validateRequest(Seq("anything"),
      ApiRequest("polygon", "NOT_AN_ENDPOINT", Map.empty))
    assert(unknown.validationStatus == "ERROR")
    assert(unknown.validationErrors.exists(_.contains("not found")))

    // the same keywords rank the right endpoint above the wrong one
    val ts = EndpointRegistry.endpointSpec("alpha_vantage", "TIME_SERIES_DAILY").get
    val cpi = EndpointRegistry.endpointSpec("alpha_vantage", "CPI").get
    assert(sem.score(Seq("daily", "stock", "prices"), ts.description) >
      sem.score(Seq("daily", "stock", "prices"), cpi.description))
    assert(sem.score(Seq("inflation", "cost", "living"), cpi.description) >
      sem.score(Seq("inflation", "cost", "living"), ts.description))
  }

  test("semantic WARNING requests still execute through the ingestor") {
    val econJson = """{"name": "CPI", "data": [{"date": "2024-01-01", "value": "3.1"}]}"""
    // keywords far from the CPI description -> semantic WARNING, but the
    // request still fetches and parses (ingestor.py: semantic validation
    // never blocks; only ERROR requests are skipped). The keywords ride
    // the plan artifact itself (contracts.py:21-26) — no side channel.
    val plan = ExecutionPlan(Seq(ApiRequest("alpha_vantage", "CPI", Map.empty)),
      semanticKeywords = Seq("intraday", "ticker", "snapshot"))
    val result = new Ingestor(today).process(spark, plan, fetch = _ => Some(econJson))
    assert(result.dataframes.size == 1)
    assert(result.dataframes.head.count() == 1)
  }

  test("a serialized plan alone drives the semantic check (self-contained artifact)") {
    val sem = new EndpointValidator()
    val plan = ExecutionPlan(
      Seq(ApiRequest("alpha_vantage", "TIME_SERIES_DAILY", Map("ticker" -> "AAPL"))),
      semanticKeywords = Seq("daily", "stock", "prices"))
    val out = sem.validatePlan(plan)
    assert(out.semanticKeywords == plan.semanticKeywords) // survives validation
    assert(out.rankedRequests.head.semanticScore.isDefined)
    assert(out.rankedRequests.head.validationStatus == "VALID")
  }

  test("unknown endpoint is an ERROR and skipped by the ingestor") {
    val plan = ExecutionPlan(Seq(
      ApiRequest("polygon", "NOT_AN_ENDPOINT", Map.empty),
      ApiRequest("alpha_vantage", "CPI", Map.empty)))
    val econJson = """{"name": "CPI", "data": [{"date": "2024-01-01", "value": "3.1"}]}"""
    val result = new Ingestor(today).process(spark, plan,
      fetch = req => if (req.endpointName == "CPI") Some(econJson) else Some("{}"))
    assert(result.dataframes.size == 1)
    assert(result.dataframes.head.count() == 1)
  }

  test("fetch failures are recorded, not silently dropped") {
    val plan = ExecutionPlan(Seq(
      ApiRequest("alpha_vantage", "CPI", Map.empty),          // transport throws
      ApiRequest("alpha_vantage", "REAL_GDP", Map.empty),     // no payload recorded
      ApiRequest("alpha_vantage", "INFLATION", Map.empty)))   // junk payload: lazy
    val result = new Ingestor(today).process(spark, plan,
      fetch = req => req.endpointName match {
        case "CPI" => throw new java.io.IOException("socket reset")
        case "REAL_GDP" => None
        case _ => Some("this is not json")
      })
    // junk JSON is schema-on-read (from_json -> null -> zero rows), so
    // INFLATION still yields an (empty) frame; the two transport-level
    // losses are what must surface in the artifacts
    assert(result.dataframes.size == 1)
    assert(result.dataframes.head.count() == 0)
    val byName = result.failedRequests.map(f => f.endpointName -> f.error).toMap
    assert(byName("CPI").contains("socket reset"))
    assert(byName("REAL_GDP") == "no payload")
    assert(result.failedRequests.size == 2)
  }

  test("ingestor routes snapshot, statement and csv payloads to their parsers") {
    val ing = new Ingestor(today)
    val snap = ing.parseResponse(spark,
      new ParameterValidator(today).validateRequest(
        ApiRequest("polygon", "FULL_MARKET_SNAPSHOT", Map.empty)),
      """{"tickers": [{"ticker": "A", "day": {"o": 1, "h": 2, "l": 0.5, "c": 1.5,
        "v": 10, "vw": 1.1}, "prevDay": {"c": 1.4}, "updated": 1704067200000000000}]}""")
    assert(snap.columns.contains("prev_close") && snap.count() == 1)

    val bs = ing.parseResponse(spark,
      ApiRequest("alpha_vantage", "BALANCE_SHEET", Map("ticker" -> "T")),
      """{"symbol": "T", "quarterlyReports": [
        {"fiscalDateEnding": "2023-03-31", "reportedCurrency": "USD", "totalAssets": "10"}]}""")
    assert(bs.columns.contains("balance_sheet_totalAssets"))

    val csv = ing.parseResponse(spark,
      ApiRequest("alpha_vantage", "LISTING_STATUS", Map.empty),
      "symbol,name\nAAA,Alpha\nBBB,Beta")
    assert(csv.count() == 2)

    val overview = ing.parseResponse(spark,
      ApiRequest("alpha_vantage", "OVERVIEW", Map("ticker" -> "T")),
      """{"symbol": "T", "Name": "TestCo", "MarketCapitalization": "123456", "PERatio": "31.5"}""")
    assert(overview.count() == 1)
    val row = overview.collect()(0)
    assert(row.getAs[Double]("PERatio") == 31.5)
    assert(row.getAs[String]("Name") == "TestCo")
  }

  test("output validator: exact, alias, fuzzy and missing features") {
    import spark.implicits._
    val df = Seq((1.0, 2.0, 3.0)).toDF("open", "closeprice", "vwap_x")
    val r = new OutputValidator().validateDataset(
      df, Seq("open", "close", "vwap", "volume"), "polygon", "get_aggs", Some("A"))
    assert(r.foundFeatures.contains("open"))
    assert(r.foundFeatures.contains("close")) // via closeprice alias
    assert(r.fuzzyMatchedFeatures.exists(_._2 == "vwap_x")) // 0.89 ratio
    assert(r.missingFeatures == Seq("volume"))
    assert(!r.validationPassed)
  }
}
