package graft.core

import java.nio.file.Files
import java.time.LocalDate
import java.util.Locale

import graft.SparkSpec
import graft.ingest.{ApiRequest, ExecutionPlan}
import graft.load.Loader

/** End-to-end: two recorded AV payloads -> ingest -> union-collapse ->
  * clean+enrich+clean -> Derby load + JSON reports. The reference's
  * own smoke shape ("apple stock prices with sma", SURVEY §7.2) with
  * the LLM replaced by its artifacts.
  */
class PipelineSpec extends SparkSpec {

  private def f2(x: Double) = String.format(Locale.ROOT, "%.2f", Double.box(x))

  private def tsPayload(sym: String, startDay: Int): String = {
    val rows = (0 until 40).map { i =>
      val d = LocalDate.of(2026, 1, 1).plusDays((startDay + i).toLong)
      val o = ((i * 3) % 7) + 2.25
      s""""$d": {"1. open": "${f2(o)}", "2. high": "${f2(o + 1)}", "3. low": "${f2(o - 1)}",
         | "4. close": "${f2(o + 0.25)}", "5. volume": "${5000 + i}"}"""
        .stripMargin.replace("\n", "")
    }.mkString(", ")
    s"""{"Meta Data": {"2. Symbol": "$sym"}, "Time Series (Daily)": {$rows}}"""
  }

  test("full pipeline: ingest -> validate -> transform -> load -> reports") {
    val plan = ExecutionPlan(Seq(
      ApiRequest("alpha_vantage", "TIME_SERIES_DAILY",
        Map("ticker" -> "AAPL", "limit" -> 35)),
      ApiRequest("alpha_vantage", "TIME_SERIES_DAILY",
        Map("ticker" -> "MSFT", "limit" -> 35))))
    val payloads = Map("AAPL" -> tsPayload("AAPL", 0), "MSFT" -> tsPayload("MSFT", 5))
    val recipe =
      """{"features": [{"name": "sma", "params": {"on": "close", "window": 10}}]}"""

    val dir = Files.createTempDirectory("graft_run").toString
    val loader = new Loader(s"jdbc:derby:$dir/db;create=true")
    val pipeline = new Pipeline(today = LocalDate.of(2026, 8, 12))
    val run = pipeline.run(spark, plan,
      fetch = req => payloads.get(req.parameters("symbol").toString),
      dslRecipe = Some(recipe),
      keyFeatures = Seq("open", "close", "volume"),
      loader = Some(loader),
      reportDir = Some(s"$dir/reports"))

    // ingest: both frames parsed, trimmed to limit=35, features found
    assert(run.ingest.dataframes.size == 2)
    assert(run.ingest.dataframes.forall(_.count() == 35))
    assert(run.ingest.validationReports.forall(_.validationPassed))

    // validation: identical schemas -> one unioned group, early termination
    assert(run.validation.earlyTermination)
    assert(run.outputs.size == 1)

    // transform: sma column present with the reference naming contract
    val out = run.outputs.head
    assert(out.columns.contains("sma_close_10"))
    assert(out.count() == 70)
    // post-enrichment cleaning imputed the leading-window nulls (the
    // reference cleans again after enriching), so no nulls remain...
    assert(out.filter(org.apache.spark.sql.functions.col("sma_close_10").isNull).count() == 0)
    // ...and a full-window row carries the exact rolling mean:
    // close_i = ((3i)%7)+2.5, sma at i=39 = mean(i=30..39) = 5.9
    import org.apache.spark.sql.functions.{col, max => smax}
    val lastAapl = out.filter(col("ticker") === "AAPL")
      .orderBy(col("timestamp").desc).limit(1).collect()(0)
    assert(math.abs(lastAapl.getAs[Double]("sma_close_10") - 5.9) < 1e-9)

    // load: one table, verified counts
    assert(run.load.get.status == "success")
    assert(run.load.get.totalRowsLoaded == 70L)

    // K3 reports on disk
    assert(Files.exists(java.nio.file.Paths.get(s"$dir/reports/validation_report.json")))
    assert(Files.exists(java.nio.file.Paths.get(s"$dir/reports/transformation_report.json")))
    assert(Files.exists(java.nio.file.Paths.get(s"$dir/reports/load_report.json")))
  }
}
