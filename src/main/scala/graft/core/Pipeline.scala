package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ingest.{ApiRequest, ExecutionPlan, IngestResult, Ingestor}
import graft.integrate.{Validator, ValidatorConfig, ValidatorReport}
import graft.load.{LoadReport, Loader, Reports}
import graft.transform.{TransformPipeline, TransformReport}

/** Full-run artifact bundle (reference:
  * backend/app/services/pipeline_service.py:95-98,180-184,224-228 —
  * one report file per stage per run).
  */
case class PipelineRun(
    outputs: Seq[DataFrame],
    ingest: IngestResult,
    validation: ValidatorReport,
    transform: TransformReport,
    load: Option[LoadReport])

/** End-to-end pipeline (reference: pipeline.py:8-31 — the minimum
  * slice; pipeline_service.py:100-259 adds the service wrapper):
  *
  *   ingest (plan artifact + payload fetch) -> validate/integrate ->
  *   transform (clean -> DSL enrich -> clean) -> load (JDBC/CSV) +
  *   JSON reports.
  *
  * The LLM translators (prompt -> plan, keywords -> DSL) stay
  * out-of-engine adapters; the engine's API takes their validated
  * artifacts — so a run is deterministic and test-complete without
  * any external service (SURVEY §2.10 C3, §7.5 side-channel fix: the
  * enrichment recipe rides the run context, not a txt file).
  */
class Pipeline(
    config: ValidatorConfig = ValidatorConfig.balanced,
    today: java.time.LocalDate = java.time.LocalDate.now()) {

  val ingestor = new Ingestor(today)
  val validator = new Validator(config)
  val transformPipeline = new TransformPipeline()

  def run(spark: SparkSession,
          plan: ExecutionPlan,
          fetch: ApiRequest => Option[String],
          dslRecipe: Option[String],
          keyFeatures: Seq[String] = Nil,
          loader: Option[Loader] = None,
          reportDir: Option[String] = None): PipelineRun = {
    // Stage 1: ingest (ingestor.py:45-172)
    val ingested = ingestor.process(spark, plan, fetch,
      enrichmentFeatures = dslRecipe.toSeq, keyFeatures = keyFeatures)

    // Stage 2: validation/integration (validator.py:199-444)
    val (validated, valReport) = validator.process(ingested.dataframes)

    // Stage 3: transformation (transform.py:29-247)
    val (transformed, transformReport) = transformPipeline.run(
      validated, dslRecipe, Some(config.columnDeleteThreshold))

    // Stage 4: load (transform/load.py:24-218) — optional like the CLI
    val loadReport = loader.map(_.loadJdbc(spark, transformed))

    // K3: report artifacts per run
    reportDir.foreach { dir =>
      Reports.write(valReport, s"$dir/validation_report.json")
      Reports.write(transformReport, s"$dir/transformation_report.json")
      loadReport.foreach(Reports.write(_, s"$dir/load_report.json"))
    }

    PipelineRun(transformed, ingested, valReport, transformReport, loadReport)
  }
}
