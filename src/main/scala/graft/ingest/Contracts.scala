package graft.ingest

import org.apache.spark.sql.DataFrame

/** One validated API request of an execution plan (reference:
  * LLM_Ingestor/contracts.py:29-40). Parameters are the raw LLM/plan
  * values; validation mutates status + errors/warnings and enriches
  * the parameter map.
  */
case class ApiRequest(
    apiName: String,
    endpointName: String,
    parameters: Map[String, Any],
    semanticScore: Option[Double] = None,
    validationStatus: String = "PENDING", // PENDING | VALID | WARNING | ERROR
    validationErrors: Seq[String] = Nil,
    validationWarnings: Seq[String] = Nil)

/** The validated plan the engine executes (contracts.py:39-40), plus
  * the plan's intent keywords. The reference bundles
  * `semantic_keywords` with the request list in the SAME LLM artifact
  * (`LLMResponse`, contracts.py:21-26); carrying them here keeps a
  * serialized plan self-contained for the semantic endpoint check —
  * no side-channel parameter needed to replay a run (VERDICT r8
  * §missing-4).
  */
case class ExecutionPlan(
    rankedRequests: Seq[ApiRequest],
    semanticKeywords: Seq[String] = Nil)

/** Requested-feature presence report (contracts.py:43-51). */
case class FeatureValidationReport(
    apiName: String,
    endpointName: String,
    ticker: Option[String],
    foundFeatures: Seq[String],
    fuzzyMatchedFeatures: Seq[(String, String, Double)], // (feature, column, score)
    missingFeatures: Seq[String],
    actualColumns: Seq[String],
    validationPassed: Boolean)

/** A plan request that produced no frame — missing payload or a parse
  * failure. Recorded (not silently dropped) so a run whose frames
  * vanish at ingest is diagnosable from the run artifacts
  * (the reference logs these, ingestor.py:266-276).
  */
case class FailedRequest(apiName: String, endpointName: String, error: String)

/** The canonical ingest-stage result. ONE typed record — the reference
  * returns a 5-tuple that both its callers unpack as 4 (SURVEY §7.5,
  * ingestor.py:172 vs pipeline_service.py:128 / pipeline.py:11 — a
  * latent arity bug the rebuild fixes by construction).
  */
case class IngestResult(
    proceed: Boolean,
    dataframes: Seq[DataFrame],
    enrichmentFeatures: Seq[String],
    keyFeatures: Seq[String],
    validationReports: Seq[FeatureValidationReport],
    failedRequests: Seq[FailedRequest] = Nil)
