package graft.api

import java.nio.file.{Files, Paths}
import java.time.Instant
import java.util.UUID
import java.util.concurrent.{ConcurrentHashMap, Executors}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

import graft.core.Pipeline
import graft.ingest.{ApiRequest, ExecutionPlan}
import graft.integrate.ValidatorConfig
import graft.load.Reports

/** One run's mutable status record (reference:
  * backend/app/services/pipeline_service.py:33-52 — same fields,
  * snake_case on the wire via [[Reports.toJson]]).
  */
case class RunStatus(
    runId: String,
    status: String, // pending | running | completed | failed
    progress: Int,
    currentStage: String,
    message: String,
    startedAt: String,
    completedAt: Option[String],
    error: Option[String],
    runDir: String,
    qualityProfile: String,
    stageFlags: Map[String, Boolean])

/** The artifact-driven run request: the engine consumes the validated
  * plan + payloads + DSL recipe the LLM/HTTP adapters would produce
  * (SURVEY §2.10 C3) — so a service run is deterministic and
  * replayable from its artifacts.
  */
case class RunRequest(
    plan: ExecutionPlan,
    payloads: Map[String, String], // endpointName -> recorded payload
    dslRecipe: Option[String],
    keyFeatures: Seq[String],
    qualityProfile: String)

/** Pipeline run service (reference: pipeline_service.py:25-359):
  * create-run -> background execution with staged progress
  * (10/30 ingest, 40/60 validation, 70/90 transform, 100 complete) ->
  * status polling -> results from the run directory artifacts.
  * Single-JVM driver-side orchestration, like the reference's FastAPI
  * background tasks; the heavy lifting stays in Spark.
  */
class PipelineService(spark: SparkSession, tempDir: String) {

  private val runs = new ConcurrentHashMap[String, RunStatus]()
  private val executor = Executors.newFixedThreadPool(2)

  def createRun(request: RunRequest): String = {
    val runId = UUID.randomUUID().toString
    val runDir = s"$tempDir/$runId"
    Files.createDirectories(Paths.get(runDir))
    runs.put(runId, RunStatus(runId, "pending", 0, "pending", "Pipeline created",
      Instant.now().toString, None, None, runDir, request.qualityProfile,
      Map("ingestion" -> false, "validation" -> false,
        "transformation" -> false, "completed" -> false)))
    executor.submit(new Runnable {
      override def run(): Unit = executeRun(runId, request)
    })
    runId
  }

  def getStatus(runId: String): Option[RunStatus] = Option(runs.get(runId))

  def history: Seq[RunStatus] =
    runs.values().asScala.toSeq.sortBy(_.startedAt)

  /** Results contract (pipeline_service.py:309-359): per-frame CSV
    * info + the stage report JSON files from the run dir.
    */
  def getResults(runId: String): Option[Map[String, Any]] =
    getStatus(runId).filter(_.status == "completed").map { st =>
      val dir = Paths.get(st.runDir)
      val frames = Files.list(dir).iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("result_"))
        .toSeq.sortBy(_.getFileName.toString)
        .map(_.toString)
      // reports nest as parsed JSON objects, like the reference's
      // json.load of the run-dir files (pipeline_service.py:341-351)
      def report(name: String): Any = {
        val p = dir.resolve(name)
        if (Files.exists(p))
          org.json4s.jackson.JsonMethods.parse(Files.readString(p))
        else null
      }
      Map(
        "run_id" -> runId,
        "status" -> st.status,
        "result_paths" -> frames,
        "validation_report" -> report("validation_report.json"),
        "transformation_report" -> report("transformation_report.json"))
    }

  def shutdown(): Unit = executor.shutdown()

  private def update(runId: String, status: String, progress: Int,
                     stage: String, message: String,
                     error: Option[String] = None, flag: Option[String] = None): Unit = {
    Option(runs.get(runId)).foreach { st =>
      val flags = flag.fold(st.stageFlags)(f => st.stageFlags + (f -> true))
      val completedAt =
        if (status == "completed" || status == "failed") Some(Instant.now().toString)
        else st.completedAt
      runs.put(runId, st.copy(status = status, progress = progress,
        currentStage = stage, message = message, error = error,
        completedAt = completedAt, stageFlags = flags))
    }
  }

  private def executeRun(runId: String, request: RunRequest): Unit = {
    val st = runs.get(runId)
    try {
      update(runId, "running", 10, "ingestion", "Ingesting data")
      val pipeline = new Pipeline(ValidatorConfig(request.qualityProfile))
      // staged progress mirrors pipeline_service.py:110-259; the
      // pipeline call is synchronous, so stage flags flip around it
      update(runId, "running", 30, "ingestion", "Ingestion complete", flag = Some("ingestion"))
      update(runId, "running", 40, "validation", "Integrating dataframes")
      val run = pipeline.run(spark, request.plan,
        fetch = req => request.payloads.get(req.endpointName),
        dslRecipe = request.dslRecipe,
        keyFeatures = request.keyFeatures,
        reportDir = Some(st.runDir))
      update(runId, "running", 60, "validation", "Validation complete", flag = Some("validation"))
      update(runId, "running", 90, "transformation", "Transformation complete",
        flag = Some("transformation"))
      // result CSVs (pipeline_service.py:221-222)
      graft.load.Loader.writeCsv(run.outputs, st.runDir)
      update(runId, "completed", 100, "completed",
        s"Pipeline complete: ${run.outputs.size} dataframe(s)", flag = Some("completed"))
    } catch {
      case e: Exception =>
        update(runId, "failed", runs.get(runId).progress, "failed",
          s"Pipeline failed: ${e.getMessage}", error = Some(e.getMessage))
    }
  }
}

/** JSON (de)serialization for the service wire contract. */
object RunRequestJson {
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  private implicit val formats: Formats = DefaultFormats

  /** Parses the POST /pipeline/run body:
    * {"plan": [{"api_name":..., "endpoint_name":..., "parameters": {...}}],
    *  "payloads": {...}, "dsl_recipe": "...", "key_features": [...],
    *  "quality_profile": "balanced"}
    */
  def parse(body: String): RunRequest = {
    val j = JsonMethods.parse(body)
    val plan = ExecutionPlan((j \ "plan") match {
      case JArray(reqs) => reqs.map { r =>
        ApiRequest(
          apiName = (r \ "api_name").extract[String],
          endpointName = (r \ "endpoint_name").extract[String],
          parameters = (r \ "parameters") match {
            case JObject(fields) => fields.map { case (k, v) => k -> (v match {
              case JString(s) => s
              case JInt(i) => i.toInt
              case JDouble(d) => d
              case JBool(b) => b
              case other => other.toString
            })}.toMap
            case _ => Map.empty[String, Any]
          })
      }
      case _ => Nil
    })
    RunRequest(
      plan = plan,
      payloads = (j \ "payloads").extractOrElse[Map[String, String]](Map.empty),
      dslRecipe = (j \ "dsl_recipe").extractOpt[String],
      keyFeatures = (j \ "key_features").extractOrElse[Seq[String]](Nil),
      qualityProfile = (j \ "quality_profile").extractOrElse[String]("balanced"))
  }
}
