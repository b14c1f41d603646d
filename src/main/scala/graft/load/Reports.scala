package graft.load

import java.nio.file.{Files, Paths}

import org.json4s._
import org.json4s.jackson.JsonMethods

/** K3: JSON report sink — the run's report case-class trees
  * (CleanReport, ValidatorReport, LoadReport, ...) serialized to the
  * reference's snake_case JSON contracts
  * (transform/data_cleaning.py:332-443 cleaning report,
  * validator/validator.py:241-250 validation report,
  * backend/app/services/pipeline_service.py:95-98,180-184,224-228
  * report files per run).
  *
  * Driver-side by design: reports are kilobytes of metadata, not data.
  */
object Reports {

  private implicit val formats: Formats = DefaultFormats

  private def snake(s: String): String =
    s.replaceAll("([a-z0-9])([A-Z])", "$1_$2").toLowerCase

  private def keysToSnake(j: JValue): JValue = j.transformField {
    case JField(k, v) => JField(snake(k), v)
  }

  /** Serializes any report case-class tree to pretty snake_case JSON. */
  def toJson(report: Any): String =
    JsonMethods.pretty(JsonMethods.render(keysToSnake(Extraction.decompose(report))))

  /** Single-line variant for line-framed protocols (SSE `data:` frames). */
  def toJsonCompact(report: Any): String =
    JsonMethods.compact(JsonMethods.render(keysToSnake(Extraction.decompose(report))))

  /** Writes a report JSON file (e.g. `validation_report.json`). */
  def write(report: Any, path: String): String = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.writeString(p, toJson(report))
    path
  }
}
