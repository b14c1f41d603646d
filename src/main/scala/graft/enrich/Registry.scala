package graft.enrich

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Parameter spec for one registry feature (reference:
  * transform/registry.yaml param maps). `default`/`allowed` values keep
  * their JSON types (Int or String).
  */
case class ParamSpec(
    tpe: String,
    required: Boolean,
    default: Option[Any],
    allowed: Option[Seq[Any]])

case class FeatureSpec(description: String, params: Seq[(String, ParamSpec)]) {
  def param(name: String): Option[ParamSpec] = params.collectFirst { case (n, s) if n == name => s }
}

/** The feature registry (reference: transform/registry.yaml:1-247,
  * loaded by enrichment.py:577-579). Parameter order is preserved so
  * defaults inject and errors accumulate in the reference's order.
  */
case class Registry(version: Int, features: Seq[(String, FeatureSpec)]) {
  def feature(name: String): Option[FeatureSpec] =
    features.collectFirst { case (n, s) if n == name => s }
  def contains(name: String): Boolean = features.exists(_._1 == name)
}

object Registry {

  /** The shipped registry, behaviorally equivalent to the reference's
    * registry.yaml (embedded as JSON — no YAML parser dependency). */
  lazy val reference: Registry = fromJson(
    scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/graft/registry.json"), "UTF-8").mkString)

  def fromJson(json: String): Registry = {
    val root = new ObjectMapper().readTree(json)
    val feats = Option(root.get("features")).toSeq.flatMap { fs =>
      fs.properties.asScala.toSeq.map { e =>
        val params = Option(e.getValue.get("params")).toSeq.flatMap { ps =>
          ps.properties.asScala.toSeq.map { pe =>
            pe.getKey -> ParamSpec(
              tpe = Option(pe.getValue.get("type")).map(_.asText).getOrElse(""),
              required = Option(pe.getValue.get("required")).exists(_.asBoolean),
              default = Option(pe.getValue.get("default")).map(jsonValue),
              allowed = Option(pe.getValue.get("allowed"))
                .map(_.elements.asScala.map(jsonValue).toSeq))
          }
        }
        e.getKey -> FeatureSpec(
          Option(e.getValue.get("description")).map(_.asText).getOrElse(""), params)
      }
    }
    Registry(Option(root.get("version")).map(_.asInt).getOrElse(1), feats)
  }

  /** JSON scalar -> the value shape the validator type-checks. */
  def jsonValue(n: JsonNode): Any =
    if (n.isInt || n.isLong) n.asInt
    else if (n.isBoolean) n.asBoolean
    else if (n.isDouble || n.isFloat || n.isBigDecimal) n.asDouble
    else if (n.isNull) null
    else n.asText
}
