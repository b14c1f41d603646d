package graft.enrich

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

/** Validates an LLM-produced DSL recipe string against the feature
  * registry and injects parameter defaults (reference:
  * transform/dsl_validator.py:5-125). Error-message strings follow the
  * reference contract verbatim, including Python's type names in type
  * errors and list formatting in allowed-value errors, so downstream
  * consumers (and the ported test-suite) see identical text.
  *
  * Custom features (`custom_*` prefix) carry a safe Spark-SQL
  * expression in `code` instead of the reference's RestrictedPython
  * (SURVEY §2.10 documents this deliberate divergence); the syntax
  * check routes through [[SafeExprDsl]].
  */
object DslValidator {

  def validate(dslString: String, registry: Registry = Registry.reference)
      : (Option[Seq[FeatureRequest]], Seq[String]) = {
    val errors = scala.collection.mutable.ArrayBuffer[String]()

    val root = try new ObjectMapper().readTree(dslString) catch {
      case _: Exception =>
        return (None, Seq("Validation Error: LLM output was not valid JSON."))
    }
    if (root == null || !root.isObject || root.get("features") == null
        || !root.get("features").isArray) {
      return (None, Seq("Validation Error: JSON must have a top-level 'features' key."))
    }

    val features = root.get("features").elements.asScala.toSeq.zipWithIndex.map {
      case (f, i) =>
        val name = Option(f.get("name")).filter(!_.isNull).map(_.asText).getOrElse(null)
        val rawParams = Option(f.get("params")).filter(_.isObject)
          .map(_.properties.asScala.toSeq.map(e => e.getKey -> Registry.jsonValue(e.getValue)))
          .getOrElse(Nil)
        val params = scala.collection.mutable.LinkedHashMap[String, Any](rawParams: _*)
        val label = s"Feature $i ('$name')"

        if (name != null && name.startsWith("custom_")) {
          // Custom feature contract: code + as (dsl_validator.py:29-51)
          params.get("code") match {
            case None =>
              errors += s"$label: Missing required 'code' parameter for custom feature."
            case Some(code) =>
              SafeExprDsl.validate(code.toString).left.foreach { msg =>
                errors += s"$label: Invalid expression in code: $msg"
              }
          }
          if (!params.contains("as")) {
            errors += s"$label: Missing required 'as' parameter for output column name."
          }
        } else if (name == null || !registry.contains(name)) {
          errors += s"$label: Not a supported feature."
        } else {
          val spec = registry.feature(name).get
          // Required-check + defaults injection, registry param order
          spec.params.foreach { case (pName, pSpec) =>
            if (pSpec.required && !params.contains(pName) && pSpec.default.isEmpty) {
              errors += s"$label: Required parameter '$pName' is missing and has no default value."
            } else if (!params.contains(pName) && pSpec.default.isDefined) {
              params(pName) = pSpec.default.get
            }
          }
          // Validate provided params (including injected defaults,
          // matching the reference's mutate-then-check behavior)
          params.foreach { case (pName, value) =>
            spec.param(pName) match {
              case None =>
                errors += s"$label: Parameter '$pName' is not supported for this feature."
              case Some(pSpec) =>
                val typeOk = pSpec.tpe match {
                  case "string" if !value.isInstanceOf[String] =>
                    errors += s"$label: Parameter '$pName' must be a string, but got ${pyTypeName(value)}."
                    false
                  // Python treats bool as an int subclass, so true/false
                  // pass the int check (dsl_validator.py:104)
                  case "int" if !value.isInstanceOf[Int] && !value.isInstanceOf[Boolean] =>
                    errors += s"$label: Parameter '$pName' must be an integer, but got ${pyTypeName(value)}."
                    false
                  case _ => true
                }
                if (typeOk) pSpec.allowed.foreach { allowed =>
                  if (!allowed.contains(value)) {
                    errors += s"$label: Parameter '$pName' has value '$value', " +
                      s"but must be one of ${pyListRepr(allowed)}."
                  }
                }
            }
          }
        }
        FeatureRequest(
          name = Option(name).getOrElse(""),
          params = params.toMap,
          as = Option(f.get("as")).filter(!_.isNull).map(_.asText))
    }

    if (errors.nonEmpty) (None, errors.toSeq) else (Some(features), Nil)
  }

  /** Python's type(x).__name__ for the JSON value shapes we produce. */
  private def pyTypeName(v: Any): String = v match {
    case null => "NoneType"
    case _: Boolean => "bool"
    case _: Int => "int"
    case _: Double => "float"
    case _: String => "str"
    case _ => v.getClass.getSimpleName
  }

  /** Python list repr: strings quoted, numbers bare. */
  private def pyListRepr(xs: Seq[Any]): String =
    xs.map {
      case s: String => s"'$s'"
      case other => other.toString
    }.mkString("[", ", ", "]")
}
