package graft.ingest

import java.time.LocalDate
import java.time.format.DateTimeFormatter

/** Request/plan parameter validation + per-API enrichment (reference:
  * LLM_Ingestor/parameter_validator.py:16-154): required-with-aliases
  * checks with default injection, date-format and future-date
  * handling, enum checks, then provider-specific parameter enrichment
  * (Polygon endpoint_type codes and indicator defaults, Alpha Vantage
  * `function`/`symbol`/`interval`/`outputsize`).
  *
  * `today` is injectable so the future-date clamp is deterministic in
  * tests (the reference uses wall-clock `datetime.now()`).
  */
class ParameterValidator(today: LocalDate = LocalDate.now()) {

  private val dateFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd")

  def validatePlan(plan: ExecutionPlan): ExecutionPlan =
    plan.copy(rankedRequests = plan.rankedRequests.map(validateRequest))

  def validateRequest(request: ApiRequest): ApiRequest = {
    val spec = EndpointRegistry.endpointSpec(request.apiName, request.endpointName) match {
      case Some(s) => s
      case None =>
        return request.copy(validationStatus = "ERROR",
          validationErrors = request.validationErrors :+
            s"Endpoint ${request.endpointName} not found")
    }

    val errors = scala.collection.mutable.ArrayBuffer[String]()
    val warnings = scala.collection.mutable.ArrayBuffer[String]()
    var params = request.parameters

    // Required parameters: satisfied by name or alias, else default,
    // else error (parameter_validator.py:36-48)
    spec.parameters.filter(_.required).foreach { p =>
      val present = params.contains(p.name) || p.aliases.exists(params.contains)
      if (!present) {
        p.defaultValue match {
          case Some(d) =>
            params += p.name -> d
            warnings += s"Using default for ${p.name}: $d"
          case None =>
            errors += s"Missing required: ${p.name}"
        }
      }
    }

    // Per-parameter checks (parameter_validator.py:50-61,85-106)
    params.foreach { case (name, value) =>
      spec.parameter(name).foreach { p =>
        p.ptype match {
          case ParameterType.DateT if p.format.contains("YYYY-MM-DD") =>
            try {
              val d = LocalDate.parse(value.toString, dateFmt)
              if (d.isAfter(today)) {
                warnings += s"$name is in future"
                params += name -> today.format(dateFmt)
              }
            } catch {
              case _: Exception => errors += s"$name must be YYYY-MM-DD"
            }
          case ParameterType.EnumT if p.validValues.nonEmpty =>
            if (!p.validValues.contains(value.toString))
              errors += s"$name must be one of ${p.validValues.mkString("[", ", ", "]")}"
          case _ => ()
        }
      }
    }

    params = enrich(params, request.apiName, request.endpointName, spec)

    val status =
      if (errors.nonEmpty) "ERROR"
      else if (warnings.nonEmpty) "WARNING"
      else if (request.validationStatus == "PENDING") "VALID"
      else request.validationStatus
    request.copy(
      parameters = params,
      validationStatus = status,
      validationErrors = request.validationErrors ++ errors,
      validationWarnings = request.validationWarnings ++ warnings)
  }

  /** Provider-specific enrichment (parameter_validator.py:108-154). */
  private def enrich(parameters: Map[String, Any], apiName: String,
                     endpointName: String, spec: EndpointSpec): Map[String, Any] = {
    var p = parameters
    apiName match {
      case "polygon" =>
        val endpointType = Map(
          "get_aggs" -> 0, "get_grouped_daily_aggs" -> 1,
          "get_daily_open_close_agg" -> 2, "get_previous_close_agg" -> 3,
          "FULL_MARKET_SNAPSHOT" -> 4)
        endpointType.get(endpointName) match {
          case Some(code) => p += "endpoint_type" -> code
          case None if spec.dataCategory == "economic_indicator" =>
            p += "endpoint_type" -> "economic_indicator"
            if (!p.contains("indicator")) p += "indicator" -> endpointName
            if (!p.contains("limit") || p("limit") == null) p += "limit" -> 30
            p.get("sort") match {
              case Some(s: String) if !s.contains(".") => p += "sort" -> s"date.$s"
              case None => p += "sort" -> "date.desc"
              case _ => ()
            }
          case None => ()
        }
        if (p.contains("date") && !p.contains("from")) p += "from" -> p("date")
      case "alpha_vantage" =>
        p += "function" -> endpointName
        p.get("ticker").foreach(t => p += "symbol" -> t)
        if (endpointName == "TIME_SERIES_INTRADAY")
          p += "interval" -> p.getOrElse("timespan", p.getOrElse("interval", "5min"))
        else if (endpointName == "TIME_SERIES_DAILY_ADJUSTED" && !p.contains("outputsize"))
          p += "outputsize" -> "full"
      case _ => ()
    }
    p
  }
}
