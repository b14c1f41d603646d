package graft.ingest

import graft.integrate.NameSimilarity

/** Semantic endpoint validation — lifecycle step 3 of the ingest plan
  * (reference: LLM_Ingestor/endpoint_validator.py:34-84, wired at
  * ingestor.py:96-110). The reference encodes the plan's semantic
  * keywords and the endpoint's registry description with MiniLM and
  * compares by cosine; the rebuild's deterministic stand-in is a
  * lexical soft-coverage score — for each query token, the best
  * Ratcliff-Obershelp ratio against any description token (the same
  * [[NameSimilarity]] machinery the union engine uses), averaged over
  * the query. Both scores live in [0, 1] and answer the same question
  * ("does this endpoint's description cover the plan's intent?"); the
  * swap is a documented divergence of SURVEY §7.5's no-model-binaries
  * rule, not a semantic change to the lifecycle.
  *
  * The contract is the reference's exactly (endpoint_validator.py:61-71):
  *   - unknown endpoint        -> ERROR "Endpoint X not found" (:40-42)
  *   - score >= threshold      -> VALID (unless already ERROR)
  *   - score <  threshold      -> warning "Low"/"Very low" (0.5 split)
  *                                and PENDING -> WARNING
  * Semantic validation NEVER blocks execution — only parameter
  * validation can mark a request ERROR-skippable.
  */
class EndpointValidator(threshold: Double = 0.7) {

  /** Lexical stand-in for the MiniLM cosine (endpoint_validator.py:50-59).
    * Empty keyword lists fall back to the reference's "financial data"
    * default query (:45-48).
    */
  def score(semanticKeywords: Seq[String], description: String): Double = {
    val query = if (semanticKeywords.nonEmpty) semanticKeywords.mkString(" ")
                else "financial data"
    val q = tokens(query)
    val d = tokens(description)
    if (q.isEmpty || d.isEmpty) 0.0
    else q.map(qt => d.map(dt => NameSimilarity.ratio(qt, dt)).max).sum / q.size
  }

  private def tokens(s: String): Seq[String] =
    s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq.distinct

  /** endpoint_validator.py:34-73. */
  def validateRequest(semanticKeywords: Seq[String], req: ApiRequest): ApiRequest =
    EndpointRegistry.endpointSpec(req.apiName, req.endpointName) match {
      case None =>
        req.copy(
          validationErrors = req.validationErrors :+ s"Endpoint ${req.endpointName} not found",
          validationStatus = "ERROR")
      case Some(spec) =>
        val sim = score(semanticKeywords, spec.description)
        val scored = req.copy(semanticScore = Some(sim))
        if (sim >= threshold) {
          if (scored.validationStatus != "ERROR") scored.copy(validationStatus = "VALID")
          else scored
        } else {
          val severity = if (sim >= 0.5) "Low" else "Very low"
          val warned = scored.copy(validationWarnings = scored.validationWarnings :+
            f"$severity%s semantic match ($sim%.2f, threshold: $threshold%s)")
          if (warned.validationStatus == "PENDING") warned.copy(validationStatus = "WARNING")
          else warned
        }
    }

  /** endpoint_validator.py:75-84. */
  /** Scores every request against the keywords the plan itself carries
    * (contracts.py:21-26 — they ship in the same LLM artifact).
    */
  def validatePlan(plan: ExecutionPlan): ExecutionPlan =
    plan.copy(rankedRequests =
      plan.rankedRequests.map(validateRequest(plan.semanticKeywords, _)))
}
