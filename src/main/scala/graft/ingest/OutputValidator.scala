package graft.ingest

import org.apache.spark.sql.DataFrame

import graft.integrate.NameSimilarity

/** Requested-feature presence validation over a parsed frame
  * (reference: LLM_Ingestor/output_validator.py:10-81): normalize
  * (lower, strip space/underscore/hyphen), exact -> alias -> fuzzy
  * (difflib ratio >= 0.8) match per feature. Schema-level only — never
  * touches row data.
  */
class OutputValidator(fuzzyThreshold: Double = 0.8) {

  private val aliases: Map[String, Seq[String]] = Map(
    "open" -> Seq("open", "openprice", "o"),
    "high" -> Seq("high", "highprice", "h"),
    "low" -> Seq("low", "lowprice", "l"),
    "close" -> Seq("close", "closeprice", "c"),
    "volume" -> Seq("volume", "vol", "v"),
    "value" -> Seq("value", "val"))

  private def normalize(s: String): String =
    s.toLowerCase.replace(" ", "").replace("_", "").replace("-", "")

  def validateDataset(df: DataFrame, nativeFeatures: Seq[String],
                      apiName: String, endpointName: String,
                      ticker: Option[String] = None): FeatureValidationReport = {
    val columns = df.columns.toSeq
    if (columns.isEmpty)
      return FeatureValidationReport(apiName, endpointName, ticker,
        Nil, Nil, nativeFeatures, Nil, validationPassed = false)
    val normalized = columns.map(c => normalize(c) -> c).toMap

    val found = scala.collection.mutable.ArrayBuffer[String]()
    val fuzzy = scala.collection.mutable.ArrayBuffer[(String, String, Double)]()
    val missing = scala.collection.mutable.ArrayBuffer[String]()

    nativeFeatures.foreach { feature =>
      val nf = normalize(feature)
      if (normalized.contains(nf)) found += feature
      else if (aliases.get(nf).exists(_.exists(a => normalized.contains(normalize(a)))))
        found += feature
      else {
        val best = normalized.map { case (nc, orig) =>
          (orig, NameSimilarity.ratio(nf, nc))
        }.maxByOption(_._2)
        best match {
          case Some((col, score)) if score >= fuzzyThreshold =>
            fuzzy += ((nf, col, score))
          case _ => missing += feature
        }
      }
    }

    FeatureValidationReport(apiName, endpointName, ticker,
      found.toSeq, fuzzy.toSeq, missing.toSeq, columns,
      validationPassed = missing.isEmpty)
  }
}
