package graft.clean

import java.util.regex.Pattern

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** A column rule after merging with global defaults (reference:
  * transform/data_cleaning.py:73-122 `match_column_rule`).
  */
case class ColumnRule(
    pattern: String,
    dtype: String,
    nullThreshold: Double,
    allowColumnDeletion: Boolean,
    imputationStrategy: String,
    imputationValue: Option[String],
    validations: Seq[String])

case class RelationshipValidation(
    name: String,
    description: String,
    requiredColumns: Seq[String],
    checkType: String,
    actionOnFailure: String)

/** Raw (pre-merge) column rule as it appears in the JSON config. */
case class RawColumnRule(
    pattern: String,
    dtype: Option[String],
    nullThreshold: Option[Double],
    allowColumnDeletion: Option[Boolean],
    imputationStrategy: Option[String],
    imputationValue: Option[String],
    validations: Option[Seq[String]])

/** Cleaning configuration (reference: transform/cleaning_config.json,
  * loaded by transform/data_cleaning.py:26-70). First matching regex
  * pattern wins; Python `re.match` anchors at the start only, which
  * `Matcher.lookingAt` replicates.
  */
case class CleaningConfig(
    version: Int,
    defaultNullThreshold: Double,
    defaultAllowColumnDeletion: Boolean,
    defaultImputationStrategy: String,
    removeDuplicates: Boolean,
    columnRules: Seq[RawColumnRule],
    relationshipValidations: Seq[RelationshipValidation]) {

  private lazy val compiled: Seq[(Pattern, RawColumnRule)] =
    columnRules.map(r => Pattern.compile(r.pattern) -> r)

  def withThreshold(t: Option[Double]): CleaningConfig =
    t.fold(this)(v => copy(defaultNullThreshold = v))

  /** First matching rule merged with global defaults; falls back to
    * pure defaults if nothing matches (data_cleaning.py:112-122). */
  def matchRule(columnName: String): ColumnRule =
    compiled.collectFirst {
      case (p, r) if p.matcher(columnName).lookingAt() =>
        ColumnRule(
          pattern = r.pattern,
          dtype = r.dtype.getOrElse("auto"),
          nullThreshold = r.nullThreshold.getOrElse(defaultNullThreshold),
          allowColumnDeletion = r.allowColumnDeletion.getOrElse(defaultAllowColumnDeletion),
          imputationStrategy = r.imputationStrategy.getOrElse(defaultImputationStrategy),
          imputationValue = r.imputationValue,
          validations = r.validations.getOrElse(Nil))
    }.getOrElse(ColumnRule("default", "auto", defaultNullThreshold,
      defaultAllowColumnDeletion, defaultImputationStrategy, None, Nil))
}

object CleaningConfig {

  /** Minimal default config (data_cleaning.py:48-67, the FileNotFound
    * fallback): one catch-all rule, no relationship validations. */
  val minimal: CleaningConfig = CleaningConfig(
    version = 1,
    defaultNullThreshold = 0.5,
    defaultAllowColumnDeletion = true,
    defaultImputationStrategy = "auto",
    removeDuplicates = false,
    columnRules = Seq(RawColumnRule(".*", Some("auto"), Some(0.5), Some(true), Some("auto"), None, Some(Nil))),
    relationshipValidations = Nil)

  /** The reference's shipped stock-data config, behaviorally equivalent
    * to transform/cleaning_config.json:5-126 (embedded resource). */
  lazy val reference: CleaningConfig = fromJson(
    scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/graft/cleaning_config.json"), "UTF-8").mkString)

  def fromJson(json: String): CleaningConfig = {
    val root = new ObjectMapper().readTree(json)
    val gs = Option(root.get("global_settings"))
    def gsd(k: String, d: Double) = gs.flatMap(n => Option(n.get(k))).map(_.asDouble).getOrElse(d)
    def gsb(k: String, d: Boolean) = gs.flatMap(n => Option(n.get(k))).map(_.asBoolean).getOrElse(d)
    def gss(k: String, d: String) = gs.flatMap(n => Option(n.get(k))).map(_.asText).getOrElse(d)

    val rules = Option(root.get("column_rules")).toSeq
      .flatMap(_.elements.asScala)
      .map { n =>
        RawColumnRule(
          pattern = Option(n.get("pattern")).map(_.asText).getOrElse(""),
          dtype = Option(n.get("dtype")).map(_.asText),
          nullThreshold = Option(n.get("null_threshold")).map(_.asDouble),
          allowColumnDeletion = Option(n.get("allow_column_deletion")).map(_.asBoolean),
          imputationStrategy = Option(n.get("imputation_strategy")).map(_.asText),
          imputationValue = Option(n.get("imputation_value")).map(_.asText),
          validations = Option(n.get("validations")).map(_.elements.asScala.map(_.asText).toSeq))
      }

    val rels = Option(root.get("relationship_validations")).toSeq
      .flatMap(_.elements.asScala)
      .map { n =>
        RelationshipValidation(
          name = Option(n.get("name")).map(_.asText).getOrElse("unnamed"),
          description = Option(n.get("description")).map(_.asText).getOrElse(""),
          requiredColumns = Option(n.get("required_columns")).toSeq
            .flatMap(_.elements.asScala.map(_.asText)),
          checkType = Option(n.get("check_type")).map(_.asText).getOrElse(""),
          actionOnFailure = Option(n.get("action_on_failure")).map(_.asText).getOrElse("drop_rows"))
      }

    CleaningConfig(
      version = Option(root.get("version")).map(_.asInt).getOrElse(1),
      defaultNullThreshold = gsd("default_null_threshold", 0.5),
      defaultAllowColumnDeletion = gsb("default_allow_column_deletion", true),
      defaultImputationStrategy = gss("default_imputation_strategy", "auto"),
      removeDuplicates = gsb("remove_duplicates", false),
      columnRules = rules,
      relationshipValidations = rels)
  }
}
