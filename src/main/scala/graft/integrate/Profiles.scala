package graft.integrate

/** Validator thresholds and quality profiles (reference:
  * validator/config.py:12-65). Profile selection swaps the four
  * preset values; the union scoring constants are fixed.
  */
case class ValidatorConfig(
    profile: String,
    unionCompatibilityThreshold: Double,
    joinRetentionThreshold: Double,
    maxMatchesPerRow: Int, // 0 = unlimited
    columnDeleteThreshold: Double) {

  val unionThreshold: Double = 0.72 // min hybrid score for a column pair
  val unionNameWeight: Double = 0.85
  val unionModelWeight: Double = 0.15
  val joinRowThreshold: Double = 0.44 // min pair probability
  val maxDataframes: Int = 10
  val epsilon: Double = 1e-10
  val closeTolerance: Double = 0.1
  val veryCloseTolerance: Double = 0.01
}

object ValidatorConfig {
  val highQuality: ValidatorConfig = ValidatorConfig("high_quality", 0.7, 0.65, 2, 0.3)
  val balanced: ValidatorConfig = ValidatorConfig("balanced", 0.6, 0.5, 5, 0.5)
  val highVolume: ValidatorConfig = ValidatorConfig("high_volume", 0.4, 0.35, 0, 0.7)

  def apply(profile: String): ValidatorConfig = profile match {
    case "high_quality" => highQuality
    case "high_volume" => highVolume
    case _ => balanced // unknown profile falls back to default (config.py:42-45)
  }
}
