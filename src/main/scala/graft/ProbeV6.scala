package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llmdata.{Curation, Sampling, TextAnalysis}

/** Component-attribution probe for the v6 budget capstone (VERDICT
  * r17 §next-1): times, on one dir (a zipf tier), each stage the v6
  * plan adds on top of the anchored v5 gate chain — so the PLANS.md
  * 100× row can say WHICH component dominates instead of inferring it
  * from entry-level deltas. Stages:
  *
  *  1. `gates`    — the anchored v5 verdict frame (v6's input);
  *  2. `v6_total` — the full v6 capstone;
  *  3. `quality`  — [[TextAnalysis.qualityScore]] alone (the scan v6
  *                  adds for the ordering key);
  *  4. `budget_cut_full` — [[Sampling.selectByTokenBudget]] over the
  *                  WHOLE corpus's (id, qm, n_tokens) frame — an upper
  *                  bound on the real cut, which only sorts the gated
  *                  subset.
  *
  * Usage: `runMain graft.ProbeV6 <dir> [repeat]` (the [[RehearseKc]]
  * ad-hoc-harness convention). Prints one `[probe]` line per stage.
  */
object ProbeV6 {
  private val mixtureTargets = Map(
    "en" -> 400000L, "zh" -> 150000L, "es" -> 150000L,
    "fr" -> 150000L, "de" -> 150000L)

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("benchdata/zipf1")
    val repeat = args.lift(1).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tracker = BenchReset.install(spark)

    def docs: DataFrame = QuerySupport.table(spark, dir, "documents")
    def ev: DataFrame =
      docs.filter(col("doc_id") % 97 === 0).select("doc_id", "text")
    def anchored: DataFrame =
      Curation.decontaminateAnchored(docs, ev)
        .select(col("doc_id"), (!col("flagged")).as("decontam_keep"))

    val stages: Seq[(String, () => DataFrame)] = Seq(
      "gates" -> (() => Curation.curationVerdictsV5(docs, ev,
        mixtureTargets, target = col("lang") === "en",
        decontamVerdict = Some(anchored))),
      "v6_total" -> (() => Curation.curationVerdictsV6(docs, ev,
        mixtureTargets, target = col("lang") === "en",
        tokenBudget = 20000L, decontamVerdict = Some(anchored))),
      "quality" -> (() => TextAnalysis.qualityScore(docs, "doc_id", "text")),
      "budget_cut_full" -> (() => Sampling.selectByTokenBudget(
        TextAnalysis.qualityScore(docs, "doc_id", "text")
          .select(col("doc_id"),
            floor(col("quality") * lit(1000000.0) + lit(0.5)).cast("long")
              .as("qm"),
            col("n_tokens")),
        scoreCol = "qm", tokenCol = "n_tokens", tieCol = "doc_id",
        budget = 20000L)))

    stages.foreach { case (name, mk) =>
      val times = (1 to repeat).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        BenchReset.resetOrFail(spark, tracker)
        t
      }
      val med = times.sorted.apply(times.length / 2)
      println(f"[probe] $name%-16s median=$med%8.2f s  runs=${
        times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
