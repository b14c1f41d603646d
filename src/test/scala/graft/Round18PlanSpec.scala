package graft

import org.apache.spark.sql.functions._

import graft.clean.Profiler
import graft.enrich.GroupStats
import graft.llmdata.{AnnSearch, Curation, EmbeddingOps, TextAnalysis}

/** Plan-shape contracts for the round-18 operators — the 100 TB
  * claims as assertions: small sides broadcast, corpus work map-side
  * combines, top-k never globally sorts, and the anchored
  * decontamination never self-joins the corpus. */
class Round18PlanSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (0L until 200L)
    .map(i => (i, s"alpha beta tok$i gamma delta", s"s${i % 3}"))
    .toDF("doc_id", "text", "source")

  private def vecs = (0L until 100L)
    .map(i => (i, Array.tabulate(8)(d => (i % 7 + d).toFloat), (i % 3).toInt))
    .toDF("vec_id", "embedding", "label")

  test("queryLikelihoodTopK: top-k is TakeOrdered, stats attach by broadcast") {
    val plan = TextAnalysis.queryLikelihoodTopK(docs, Seq("alpha", "beta"), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be a per-partition heap, not a global sort:\n$plan")
    assert(!plan.toLowerCase.contains("cartesianproduct"),
      s"the candidate x terms expansion must broadcast:\n$plan")
  }

  test("radiusSearch: queries broadcast — no sort-merge join anywhere") {
    val v = AnnSearch.vectors(vecs)
    val plan = AnnSearch.radiusSearch(v, v.filter(col("vec_id") < 5L), 100000L)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("sortmergejoin"),
      s"queries must broadcast against the one corpus scan:\n$plan")
  }

  test("audienceOverlap: type sizes broadcast, rollup map-side combines") {
    val ev = (0L until 300L).map(i => (s"t${i % 4}", i % 37))
      .toDF("event_type", "user_id")
    val plan = GroupStats.audienceOverlap(ev, "event_type", "user_id")
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("cartesianproduct"),
      s"pair expansion must be a user-keyed equi-join:\n$plan")
    assert(plan.toLowerCase.contains("partial"),
      s"pair counts must map-side combine:\n$plan")
  }

  test("labelCentroidMatrix: one corpus-sized aggregate, bounded joins broadcast") {
    val plan = EmbeddingOps.labelCentroidMatrix(vecs)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("sortmergejoin"),
      s"the (label, dim) frame is bounded — every join must broadcast:\n$plan")
    assert(plan.toLowerCase.contains("partial"),
      s"the (label, dim) sums must map-side combine:\n$plan")
  }

  test("keyUniqueness: every subset's distinct aggregate map-side combines") {
    val ev = (0L until 300L).map(i => (i % 50, s"t${i % 4}")).toDF("u", "t")
    val plan = Profiler.keyUniqueness(ev, Seq(Seq("u"), Seq("u", "t")))
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("partial"),
      s"distinct counts must map-side combine:\n$plan")
    assert(!plan.toLowerCase.contains("join"),
      s"subsets are audited independently — no join:\n$plan")
  }

  test("growthAccounting: windows ride the (user, bucket) activity grain") {
    import graft.enrich.Funnel
    val ev = (0L until 500L).map(i => (i % 37, (i % 19) * 86400000000L))
      .toDF("u", "t")
    val plan = Funnel.growthAccounting(ev, "u", "t", 86400000000L)
      .queryExecution.executedPlan.toString
    // the only window partitioning is per-user over DISTINCT activity
    // rows; the state rollup map-side combines
    assert(!plan.toLowerCase.contains("cartesianproduct"), plan)
    assert(plan.toLowerCase.contains("partial"),
      s"bucket rollup must map-side combine:\n$plan")
  }

  test("powerLawAlpha: no window, no join — two combining aggregates") {
    import graft.enrich.GroupStats
    val ev = (0L until 300L).map(i => Tuple1(i % 41)).toDF("u")
    val plan = GroupStats.powerLawAlpha(ev, "u")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.toLowerCase.contains("join"),
      s"count-of-counts rollup only:\n$plan")
    assert(plan.toLowerCase.contains("partial"),
      s"entity counts must map-side combine:\n$plan")
  }

  test("qualityBudgetCurve: the threshold grid joins the bounded grain, not the corpus") {
    import graft.llmdata.Curation
    val plan = Curation.qualityBudgetCurve(docs, Seq(0L, 500000L))
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("sortmergejoin"),
      s"grid and totals must broadcast onto the quality-grain frame:\n$plan")
    assert(plan.toLowerCase.contains("partial"),
      s"the quality-grain collapse must map-side combine:\n$plan")
  }

  test("decontaminateAnchored: the corpus NEVER self-joins — eval side broadcasts") {
    val ev = docs.filter(col("doc_id") % 7 === 0).select("doc_id", "text")
    val plan = Curation.decontaminateAnchored(docs, ev)
      .queryExecution.executedPlan.toString
    // the cluster spelling's band SELF-join is exactly what this
    // variant removes: pair FORMATION (the band/key join) and the
    // eval shingle-set attach must broadcast — the only shuffle joins
    // allowed are doc-id-keyed verdict attaches of doc-grain frames
    val lower = plan.toLowerCase
    assert(!"sortmergejoin \\[(band|key)".r.findFirstIn(lower).isDefined,
      s"the band/key pair join must broadcast the eval side:\n$plan")
    assert(lower.contains("broadcasthashjoin") ||
      lower.contains("broadcastnestedloopjoin"),
      s"eval-derived frames must attach by broadcast:\n$plan")
    spark.sharedState.cacheManager.clearCache() // sketch caches
  }
}
