package graft.llmdata

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.execution.columnar.InMemoryRelation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

import graft.SparkSpec

/** Capstone-vs-components COST pin (VERDICT r16 §next-5): the v5
  * pipeline must evaluate the quality-ensemble chain EXACTLY ONCE —
  * the r16 defect was a value-correct composition that re-ran the
  * chain ~5× (per training pass + the verdict column), and this spec
  * keeps that defect class from silently returning in v6+.
  *
  * Detection: a [[QueryExecutionListener]] captures every execution
  * fired while v5 is built (the fit's epoch collects) and
  * materialized; an execution RECOMPUTES the ensemble iff its
  * OPTIMIZED plan carries a [[GopherSignalsExpression]] — the
  * chain's distinctive kernel, used nowhere else in v5. A cached
  * read can't false-positive: `InMemoryRelation` is a LEAF of the
  * logical plan (its cached plan is a member, not a child), so a
  * tree walk never descends into the persisted label frame's
  * definition. Cross-suite capture (the shared test session runs
  * suites in parallel) is excluded by keying the pipeline on a
  * globally unique id column name and filtering captured plans on it.
  */
class CurationV5CostSpec extends SparkSpec {
  import spark.implicits._

  private val idCol = "v5pin_id"

  // Parquet-backed, NOT a LocalRelation: Catalyst constant-folds a
  // deterministic Project over LocalRelation at OPTIMIZATION time,
  // which would erase the kernel from every plan and blind the
  // detector (verified while building this spec).
  private lazy val docsPath: String = {
    val p = java.nio.file.Files.createTempDirectory("v5pin").toString
    (0L until 60L).map { i =>
      val body = if (i % 4 == 0)
        "the quick brown fox jumps over the lazy dog again and again"
      else
        s"alpha beta gamma delta epsilon zeta token$i common words flow here nicely today"
      (i, body, if (i % 3 == 0) "en" else "de", s"s${i % 2}")
    }.toDF(idCol, "text", "lang", "source")
      .write.mode("overwrite").parquet(p)
    p
  }

  private def docsDf = spark.read.parquet(docsPath)

  private def hasEnsembleKernel(qe: QueryExecution): Boolean =
    qe.optimizedPlan.find(node => node.expressions.exists(_.exists {
      case _: GopherSignalsExpression => true
      case _ => false
    })).isDefined

  private def mentionsPipeline(qe: QueryExecution): Boolean =
    qe.optimizedPlan.find(
      _.output.exists(_.name.contains(idCol))).isDefined ||
      qe.optimizedPlan.find(node => node.expressions.exists(_.exists {
        case a: org.apache.spark.sql.catalyst.expressions.Attribute =>
          a.name.contains(idCol)
        case _ => false
      })).isDefined

  private final class Capture extends QueryExecutionListener {
    val recomputes = new ConcurrentLinkedQueue[String]()
    @volatile var seen = 0
    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit = {
      seen += 1
      if (mentionsPipeline(qe) && hasEnsembleKernel(qe))
        recomputes.add(qe.optimizedPlan.toString.take(2000))
    }
    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit = ()
  }

  /** The listener bus is async: poll until the capture has seen at
    * least one event AND stops growing for a full second. */
  private def settle(c: Capture): Unit = {
    var last = -1
    var stable = 0
    var waited = 0
    while ((c.seen == 0 || stable < 2) && waited < 30000) {
      if (c.seen == last) stable += 1 else stable = 0
      last = c.seen
      Thread.sleep(500); waited += 500
    }
  }

  private def withCapture[A](f: => A): (A, Capture) = {
    val c = new Capture
    spark.listenerManager.register(c)
    try { val r = f; settle(c); (r, c) }
    finally spark.listenerManager.unregister(c)
  }

  test("v5 capstone: ensemble chain never re-executes — label frame is cached") {
    val d = docsDf
    val (out, cap) = withCapture {
      val v5 = Curation.curationVerdictsV5(
        d, d.filter(col(idCol) % 7 === 0).select(col(idCol), col("text")),
        Map("s0" -> 600000L, "s1" -> 600000L),
        target = col("lang") === "en", idCol = idCol)
      v5.collect() // materializes the verdict (fit already collected)
      v5
    }
    // the weak-label frame is behind a cache in the final plan…
    val cached = out.queryExecution.optimizedPlan.collect {
      case r: InMemoryRelation => r
    }
    assert(cached.nonEmpty,
      "v5 must read its ensemble weak label through a persisted frame")
    // …and no captured execution re-ran the chain (the cache build
    // happens INSIDE the InMemoryRelation, not as a plan recompute)
    assert(cap.recomputes.isEmpty,
      s"ensemble chain recomputed ${cap.recomputes.size}×:\n" +
        cap.recomputes.peek())
    spark.sharedState.cacheManager.clearCache() // caller-release
  }

  test("negative control: an unpersisted weak label IS detected as a recompute") {
    val d = docsDf
    val (_, cap) = withCapture {
      val labels = TextAnalysis.qualityEnsemble(d, idCol, "text", "lang")
        .select(col(idCol),
          when(col("keep"), 1L).otherwise(0L).as("__y")) // NOT persisted
      Classifier.trainScoresLabeled(
        d.select(col(idCol), col("text")), labels, epochs = 1,
        idCol = idCol).collect()
    }
    assert(!cap.recomputes.isEmpty,
      "detector lost its teeth: unpersisted ensemble labels must " +
        "register as plan recomputations")
    spark.sharedState.cacheManager.clearCache()
  }
}
