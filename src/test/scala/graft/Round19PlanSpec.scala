package graft

import org.apache.spark.sql.functions._

import graft.llmdata.AnnSearch

/** Plan-shape contracts for the round-19 operators: the adaptive
  * radius search must take the path its measured regime earns —
  * diffuse corpora get the one brute scan (no pointless index
  * build), clustered corpora get the ball-pruned bucket join. */
class Round19PlanSpec extends SparkSpec {
  import spark.implicits._

  /** Diffuse fixture: LCG pseudo-random components — bucket radii sit
    * near the corpus spread, so the ball bound rejects ~nothing. */
  private def diffuse = (0L until 96L).map { i =>
    val v = Array.tabulate(8) { d =>
      (((i * 8 + d) * 1103515245L + 12345L) % 2001L - 1000L).toFloat / 1000f
    }
    (i, v)
  }.toDF("vec_id", "embedding")

  /** Clustered fixture: four tight antipodal/orthogonal clusters —
    * bucket radii collapse, cross-cluster buckets prune. */
  private def clustered = (0L until 96L).map { i =>
    val c = (i % 4).toInt
    val axis = Array(0, 0, 4, 4)(c)
    val sign = if (c % 2 == 0) 1f else -1f
    val v = Array.fill(8)(0f)
    v(axis) = sign
    v(7) = 0.001f * (i % 5)
    (i, v)
  }.toDF("vec_id", "embedding")

  test("radiusSearchAdaptive: diffuse corpus takes the brute path (no bucket join)") {
    val out = AnnSearch.radiusSearchAdaptive(diffuse,
      col("vec_id") < 8L, 250000L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("bucket"),
      s"diffuse regime must skip the IVF build and scan once:\n$plan")
    assert(!plan.toLowerCase.contains("sortmergejoin"),
      s"brute path broadcasts the queries:\n$plan")
  }

  test("radiusSearchAdaptive: clustered corpus takes the pruned path (bucket join)") {
    val out = AnnSearch.radiusSearchAdaptive(clustered,
      col("vec_id") < 8L, 250000L, sampleMod = 1L)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("bucket"),
      s"clustered regime must prune via the bucket equi-join:\n$plan")
  }

  test("radiusSearchAdaptive: both regimes return exactly the brute rows") {
    for (fix <- Seq(diffuse, clustered)) {
      val c = AnnSearch.vectors(fix)
      val brute = AnnSearch.radiusSearch(c, c.filter(col("vec_id") < 8L),
          250000L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
      val adaptive = AnnSearch.radiusSearchAdaptive(fix,
          col("vec_id") < 8L, 250000L, sampleMod = 1L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
      assert(adaptive == brute, "adaptive must be exact in every regime")
    }
  }

  test("sampledPrunedFraction separates the regimes at the decision cut") {
    val diffuseF = AnnSearch.sampledPrunedFraction(diffuse, 250000L,
      sampleMod = 1L).getOrElse(0.0)
    val clusteredF = AnnSearch.sampledPrunedFraction(clustered, 250000L,
      sampleMod = 1L).getOrElse(0.0)
    assert(diffuseF < 0.5,
      s"diffuse pruning power must sit below the cut: $diffuseF")
    assert(clusteredF >= 0.5,
      s"clustered pruning power must clear the cut: $clusteredF")
  }
}
