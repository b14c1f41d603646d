package graft.llmdata

import graft.SparkSpec

/** Dedup quality-impact report: the cross-source-cluster case (a
  * source losing its copy to another source's canonical) and the
  * exact micro means.
  */
class QualityImpactSpec extends SparkSpec {
  import spark.implicits._

  // 8 distinct non-stopword tokens: q = 0.4 + 0.3 + 0.3*(8/50) = 0.748
  private val t8 = "alpha beta gamma delta epsilon zeta eta theta"
  private val q8 = 748000L

  test("a cluster straddling sources books the loss on the losing source") {
    val docs = Seq(
      (0L, t8, "s1"), // canonical (doc_id tie-break on equal quality)
      (1L, t8, "s2"), // identical copy, dropped
      (2L, "one two three four five six seven eight", "s2"))
      .toDF("doc_id", "text", "source")
    val rows = Dedup.qualityImpact(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val s1 = rows("s1")
    assert((s1.getAs[Long]("n_kept"), s1.getAs[Long]("n_dropped")) ===
      ((1L, 0L)))
    assert(s1.getAs[Long]("mean_kept_micro") === q8)
    assert(s1.getAs[Long]("mean_dropped_micro") === 0L)
    val s2 = rows("s2")
    assert((s2.getAs[Long]("n_kept"), s2.getAs[Long]("n_dropped")) ===
      ((1L, 1L)))
    assert(s2.getAs[Long]("mean_dropped_micro") === q8)
    assert(s2.getAs[Long]("delta_micro") ===
      s2.getAs[Long]("mean_kept_micro") - q8)
  }

  test("jaccardThresholdSweep sampling: 1e6 ppm is the identity, the cut only shrinks") {
    val docs = (0L until 30L)
      .map(i => (i, if (i % 3 == 0) t8 else s"$t8 extra$i tail$i"))
      .toDF("doc_id", "text")
    val full = Dedup.jaccardThresholdSweep(docs).collect()
    val same = Dedup.jaccardThresholdSweep(docs, samplePpm = 1000000L)
      .collect()
    assert(full.map(_.toSeq).toSeq === same.map(_.toSeq).toSeq)
    val sampled = Dedup.jaccardThresholdSweep(docs, samplePpm = 250000L)
      .collect()
    assert(sampled.map(_.getLong(0)).toSeq === full.map(_.getLong(0)).toSeq)
    sampled.zip(full).foreach { case (s, f) =>
      assert(s.getAs[Long]("n_candidates") <= f.getAs[Long]("n_candidates"))
      assert(s.getAs[Long]("n_pairs") <= f.getAs[Long]("n_pairs"))
    }
    assert(sampled(0).getAs[Long]("n_candidates") <
      full(0).getAs[Long]("n_candidates"))
  }

  test("singleton-only corpus drops nothing") {
    val docs = Seq(
      (0L, t8, "a"),
      (1L, "one two three four five six seven eight", "b"))
      .toDF("doc_id", "text", "source")
    val rows = Dedup.qualityImpact(docs).collect()
    assert(rows.forall(_.getAs[Long]("n_dropped") === 0L))
    assert(rows.forall(_.getAs[Long]("mean_dropped_micro") === 0L))
  }
}
