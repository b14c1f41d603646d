package graft.llmdata

import graft.SparkSpec

/** Semantic pins for the lognormal-fit / activity-gini /
  * threshold-sweep wave.
  */
class Wave9OpsSpec extends SparkSpec {
  import spark.implicits._

  test("lengthLognormalFit: constant lengths give sigma 0 and exact median") {
    val docs = (1 to 10).map(i => (i.toLong, (1 to 8).map(j => s"w$j")
      .mkString(" "))).toDF("doc_id", "text")
    val r = TextAnalysis.lengthLognormalFit(docs).collect().head
    assert(r.getLong(0) == 10L)
    assert(r.getLong(1) == 2079L)   // floor(ln(8)*1000 + 0.5)
    assert(r.getLong(2) == 0L)      // zero variance
    assert(r.getLong(3) == 8L && r.getLong(4) == 8L)
  }

  test("activityGini: equal activity = 0, 1:9 split = 0.4 exactly") {
    val eq = (1 to 4).flatMap(u => Seq.fill(3)(Tuple1(u.toLong)))
      .toDF("user_id")
    assert(TextAnalysis.activityGini(eq, "user_id")
      .collect().head.getLong(2) == 0L)
    val skew = (Seq.fill(1)(1L) ++ Seq.fill(9)(2L)).map(Tuple1(_))
      .toDF("user_id")
    val r = TextAnalysis.activityGini(skew, "user_id").collect().head
    // sorted x = (1, 9): G = ((2-3)*1 + (4-3)*9) / (2*10) = 0.4
    assert(r.getLong(0) == 2L && r.getLong(1) == 10L)
    assert(r.getLong(2) == 400000L)
  }

  test("jaccardThresholdSweep: monotone, exact duplicates survive everywhere") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val edited = base.dropRight(1) + "X"
    val docs = Seq((1L, base), (2L, base), (3L, edited))
      .toDF("doc_id", "text")
    val out = Dedup.jaccardThresholdSweep(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // one candidate total count across all rows
    assert(out.map(_._2).distinct.length == 1)
    // pair counts monotone nonincreasing in threshold
    val pairs = out.map(_._3)
    assert(pairs.toSeq == pairs.sorted.reverse.toSeq)
    // the exact-duplicate pair (jaccard 1e6) survives even at 90
    assert(out.last._1 == 90L && out.last._3 >= 1L)
  }
}
