package graft.llmdata

import graft.SparkSpec

class QualityPercentileSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    // srcA: three distinct quality grades (longer docs score higher
    // via the length term), srcB: two docs with IDENTICAL text — the
    // tie case must share cum_le and pct
    (1L, "aa bb cc dd ee ff gg hh ii jj", "srcA"),
    (2L, "aa bb cc", "srcA"),
    (3L, "aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp qq rr ss tt", "srcA"),
    (10L, "xx yy zz", "srcB"),
    (11L, "xx yy zz", "srcB")
  ).toDF("doc_id", "text", "source")

  test("percentiles are per-source CDF value-ranks with shared ties") {
    val out = TextAnalysis.qualityPercentileBySource(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(out.size == 5)
    // srcA: doc 2 < doc 1 < doc 3 by quality -> cum_le 1, 2, 3 of 3
    assert(out(2L)._3 == 1L && out(2L)._5 == 333333L)
    assert(out(1L)._3 == 2L && out(1L)._5 == 666666L)
    assert(out(3L)._3 == 3L && out(3L)._5 == 1000000L)
    // srcB: identical docs share the tie — both cum_le 2 of 2, pct 1e6
    assert(out(10L)._1 == "srcB" && out(10L)._3 == 2L)
    assert(out(11L)._3 == 2L)
    assert(out(10L)._5 == 1000000L && out(11L)._5 == 1000000L)
    // q_micro agrees with the quality operator's quantization
    val q = TextAnalysis.qualityScore(docs).collect()
      .map(r => r.getLong(0) ->
        math.floor(r.getAs[Double]("quality") * 1000000 + 0.5).toLong).toMap
    out.foreach { case (id, (_, qm, _, _, _)) => assert(qm == q(id)) }
  }

  test("deterministic under repartitioning") {
    val a = TextAnalysis.qualityPercentileBySource(docs).collect()
      .map(_.toSeq).toSet
    val b = TextAnalysis.qualityPercentileBySource(docs.repartition(4))
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
