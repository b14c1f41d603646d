package graft.llmdata

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Specs for the corpus-governance wave: agreement kappa, source
  * Gini, k-anonymity, snapshot diff.
  */
class GovernanceSpec extends SparkSpec {
  import spark.implicits._

  test("agreementKappa replays the textbook confusion arithmetic") {
    val docs = (0L until 60L).map { i =>
      (i, (0 until (3 + (i % 30)).toInt)
        .map(j => s"w${(i * 5 + j) % 17}").mkString(" "))
    }.toDF("doc_id", "text")
    val r = TextAnalysis.agreementKappa(docs).head()
    val n = r.getAs[Long]("n")
    val (n11, n10, n01, n00) = (r.getAs[Long]("n11"), r.getAs[Long]("n10"),
      r.getAs[Long]("n01"), r.getAs[Long]("n00"))
    assert(n == 60L && n11 + n10 + n01 + n00 == n)
    val po = (n11 + n00).toDouble / n
    val pe = ((n11 + n10).toDouble * (n11 + n01)
      + (n01 + n00).toDouble * (n10 + n00)) / (n.toDouble * n)
    assert(math.abs(r.getAs[Double]("po") - po) < 1e-12)
    assert(math.abs(r.getAs[Double]("pe") - pe) < 1e-12)
    val kappa = if (pe < 1.0) (po - pe) / (1.0 - pe) else 0.0
    assert(math.abs(r.getAs[Double]("kappa") - kappa) < 1e-12)
  }

  test("sourceGini: 0 for equal sources, near 1 for one giant source") {
    val equal = (0L until 40L).map(i => (i, "a b c d e", s"src${i % 4}"))
      .toDF("doc_id", "text", "source")
    val g0 = TextAnalysis.sourceGini(equal).head().getAs[Long]("gini_micro")
    assert(g0 == 0L, s"equal sources must gini 0, got $g0")
    val skewed = ((0L until 4L).map(i => (i, "x", s"small$i")) :+
      (99L, Seq.fill(996)("y").mkString(" "), "giant"))
      .toDF("doc_id", "text", "source")
    val g1 = TextAnalysis.sourceGini(skewed).head().getAs[Long]("gini_micro")
    // 5 sources, 1000 tokens, giant holds 996: G = (wsum - n*S)/(n*S)
    // wsum = 1*1+3*1+5*1+7*1+9*996 = 8980; n*S = 5000 -> 0.796
    assert(g1 == 796000L, s"expected 796000, got $g1")
  }

  test("kAnonymity flags groups under k and counts exactly") {
    val rows = Seq.fill(7)(("en", "srcA")) ++ Seq.fill(2)(("de", "srcB")) ++
      Seq(("fr", "srcC"))
    val out = Curation.kAnonymity(rows.toDF("lang", "source"),
        Seq("lang", "source"), k = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    assert(out(("en", "srcA")) == ((7L, false)))
    assert(out(("de", "srcB")) == ((2L, true)))
    assert(out(("fr", "srcC")) == ((1L, true)))
  }

  test("corpusDiff classifies added/removed/changed and drops unchanged") {
    val v1 = Seq((1L, "same"), (2L, "old"), (3L, "gone")).toDF("doc_id", "text")
    val v2 = Seq((1L, "same"), (2L, "new"), (4L, "fresh")).toDF("doc_id", "text")
    val out = Curation.corpusDiff(v1, v2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("corpusDiff of a corpus against itself is empty") {
    val v = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    assert(Curation.corpusDiff(v, v).isEmpty)
  }

  test("langidConfusion counts cells and exact row shares") {
    val docs = Seq(
      (1L, "the cat and the dog", "en"),   // en markers -> en
      (2L, "the of and to in", "en"),      // en markers -> en
      (3L, "der hund und die katze", "de"),// de markers -> de
      (4L, "qqq www eee", "de")            // no markers -> und
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.langidConfusion(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(("en", "en")) == ((2L, 1000000L)))
    assert(out(("de", "de")) == ((1L, 500000L)))
    assert(out(("de", "und")) == ((1L, 500000L)))
    assert(out.size == 3)
  }
}
