package graft.llmdata

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DocClustersSpec extends SparkSpec {
  import spark.implicits._

  // two disjoint vocabularies: hashed-TF vectors of same-vocab docs
  // are near-identical, cross-vocab near-orthogonal
  private def corpus = {
    val a = (0L until 15L).map(i =>
      (i, s"apple banana cherry durian apple banana elder${i % 2}"))
    val b = (100L until 115L).map(i =>
      (i, s"zebra yak xerus wombat zebra yak viper${i % 2}"))
    (a ++ b).toDF("doc_id", "text")
  }

  test("docTfVectors emits unit-norm dim-wide vectors") {
    val out = TextAnalysis.docTfVectors(corpus).collect()
    assert(out.length == 30)
    out.foreach { r =>
      val v = r.getSeq[Double](1)
      assert(v.length == LlmDataParams.docTfDim)
      val nrm = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(nrm - 1.0) < 1e-9, s"not unit norm: $nrm")
    }
  }

  test("docClusters groups shared-vocabulary docs together") {
    val out = TextAnalysis.docClusters(corpus).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.size == 30)
    val aClusters = (0L until 15L).map(out).toSet
    val bClusters = (100L until 115L).map(out).toSet
    assert(aClusters.size == 1, s"vocab-A docs split: $aClusters")
    assert(bClusters.size == 1, s"vocab-B docs split: $bClusters")
    assert(aClusters != bClusters, "distinct vocabularies must separate")
  }

  test("docClusters is deterministic under repartitioning") {
    val once = TextAnalysis.docClusters(corpus).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val again = TextAnalysis.docClusters(corpus.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(once == again)
  }

  test("empty-text doc still vectorizes; null text drops") {
    val docs = Seq((1L, "a b"), (2L, ""), (3L, null))
      .toDF("doc_id", "text")
    val ids = TextAnalysis.docTfVectors(docs).collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L), s"got $ids")
  }

  test("clusterDiversity: one-topic source scores zero entropy, mixed source above") {
    // source "mono": all docs share vocab A -> one cluster, H = 0,
    // effective clusters = exp(0) = 1.0 exactly (in micro-units)
    // source "mixed": half vocab A, half vocab B -> two equal
    // clusters, H = ln 2, effective = 2.0
    val rows =
      (0L until 12L).map(i => (i, "apple banana cherry durian apple", "mono")) ++
      (100L until 106L).map(i => (i, "apple banana cherry durian apple", "mixed")) ++
      (200L until 206L).map(i => (i, "zebra yak xerus wombat zebra", "mixed"))
    val docs = rows.toDF("doc_id", "text", "source")
    val out = TextAnalysis.clusterDiversity(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // identical docs ALWAYS share a bucket (same vector, same argmax):
    // one topic, zero entropy, exactly one effective cluster
    assert(out("mono") == ((12L, 1L, 0L, 1000000L)), out.toString)
    // the mixed source must equal the rollup of the ACTUAL assignment
    // (cluster membership itself is the seeded Lloyd's business)
    val assign = TextAnalysis.docClusters(docs).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val mixedCounts = rows.filter(_._3 == "mixed")
      .groupBy(r => assign(r._1)).map(_._2.size.toLong).toSeq
    val nM = mixedCounts.sum
    val hExp = mixedCounts
      .map(c => math.floor(c * math.log(nM.toDouble / c) * 1e6 + 0.5).toLong)
      .sum / nM
    val (n, kCl, h, eff) = out("mixed")
    assert(n == nM && kCl == mixedCounts.size.toLong)
    assert(h == hExp, s"H $h vs $hExp")
    val effExp = math.floor(math.exp(h.toDouble / 1e6) * 1e6 + 0.5).toLong
    assert(eff == effExp, s"effective $eff vs $effExp")
  }
}
