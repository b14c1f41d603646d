package graft.llmdata

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HardNegativesSpec extends SparkSpec {
  import spark.implicits._

  test("hardNegatives drops relevant docs and re-ranks the rest densely") {
    val results = Seq(
      // query 1: relevant doc 10 sits at rank 2 — negatives skip it
      (1L, 100L, 1L), (1L, 10L, 2L), (1L, 101L, 3L), (1L, 102L, 4L),
      // query 2: relevant doc at rank 1
      (2L, 20L, 1L), (2L, 200L, 2L), (2L, 201L, 3L)
    ).toDF("query_id", "doc_id", "rank")
    val rel = Seq((1L, 10L), (2L, 20L)).toDF("query_id", "doc_id")
    val out = TextAnalysis.hardNegatives(results, rel, k = 2)
      .orderBy("query_id", "neg_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 1L, 100L, 1L), (1L, 2L, 101L, 3L),
      (2L, 1L, 200L, 2L), (2L, 2L, 201L, 3L)))
  }

  test("hardNegatives keeps everything when nothing is relevant") {
    val results = Seq((1L, 5L, 1L), (1L, 6L, 2L)).toDF("query_id", "doc_id", "rank")
    val rel = Seq((9L, 9L)).toDF("query_id", "doc_id")
    val out = TextAnalysis.hardNegatives(results, rel, k = 5).collect()
    assert(out.length == 2)
  }

  test("calibrationBins: exact per-bin sums, floor bins, discriminative label") {
    val docs = (0L until 200L).map { i =>
      // vary length/vocabulary so quality and classifier score spread
      val words = (0 until (5 + (i % 40)).toInt)
        .map(j => s"w${(i * 7 + j * 3) % 23}")
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    val bins = TextAnalysis.calibrationBins(docs).collect()
    assert(bins.nonEmpty)
    val n = bins.map(_.getAs[Long]("n_docs")).sum
    assert(n == 200L, s"every doc must land in exactly one bin, got $n")
    bins.foreach { r =>
      val nDocs = r.getAs[Long]("n_docs")
      val nPos = r.getAs[Long]("n_pos")
      assert(nPos >= 0L && nPos <= nDocs)
      val pr = r.getAs[Double]("pos_rate")
      assert(pr >= 0.0 && pr <= 1.0)
      assert(math.abs(r.getAs[Double]("gap") -
        math.abs(pr - r.getAs[Double]("confidence"))) < 1e-9)
    }
    // floor-division binning: a doc's bin must satisfy
    // bin * (2*n_feats) <= score < (bin+1) * (2*n_feats) — checked via
    // the aggregate identity mean_weight in [2*bin, 2*(bin+1))
    bins.foreach { r =>
      val b = r.getAs[Long]("bin")
      val mw = r.getAs[Double]("mean_weight")
      assert(mw >= 2.0 * b - 2.0 && mw < 2.0 * (b + 1) + 2.0,
        s"mean weight $mw far outside bin $b")
    }
  }

  test("calibrationBins is deterministic under repartitioning") {
    val docs = (0L until 100L).map { i =>
      (i, (0 until 10).map(j => s"t${(i + j) % 13}").mkString(" "))
    }.toDF("doc_id", "text")
    val a = TextAnalysis.calibrationBins(docs).collect().map(_.toSeq).toSet
    val b = TextAnalysis.calibrationBins(docs.repartition(7)).collect()
      .map(_.toSeq).toSet
    assert(a == b)
  }
}
