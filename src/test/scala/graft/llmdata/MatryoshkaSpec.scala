package graft.llmdata

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MatryoshkaSpec extends SparkSpec {
  import spark.implicits._

  test("zero-tail embeddings: every prefix recalls perfectly") {
    // all information lives in the first 4 dims; tail is zero
    val rows = (0L until 30L).map { i =>
      val head = (0 until 4).map(d => math.cos(i * 31.0 + d * 7.0))
      (i, head ++ Seq.fill(12)(0.0))
    }
    val df = rows.toDF("vec_id", "embedding")
    val out = AnnSearch.matryoshkaRecall(df, col("vec_id") < 5, k = 3,
        dims = Seq(4, 8), dim = 16)
      .collect()
    assert(out.length == 10) // 5 queries x 2 dims
    out.foreach { r =>
      assert(r.getLong(3) == 1000000L,
        s"prefix covers all signal; recall must be perfect: ${r.toSeq}")
    }
  }

  test("informative tails degrade short prefixes, never past [0, 1]") {
    val rows = (0L until 40L).map { i =>
      (i, (0 until 16).map(d => math.sin(i * 13.0 + d * 5.0)))
    }
    val df = rows.toDF("vec_id", "embedding")
    val out = AnnSearch.matryoshkaRecall(df, col("vec_id") < 8, k = 4,
        dims = Seq(2, 8), dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(out.length == 16)
    out.foreach { case (_, _, rec) =>
      assert(rec >= 0L && rec <= 1000000L)
    }
    // the 8-dim prefix must not average WORSE than the 2-dim prefix
    val avg = out.groupBy(_._1).map { case (d, xs) =>
      d -> xs.map(_._3).sum / xs.length
    }
    assert(avg(8L) >= avg(2L), s"recall averages inverted: $avg")
  }

  test("deterministic under repartitioning") {
    val rows = (0L until 25L).map { i =>
      (i, (0 until 16).map(d => math.sin(i * 7.0 + d)))
    }
    val df = rows.toDF("vec_id", "embedding")
    val a = AnnSearch.matryoshkaRecall(df, col("vec_id") < 6, 3,
      Seq(4), 16).collect().map(_.toSeq).toSet
    val b = AnnSearch.matryoshkaRecall(df.repartition(5),
      col("vec_id") < 6, 3, Seq(4), 16).collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
