package graft.llmdata

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated clusters with matching labels: propagation from
  // labeled neighbors must recover the held-out nodes' labels
  private def fixture = {
    val rows = (0L until 40L).map { i =>
      val cluster = (i % 2).toInt
      val base = if (cluster == 0) 1.0 else -1.0
      val v = (0 until 8).map(d => base + 0.01 * math.sin(i * 13.0 + d))
      (i, v, cluster)
    }
    rows.toDF("vec_id", "embedding", "label")
  }

  test("labelPropagation recovers labels in a separable corpus") {
    val out = AnnSearch.labelPropagation(fixture, k = 4).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(0) % 5 == 0, "only held-out nodes may appear")
      assert(r.getInt(1) == r.getInt(2),
        s"separable clusters must propagate correctly at ${r.getLong(0)}")
      assert(r.getBoolean(5))
    }
  }

  test("votes replay as exact micro-quantized cosine sums over the graph") {
    val edges = AnnSearch.knnGraph(fixture, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val labels = fixture.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expected = edges
      .filter { case (q, n, _) => q % 5 == 0 && n % 5 != 0 }
      .groupBy { case (q, n, _) => (q, labels(n)) }
      .map { case ((q, lbl), xs) =>
        (q, lbl) -> xs.map { case (_, _, c) =>
          math.floor(c * 1000000 + 0.5).toLong
        }.sum
      }
    val byNode = expected.groupBy(_._1._1)
    val out = AnnSearch.labelPropagation(fixture, 4).collect()
      .map(r => r.getLong(0) -> (r.getInt(2), r.getLong(3), r.getLong(4))).toMap
    byNode.foreach { case (q, votes) =>
      val best = votes.toSeq.map { case ((_, lbl), v) => (lbl, v) }
        .sortBy { case (lbl, v) => (-v, lbl) }.head
      val (pred, _, voteMicro) = out(q)
      assert(pred == best._1, s"argmax mismatch at $q")
      assert(voteMicro == best._2, s"vote sum mismatch at $q")
    }
    assert(out.keySet == byNode.keySet)
  }

  test("deterministic under repartitioning") {
    val once = AnnSearch.labelPropagation(fixture, 4).collect()
      .map(_.toSeq).toSet
    val again = AnnSearch.labelPropagation(fixture.repartition(7), 4).collect()
      .map(_.toSeq).toSet
    assert(once == again)
  }
}
