package graft.llmdata

import graft.SparkSpec

class TripletMiningSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = {
    val rows = (0L until 60L).map { i =>
      val v = (0 until 8).map { d =>
        math.sin(i * 37.0 + d * 11.0) + (if (i % 7 == d % 7) 0.9 else 0.0)
      }
      (i, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("triplets: positive is mutual, negative is a non-mutual neighbor") {
    val k = 4
    val edges = AnnSearch.knnGraph(fixture, k)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mutual = edges.filter { case (a, b) => edges((b, a)) }
    val out = AnnSearch.tripletMining(fixture, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.nonEmpty)
    out.foreach { case (a, p, n, _, _) =>
      assert(a < p, "anchor must be the lower id of the mutual pair")
      assert(mutual((a, p)), s"positive ($a, $p) must be mutual")
      assert(edges((a, n)), s"negative $n must be a's graph neighbor")
      assert(!mutual((a, n)), s"negative ($a, $n) must NOT be mutual")
    }
    // one negative per anchor: for a fixed anchor, the negative is unique
    out.groupBy(_._1).foreach { case (a, ts) =>
      assert(ts.map(_._3).toSet.size == 1, s"anchor $a negatives differ")
    }
  }

  test("every mutual pair with an available negative yields a triplet") {
    val k = 4
    val edges = AnnSearch.knnGraph(fixture, k)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mutual = edges.filter { case (a, b) => a < b && edges((b, a)) }
    val anchorsWithNeg = mutual.map(_._1).filter { a =>
      edges.exists { case (q, n) => q == a && !(edges((n, q))) }
    }
    val got = AnnSearch.tripletMining(fixture, k).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = mutual.filter { case (a, _) => anchorsWithNeg(a) }
    assert(got == expected)
  }

  test("deterministic under repartitioning") {
    val once = AnnSearch.tripletMining(fixture, 4).collect().map(_.toSeq).toSet
    val again = AnnSearch.tripletMining(fixture.repartition(5), 4).collect()
      .map(_.toSeq).toSet
    assert(once == again)
  }
}
