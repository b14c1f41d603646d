package graft.llmdata

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random embeddings: enough structure for the
  // lattice buckets to mix, small enough to brute-force the answer
  private def fixture = {
    val rows = (0L until 60L).map { i =>
      val v = (0 until 8).map { d =>
        math.sin(i * 37.0 + d * 11.0) + (if (i % 7 == d % 7) 0.9 else 0.0)
      }
      (i, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("knnTriangles matches a brute-force count over its own graph") {
    val k = 4
    val edges = AnnSearch.knnGraph(fixture, k)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val adj = und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).toSet }
    val expected = adj.map { case (v, ns) =>
      val t = ns.toSeq.combinations(2)
        .count { case Seq(x, y) => und((math.min(x, y), math.max(x, y))) }
      v -> (ns.size.toLong, t.toLong)
    }
    val got = AnnSearch.knnTriangles(fixture, k).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (v, (deg, t)) =>
      val (gdeg, gt, gcoef) = got(v)
      assert(gdeg == deg, s"degree mismatch at $v")
      assert(gt == t, s"triangle count mismatch at $v: got $gt want $t")
      val want = if (deg >= 2) t * 2 * 1000000L / (deg * (deg - 1)) else 0L
      assert(gcoef == want, s"coefficient mismatch at $v")
    }
    // the fixture must actually contain triangles or this spec is vacuous
    assert(expected.values.map(_._2).sum > 0L, "fixture has no triangles")
  }

  test("globalClustering equals the per-node rollup identities") {
    val k = 4
    val per = AnnSearch.knnTriangles(fixture, k).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = per.length.toLong
    val sd = per.map(_._1).sum
    val st = per.map(_._2).sum
    val sw = per.map(t => t._1 * (t._1 - 1)).sum
    val sc = per.map(_._3).sum
    val g = AnnSearch.globalClustering(fixture, k).collect()(0)
    assert(g.getAs[Long]("n_nodes") === n)
    assert(g.getAs[Long]("n_edges") === sd / 2)
    assert(g.getAs[Long]("n_triangles") === st / 3)
    assert(g.getAs[Long]("n_wedges") === sw / 2)
    assert(g.getAs[Long]("global_clustering_micro") ===
      2L * st * 1000000L / sw)
    assert(g.getAs[Long]("avg_local_clustering_micro") === sc / n)
    assert(g.getAs[Long]("n_triangles") > 0L, "vacuous fixture")
  }

  test("candidateGraphTransitivity: a dup triple closes, a pair adds no wedge") {
    // 3 identical docs -> a triangle (every pair shares all bands);
    // 2 identical docs elsewhere -> one edge, degree-1 nodes, no wedge;
    // distinct docs -> no candidates at all
    val tri = "alpha beta gamma delta epsilon zeta eta theta"
    val pair = "one two three four five six seven eight"
    val docs = Seq(
      (0L, tri), (1L, tri), (2L, tri),
      (10L, pair), (11L, pair),
      (20L, "completely different words nothing shared here at all"),
      (21L, "unrelated tokens that never overlap with anything else"))
      .toDF("doc_id", "text")
    val r = Dedup.candidateGraphTransitivity(docs).collect()(0)
    assert(r.getAs[Long]("n_nodes") === 5L)
    assert(r.getAs[Long]("n_edges") === 4L)
    assert(r.getAs[Long]("n_triangles") === 1L)
    assert(r.getAs[Long]("n_wedges") === 3L)
    assert(r.getAs[Long]("global_clustering_micro") === 1000000L)
  }

  test("candidateGraphTransitivity sampling: 1e6 ppm is the identity, the cut shrinks nodes") {
    val tri = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = (0L until 40L).map(i => (i, tri)).toDF("doc_id", "text")
    val full = Dedup.candidateGraphTransitivity(docs).collect()(0)
    val same = Dedup.candidateGraphTransitivity(docs, samplePpm = 1000000L)
      .collect()(0)
    assert(full.toSeq === same.toSeq)
    val sampled = Dedup.candidateGraphTransitivity(docs,
      samplePpm = 250000L).collect()(0)
    assert(sampled.getAs[Long]("n_nodes") < full.getAs[Long]("n_nodes"))
    // the induced subgraph of a clique is a clique: transitivity holds
    assert(sampled.getAs[Long]("global_clustering_micro") === 1000000L)
  }

  test("knnTriangles is deterministic under repartitioning") {
    val once = AnnSearch.knnTriangles(fixture, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val again = AnnSearch.knnTriangles(fixture.repartition(5), 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(once == again)
  }

  test("clustering coefficient stays inside [0, 1e6]") {
    AnnSearch.knnTriangles(fixture, 4).collect().foreach { r =>
      val c = r.getLong(3)
      assert(c >= 0L && c <= 1000000L, s"coefficient $c out of range")
    }
  }
}
