package graft.llmdata

import graft.SparkSpec
import graft.enrich.TimeSeriesOps

/** Semantic pins for the silhouette / stickiness wave. */
class Wave6OpsSpec extends SparkSpec {
  import spark.implicits._

  test("kmeansSilhouette: tight separated clusters score near +1") {
    val rows = (0L until 20L).map { i =>
      val sign = if (i % 2 == 0) 1.0 else -1.0
      i -> (0 until 4).map(d => sign * (0.4 + 0.001 * (i + d)))
    }
    val d = rows.toDF("vec_id", "embedding")
    val out = AnnSearch.kmeansSilhouette(d, k = 2, iters = 3, dim = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 2)
    assert(out.map(_._2).sum == 20L)
    out.foreach { case (_, _, sil) =>
      assert(sil > 800000L && sil <= 1000000L, s"silhouette: ${out.toSeq}")
    }
  }

  test("kmeansSilhouette: all-identical vectors guard to 0") {
    val d = (0L until 6L).map(i => i -> Seq.fill(4)(0.3))
      .toDF("vec_id", "embedding")
    val out = AnnSearch.kmeansSilhouette(d, k = 3, iters = 2, dim = 4)
      .collect()
    // one bucket takes everything; a == 0 for every point and b > 0,
    // so silhouette is (b-0)/b = 1e6 -- unless the point IS on both
    // centroids; assert bounds only
    out.foreach { r =>
      val s = r.getLong(2)
      assert(s >= -1000000L && s <= 1000000L)
    }
  }

  test("stickiness: coverage runs count each MAU membership exactly once") {
    val day = 86400000000L
    // u1 active days 0 and 40; u2 active day 0 only; window 30
    val ev = Seq((1L, 0L), (1L, 40L), (2L, 0L))
      .map { case (u, d) => (u, d * day + 1L) }.toDF("user_id", "t_us")
    val out = TimeSeriesOps.stickiness(ev, "user_id", "t_us", window = 30)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    // days 0-29: both users in window; day 40: only u1's new run
    assert(out(0L) == (2L, 2L, 1000000L))
    assert(out(15L) == (0L, 2L, 0L))
    assert(out(29L) == (0L, 2L, 0L))
    assert(out(40L) == (1L, 1L, 1000000L))
    // days 30-39 have zero MAU -> no row; day 41+ past the observed max
    assert(out.keySet == ((0L to 29L).toSet + 40L))
  }

  test("stickiness: continuous presence keeps MAU flat at the user count") {
    val day = 86400000000L
    val ev = (0L until 10L).flatMap(d => Seq((1L, d), (2L, d)))
      .map { case (u, d) => (u, d * day) }.toDF("user_id", "t_us")
    val out = TimeSeriesOps.stickiness(ev, "user_id", "t_us", window = 7)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    (0L until 10L).foreach { d => assert(out(d) == (2L, 2L)) }
  }
}
