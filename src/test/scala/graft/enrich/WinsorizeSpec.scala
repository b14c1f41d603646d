package graft.enrich

import graft.SparkSpec

class WinsorizeSpec extends SparkSpec {
  import spark.implicits._

  test("winsorize picks the exact rank-definition bounds and clamp sums") {
    // values 1..200: p1 = ceil(200*1/100) = 2nd smallest = 2,
    // p99 = ceil(200*99/100) = 198th smallest = 198
    val df = (1L to 200L).toDF("v")
    val r = GroupStats.winsorize(df, "v").head()
    assert(r.getAs[Long]("n") == 200L)
    assert(r.getAs[Long]("lo") == 2L)
    assert(r.getAs[Long]("hi") == 198L)
    assert(r.getAs[Long]("n_low") == 1L)   // only value 1 clamps up
    assert(r.getAs[Long]("n_high") == 2L)  // 199, 200 clamp down
    assert(r.getAs[Long]("sum_before") == (1L to 200L).sum)
    val after = (1L to 200L).map(v => math.max(2L, math.min(198L, v))).sum
    assert(r.getAs[Long]("sum_after") == after)
  }

  test("winsorize with heavy outliers moves exactly the tail mass") {
    val vals = Seq.fill(98)(100L) ++ Seq(-1000000L, 1000000L)
    val r = GroupStats.winsorize(vals.toDF("v"), "v").head()
    // p1 = 1st smallest = -1e6 so nothing clamps low; p99 = 99th = 100
    assert(r.getAs[Long]("n_low") == 0L)
    assert(r.getAs[Long]("n_high") == 1L)
    assert(r.getAs[Long]("sum_after") ==
      r.getAs[Long]("sum_before") - 1000000L + 100L)
  }

  test("winsorize is deterministic under repartitioning") {
    val df = (1L to 500L).map(i => i * 7 % 311).toDF("v")
    val a = GroupStats.winsorize(df, "v").head().toSeq
    val b = GroupStats.winsorize(df.repartition(9), "v").head().toSeq
    assert(a == b)
  }
}
