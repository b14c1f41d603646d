package graft.enrich

import graft.SparkSpec

class MadOutliersSpec extends SparkSpec {
  import spark.implicits._

  test("madOutliers finds the planted spikes and nothing else") {
    // group A: tight around 100 with two spikes; group B: clean
    val a = Seq.fill(50)(100L) ++ Seq(98L, 102L, 5000L, -4000L)
    val b = (1L to 40L).map(i => 200L + (i % 5))
    val df = (a.map(("A", _)) ++ b.map(("B", _))).toDF("g", "v")
    val out = GroupStats.madOutliers(df, "g", "v").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (nA, medA, madA, outA) = out("A")
    assert(nA == 54L && medA == 100L)
    // deviations: fifty 0s, 2, 2, 4900, 4100 -> MAD = 0: every nonzero
    // deviation flags; 3*0 = 0 so |d| > 0 flags 4 rows
    assert(madA == 0L && outA == 4L)
    val (nB, medB, madB, outB) = out("B")
    assert(nB == 40L)
    assert(outB == 0L, s"clean group flagged $outB (med=$medB mad=$madB)")
  }

  test("madOutliers median/MAD replay the rank-pick definition") {
    val vals = Seq(1L, 2L, 3L, 4L, 100L)
    val df = vals.map(("g", _)).toDF("g", "v")
    val r = GroupStats.madOutliers(df, "g", "v").head()
    // n=5: median = ceil(5*50/100)=3rd smallest = 3
    assert(r.getLong(2) == 3L)
    // deviations: 2,1,0,1,97 -> sorted 0,1,1,2,97 -> 3rd = 1
    assert(r.getLong(3) == 1L)
    // outliers: |d| > 3 -> only 97
    assert(r.getLong(4) == 1L)
    assert(r.getLong(5) == 200000L) // 1 of 5 in ppm
  }

  test("deterministic under repartitioning") {
    val df = (1L to 300L).map(i => (s"g${i % 3}", i * 13 % 101)).toDF("g", "v")
    val a = GroupStats.madOutliers(df, "g", "v").collect().map(_.toSeq).toSet
    val b = GroupStats.madOutliers(df.repartition(7), "g", "v").collect()
      .map(_.toSeq).toSet
    assert(a == b)
  }
}
