package graft.llmdata

import graft.SparkSpec

class NeymanSpec extends SparkSpec {
  import spark.implicits._

  // stratum A: high variance; B: low variance, same size; C: singleton
  private def fixture = {
    val a = (0L until 40L).map(i => (i, "A", if (i % 2 == 0) 10L else 1000L))
    val b = (100L until 140L).map(i => (i, "B", 500L + (i % 3)))
    val c = Seq((200L, "C", 50L))
    (a ++ b ++ c).toDF("id", "st", "v")
  }

  test("allocation follows n_h * s_h and sums exactly to totalK") {
    val out = Sampling.sampleNeyman(fixture, "st", "id", "v", totalK = 20)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    val kByStratum = out.map(x => x._1 -> x._2).toMap
    // singleton stratum: zero variance signal, zero budget
    assert(!kByStratum.contains("C") || kByStratum("C") == 0L)
    // high-variance A gets (much) more than same-sized low-variance B
    // (B's tiny s_h can legitimately round it to zero rows — absent)
    assert(kByStratum("A") > kByStratum.getOrElse("B", 0L),
      s"A=${kByStratum.get("A")} B=${kByStratum.get("B")}")
    // the drawn rows per stratum equal the allocation, total = totalK
    val drawn = out.groupBy(_._1).map { case (s, xs) => s -> xs.length }
    drawn.foreach { case (s, n) => assert(n.toLong == kByStratum(s)) }
    assert(out.length == 20)
    // ranks within each stratum are 1..k_h
    out.groupBy(_._1).foreach { case (_, xs) =>
      assert(xs.map(_._4).sorted.toSeq == (1L to xs.length).toSeq)
    }
  }

  test("deterministic under repartitioning") {
    val a = Sampling.sampleNeyman(fixture, "st", "id", "v", 15)
      .collect().map(_.toSeq).toSet
    val b = Sampling.sampleNeyman(fixture.repartition(7), "st", "id", "v", 15)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("equal-variance equal-size strata split the budget evenly") {
    val df = (0L until 60L).map(i =>
      (i, s"s${i % 3}", (i / 3) % 10)).toDF("id", "st", "v")
    val ks = Sampling.sampleNeyman(df, "st", "id", "v", 30)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ks.values.toSet == Set(10L), ks.toString)
  }
}
