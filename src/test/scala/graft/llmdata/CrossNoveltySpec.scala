package graft.llmdata

import graft.SparkSpec

class CrossNoveltySpec extends SparkSpec {
  import spark.implicits._

  private val ref = Seq(
    (100L, "alpha beta gamma delta epsilon"),
    (101L, "zeta eta theta iota kappa")
  ).toDF("doc_id", "text")

  test("novelty: fully seen = 0, fully new = 1e6, partial in between") {
    val cands = Seq(
      (1L, "alpha beta gamma delta epsilon"),       // every gram in ref
      (2L, "nu xi omicron pi rho sigma"),           // nothing in ref
      (3L, "alpha beta gamma nu xi omicron"),       // 2 of 4 grams seen
      (4L, "xy zz")                                 // too short to shingle
    ).toDF("doc_id", "text")
    val out = Dedup.crossNovelty(cands, ref).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L), "short doc must emit nothing")
    assert(out(1L)._3 == 0L)
    assert(out(2L)._3 == 1000000L)
    val (g3, n3, m3) = out(3L)
    // grams: "alpha beta gamma", "beta gamma nu", "gamma nu xi",
    // "nu xi omicron" — only the first is in ref
    assert(g3 == 4L && n3 == 3L && m3 == 750000L)
  }

  test("novelty against an empty reference is total") {
    val cands = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = Dedup.crossNovelty(cands, empty).head()
    assert(out.getLong(3) == 1000000L)
  }

  test("deterministic under repartitioning") {
    val cands = (0L until 50L).map(i =>
      (i, (0 until 8).map(j => s"w${(i + j) % 11}").mkString(" ")))
      .toDF("doc_id", "text")
    val a = Dedup.crossNovelty(cands, ref).collect().map(_.toSeq).toSet
    val b = Dedup.crossNovelty(cands.repartition(7), ref.repartition(3))
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
