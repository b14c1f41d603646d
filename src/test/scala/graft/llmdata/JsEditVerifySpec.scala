package graft.llmdata

import graft.SparkSpec

/** Semantic pins for the JS-divergence and edit-verify wave (the
  * catalog oracles carry engine parity; these pin the math and the
  * ASCII-projection contract).
  */
class JsEditVerifySpec extends SparkSpec {
  import spark.implicits._

  test("sourceJsDivergence: identical = ~0, disjoint = exactly ln2, bounded") {
    val docs = Seq(
      ("s1", "a b a b"), ("s2", "a b a b"), ("s3", "x y"))
      .toDF("source", "text")
    val out = TextAnalysis.sourceJsDivergence(docs)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(4), r.getLong(5)))
      .toMap
    // identical distributions: each term contributes ca*ln2; the two
    // truncating halves leave <= 2 micro-nats of quantization residue
    assert(out(("s1", "s2"))._1 == 2L)
    assert(out(("s1", "s2"))._2 <= 2L && out(("s1", "s2"))._2 >= 0L)
    // disjoint vocabulary: no shared terms, JSD = ln2 exactly (the
    // pair comes off the broadcast spine, no term rows at all)
    assert(out(("s1", "s3")) == (0L, 693147L))
    assert(out(("s2", "s3")) == (0L, 693147L))
    // bounds: 0 <= JSD <= ln2 for every pair
    out.values.foreach { case (_, j) => assert(j >= 0L && j <= 693147L) }
  }

  test("sourceJsDivergence: asymmetric-size overlap stays strictly between") {
    val docs = Seq(
      ("s1", "a a a a b"), ("s2", "a b b b b"))
      .toDF("source", "text")
    val j = TextAnalysis.sourceJsDivergence(docs).collect().head.getLong(5)
    assert(j > 0L && j < 693147L)
  }

  test("editVerify: exact duplicates score 0 distance, 1e6 similarity") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, base), (2L, base)).toDF("doc_id", "text")
    val out = Dedup.editVerify(docs).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getLong(4) == 0L && r.getLong(5) == 1000000L)
    assert(r.getBoolean(6))
  }

  test("editVerify: one substituted character = distance 1") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    // change ONE character in the last token: shingle sets stay ~90%
    // shared so the pair band-matches; the prefix cap (200) covers the
    // edit site only if it lands inside -- place it inside
    val edited = base.dropRight(1) + "X"
    assert(base.length < 200)
    val docs = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val out = Dedup.editVerify(docs).collect()
    assert(out.length == 1, s"pair not a candidate: ${out.toSeq}")
    assert(out.head.getLong(4) == 1L)
    assert(out.head.getBoolean(6))
  }

  test("editVerify: non-ASCII deletes from the projection (byte==codepoint)") {
    // identical texts containing multibyte chars: candidate by exact
    // signature equality; the projected length EXCLUDES the 3 CJK
    // chars and the edit distance is 0 on the stripped prefix
    val t = "alpha 中文字 beta " + (1 to 20).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val r = Dedup.editVerify(docs).collect().head
    assert(r.getLong(2) == t.length - 3L)
    assert(r.getLong(4) == 0L)
  }
}
