package graft.llmdata

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("qualityScore computes token stats and bounded composite") {
    val d = docs(0L -> "the cat sat on the mat")
    val r = TextAnalysis.qualityScore(d).collect()(0)
    assert(r.getAs[Long]("n_tokens") == 6L)
    assert(r.getAs[Long]("n_distinct") == 5L) // 'the' twice
    assert(math.abs(r.getAs[Double]("stop_ratio") - 2.0 / 6) < 1e-9)
    val q = r.getAs[Double]("quality")
    assert(q > 0 && q <= 1.0)
  }

  test("languageId picks marker-dominant language, und when none") {
    val d = docs(
      0L -> "the house of cards and the dog",
      1L -> "der hund und die katze ist nicht da",
      2L -> "xyzzy plugh qwerty")
    val r = TextAnalysis.languageId(d).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("predicted_lang")).toMap
    assert(r(0L) == "en")
    assert(r(1L) == "de")
    assert(r(2L) == "und")
  }

  test("fingerprint is stable and order-sensitive at the gram level") {
    val d = docs(
      0L -> "abcdefghijklmnopqrstuvwxyz",
      1L -> "abcdefghijklmnopqrstuvwxyz",
      2L -> "zyxwvutsrqponmlkjihgfedcba")
    val r = TextAnalysis.fingerprint(d).collect()
      .map(x => x.getLong(0) -> x.getAs[String]("fingerprint")).toMap
    assert(r(0L) == r(1L))
    assert(r(0L) != r(2L))
    assert(r(0L).length == 32)
  }

  test("tokenFrequency returns global counts ordered desc") {
    val d = docs(0L -> "a b a c a b", 1L -> "b c")
    val r = TextAnalysis.tokenFrequency(d).as[(String, Long)].collect().toSeq
    assert(r == Seq("a" -> 3L, "b" -> 3L, "c" -> 2L))
  }
}
