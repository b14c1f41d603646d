package graft.llmdata

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The shingle codegen kernel must be BYTE-IDENTICAL to the HOF
  * `split`/`transform`/`concat_ws` spelling it replaced — every
  * minhash-family oracle replays that spelling in DuckDB. */
class WordShinglesSpec extends SparkSpec {
  import spark.implicits._

  /** The replaced spelling, verbatim. */
  private def hofShingles(width: Int) = {
    val parts = (0 until width).map(i => s"element_at(__w, i + $i)").mkString(", ")
    expr(
      s"""CASE WHEN size(__w) >= $width
         | THEN transform(sequence(1, size(__w) - ${width - 1}),
         |                i -> concat_ws(' ', $parts))
         | ELSE array() END""".stripMargin)
  }

  private val adversarial = Seq(
    "a b c d e",
    "exactly three tokens",
    "two tokens",
    "one",
    "",
    "double  space runs  here",      // empty tokens must round-trip
    " leading space",
    "trailing space ",
    "  ",                            // only empty tokens
    "unicode \u00fcml\u00e4ut \u4e2d\u6587 token mix",
    "tab\tis not a separator here",
    "a a a a a a")

  test("kernel == HOF spelling on every adversarial fixture, width 3") {
    val df = adversarial.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .withColumn("__w", split(col("text"), " "))
      .withColumn("hof", hofShingles(3))
      .withColumn("kernel", WordShinglesExpression.shingles(col("text"), 3))
    val bad = df.filter(col("hof") =!= col("kernel")).collect()
    assert(bad.isEmpty, bad.mkString("\n"))
    // and the fixtures actually exercise non-empty output
    assert(df.filter(size(col("kernel")) > 0).count() >= 6)
  }

  test("kernel == HOF spelling for widths 1, 2, 5") {
    for (w <- Seq(1, 2, 5)) {
      val df = adversarial.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
        .withColumn("__w", split(col("text"), " "))
        .withColumn("hof", hofShingles(w))
        .withColumn("kernel", WordShinglesExpression.shingles(col("text"), w))
      val bad = df.filter(col("hof") =!= col("kernel")).collect()
      assert(bad.isEmpty, s"width $w:\n${bad.mkString("\n")}")
    }
  }

  test("shingles are exact substrings (empty tokens re-join losslessly)") {
    val out = Seq((1L, "x  y z"))
      .toDF("id", "text")
      .select(explode(WordShinglesExpression.shingles(col("text"), 3)).as("g"))
      .as[String].collect().toSeq
    // tokens are ["x", "", "y", "z"]: two shingles, double space kept
    assert(out == Seq("x  y", " y z"))
  }

  test("null text keeps the old CASE semantics through Dedup.shingled") {
    val df = Seq((1L, null: String), (2L, "a b c d"))
      .toDF("doc_id", "text")
    val out = Dedup.shingled(df).select("doc_id", "__sh").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq.empty)
    assert(out(2L) == Seq("a b c", "b c d"))
  }

  test("kernel participates in whole-stage codegen (no interpreted lambda)") {
    // spark.range keeps the projection un-foldable (a literal input
    // constant-folds into the LocalTableScan and proves nothing)
    val plan = spark.range(10)
      .select(concat(lit("a b c d"), col("id").cast("string")).as("text"))
      .select(WordShinglesExpression.shingles(col("text"), 3).as("sh"))
      .queryExecution.executedPlan.toString
    // the `*(n)` star prefix IS the whole-stage-codegen marker: the
    // kernel's projection must carry it (an interpreted fallback
    // would print an unstarred Project)
    assert(plan.contains("*(1) Project [wordshinglesexpression"), plan)
  }
}
