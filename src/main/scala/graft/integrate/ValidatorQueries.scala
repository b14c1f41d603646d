package graft.integrate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{CatalogEntry, QuerySupport}

/** Driver correctness queries for the validator orchestrator (SURVEY
  * §3.1 validation stage + J10).
  *
  * `validator_pipeline` drives the union path end-to-end: three orders
  * partitions with fuzzily-renamed schemas union into ONE group (early
  * termination), so the expected output is exactly the reassembled
  * orders projection — SQL-expressible. The join path's greedy
  * assignment is procedural (no oracle; covered by ValidatorSpec).
  *
  * `validator_version_split` drives J10 over a frame with `_x`/`_y`
  * column pairs; both versions are pure projections, stacked with a
  * version label.
  */
object ValidatorQueries {

  private def ordersPart(s: SparkSession, dir: String, m: Long,
                         names: (String, String, String)): DataFrame =
    QuerySupport.table(s, dir, "orders")
      .filter(col("o_orderkey") % 3 === m)
      .select(col("o_orderkey").as(names._1), col("o_custkey").as(names._2),
        col("o_totalprice").as(names._3))

  private val validatorPipeline = CatalogEntry(
    "validator_pipeline",
    (s, dir) => {
      val f1 = ordersPart(s, dir, 0L, ("okey", "ckey", "total"))
      val f2 = ordersPart(s, dir, 1L, ("okey", "ckey", "total"))
      // fuzzy schema: plural names map back via the hybrid scorer
      val f3 = ordersPart(s, dir, 2L, ("okeys", "ckeys", "totals"))
      val validator = new Validator(ValidatorConfig.balanced)
      val (outputs, report) = validator.process(Seq(f1, f2, f3))
      assert(report.earlyTermination && outputs.size == 1)
      outputs.head.orderBy("okey")
    },
    Some("""SELECT o_orderkey AS okey, o_custkey AS ckey, o_totalprice AS total
           |FROM orders ORDER BY okey""".stripMargin))

  private val validatorVersionSplit = CatalogEntry(
    "validator_version_split",
    (s, dir) => {
      val joined = QuerySupport.table(s, dir, "orders")
        .select(col("o_orderkey").as("okey"),
          col("o_totalprice").as("total_x"), col("o_custkey").cast("double").as("score_x"),
          (col("o_totalprice") * 2).as("total_y"), (col("o_custkey") + 1).cast("double").as("score_y"))
      val versions = new Validator().createVersions(Seq(joined))
      assert(versions.size == 2)
      val tagged = versions.zipWithIndex.map { case (v, i) =>
        v.select(lit(i + 1).as("version"), col("okey"), col("total"), col("score"))
      }
      tagged.reduce(_ union _).orderBy("version", "okey")
    },
    Some("""SELECT 1 AS version, o_orderkey AS okey, o_totalprice AS total,
           |       CAST(o_custkey AS DOUBLE) AS score FROM orders
           |UNION ALL
           |SELECT 2, o_orderkey, o_totalprice * 2, CAST(o_custkey + 1 AS DOUBLE) FROM orders
           |ORDER BY version, okey""".stripMargin))

  val entries: Seq[CatalogEntry] = Seq(validatorPipeline, validatorVersionSplit)
}
