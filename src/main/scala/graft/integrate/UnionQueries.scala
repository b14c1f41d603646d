package graft.integrate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{CatalogEntry, QuerySupport}

/** Driver correctness query for the union engine (U1-U7): two
  * schema-overlapping projections of `orders` whose column names only
  * fuzzily match (Order_ID/prices vs order_id/price; status_code has no
  * >=0.72 partner so it survives as a df2-only column), plus an exact
  * duplicate slice that U7's post-union dedup must remove. The mapping
  * decision is driver-side and deterministic, so the oracle can spell
  * out the resolved union directly.
  */
object UnionQueries {

  private val unionEngine = CatalogEntry(
    "union_engine",
    (s: SparkSession, dir: String) => {
      val orders = QuerySupport.table(s, dir, "orders")
      val df1 = orders.select(
        col("o_orderkey").as("order_id"),
        col("o_totalprice").as("price"),
        col("o_orderstatus").as("status"))
      val part = orders.filter(col("o_orderkey") % 3 === 0).select(
        col("o_orderkey").as("Order_ID"),
        (col("o_totalprice") + 1.0).as("prices"),
        col("o_orderpriority").as("status_code"))
      val dupSlice = orders.filter(col("o_orderkey") % 9 === 0).select(
        col("o_orderkey").as("Order_ID"),
        (col("o_totalprice") + 1.0).as("prices"),
        col("o_orderpriority").as("status_code"))
      val df2 = part.union(dupSlice)
      val (groups, _) = new UnionEngine(ValidatorConfig.balanced).process(Seq(df1, df2))
      require(groups.size == 1, s"expected one union group, got ${groups.size}")
      groups.head.orderBy("order_id", "price")
    },
    Some(
      """WITH d1 AS (
        |  SELECT o_orderkey AS order_id, o_totalprice AS price,
        |         o_orderstatus AS status, CAST(NULL AS VARCHAR) AS status_code
        |  FROM orders
        |), d2 AS (
        |  SELECT o_orderkey AS order_id, o_totalprice + 1.0 AS price,
        |         CAST(NULL AS VARCHAR) AS status, o_orderpriority AS status_code
        |  FROM orders WHERE o_orderkey % 3 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice + 1.0, CAST(NULL AS VARCHAR), o_orderpriority
        |  FROM orders WHERE o_orderkey % 9 = 0
        |)
        |SELECT DISTINCT order_id, price, status, status_code
        |FROM (SELECT * FROM d1 UNION ALL SELECT * FROM d2)
        |ORDER BY order_id, price""".stripMargin))

  val entries: Seq[CatalogEntry] = Seq(unionEngine)
}
