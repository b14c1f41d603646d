package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries and DuckDB oracles live in [[QueryCatalog]]; each implemented
  * operator from SURVEY.md §2 registers one entry there.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full transform orchestrator (clean -> DSL enrichment -> clean),
    * the reference's own smoke shape ("prices with sma", SURVEY §7.2)
    * run end-to-end over the events table.
    */
  def entry(spark: SparkSession): DataFrame =
    QueryCatalog.queries("transform_pipeline")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryCatalog.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = QueryCatalog.oracleSql
}
