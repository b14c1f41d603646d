package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-visible correctness/bench query: a Spark query over the
  * testdata parquet tables plus (where SQL-expressible) an equivalent
  * DuckDB oracle SQL. Column names and row ordering must match between
  * the two sides; derived floating-point outputs are rounded to 6
  * decimals on BOTH sides so engine-level last-ulp differences (summation
  * order, libm) don't break the driver's hash compare.
  */
case class CatalogEntry(
    name: String,
    query: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryCatalog {
  lazy val entries: Seq[CatalogEntry] =
    graft.enrich.EnrichQueries.entries ++
      graft.clean.CleanQueries.entries ++
      graft.integrate.UnionQueries.entries ++
      graft.integrate.JoinQueries.entries ++
      graft.transform.TransformQueries.entries ++
      graft.integrate.ValidatorQueries.entries ++
      graft.llmdata.LlmDataQueries.entries ++
      graft.ingest.IngestQueries.entries ++
      graft.load.LoadQueries.entries

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    entries.map(e => e.name -> e.query).toMap

  lazy val oracleSql: Map[String, String] =
    entries.flatMap(e => e.oracle.map(e.name -> _)).toMap
}
