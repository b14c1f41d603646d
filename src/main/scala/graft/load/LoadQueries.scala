package graft.load

import org.apache.spark.sql.functions._

import graft.{CatalogEntry, QuerySupport}

/** Driver correctness queries for the load/table-maintenance surface.
  * (The JDBC/CSV/report sinks stay spec-verified — the driver's DuckDB
  * oracle can't observe side effects — but the merge compaction is a
  * pure transformation and carries a full oracle.)
  */
object LoadQueries {

  /** CDC merge: events replayed as an account-balance changelog over
    * the customer snapshot — upserts carry the event value, 'error'
    * events are tombstones, latest (epoch-micros, event_id) wins.
    * Customers without events pass through; a key whose newest change
    * is a tombstone is dropped.
    */
  private val mergeLatest = CatalogEntry(
    "merge_latest_wins",
    (s, dir) => {
      val base = QuerySupport.table(s, dir, "customer")
        .select("c_custkey", "c_acctbal")
      val ev = QuerySupport.table(s, dir, "events")
      val updates = ev
        .select(col("user_id").as("c_custkey"),
          col("value").as("c_acctbal"),
          QuerySupport.tsMicros(ev).as("t_us"),
          col("event_id"),
          (col("event_type") === "error").as("is_delete"))
      Merge.latestWins(base, updates, keyCol = "c_custkey",
          orderCol = "t_us", isDeleteCol = "is_delete", tieCol = "event_id")
        .orderBy("c_custkey")
    },
    Some("""WITH b AS (
           |  SELECT c_custkey AS k, c_acctbal,
           |         CAST(-9223372036854775807 AS BIGINT) AS ord,
           |         CAST(-9223372036854775807 AS BIGINT) AS tie,
           |         false AS del
           |  FROM customer),
           |u AS (
           |  SELECT user_id AS k, value AS c_acctbal, epoch_us(ts) AS ord,
           |         event_id AS tie, event_type = 'error' AS del
           |  FROM events),
           |r AS (
           |  SELECT *, row_number() OVER (PARTITION BY k ORDER BY ord DESC, tie DESC) AS rn
           |  FROM (SELECT * FROM b UNION ALL SELECT * FROM u))
           |SELECT k AS c_custkey, c_acctbal FROM r
           |WHERE rn = 1 AND NOT del ORDER BY c_custkey""".stripMargin))

  /** SCD2 dimension history from the event stream: each user's
    * event_type sequence compressed into validity intervals —
    * consecutive repeats collapse, `effective_to` = next change's
    * epoch-micros, the latest state is open-ended. Ties on the
    * timestamp break on event_id in BOTH engines.
    */
  private val mergeScd2 = CatalogEntry(
    "merge_scd2_history",
    (s, dir) => {
      val ev = QuerySupport.table(s, dir, "events")
      Merge.scd2History(
          ev.select(col("user_id"), col("event_type"),
            QuerySupport.tsMicros(ev).as("t_us"), col("event_id")),
          keyCol = "user_id", orderCol = "t_us", tieCol = "event_id")
        .orderBy("user_id", "effective_from", "event_type")
    },
    Some("""WITH c AS (
           |  SELECT user_id AS k, event_type, epoch_us(ts) AS ord, event_id AS tie
           |  FROM events),
           |d AS (
           |  SELECT *, lag(event_type) OVER w AS prev_state, lag(ord) OVER w AS prev_ord
           |  FROM c WINDOW w AS (PARTITION BY k ORDER BY ord, tie)),
           |f AS (
           |  SELECT * FROM d
           |  WHERE prev_ord IS NULL OR prev_state IS DISTINCT FROM event_type),
           |r AS (
           |  SELECT k, event_type, ord AS effective_from,
           |         lead(ord) OVER (PARTITION BY k ORDER BY ord, tie) AS effective_to
           |  FROM f)
           |SELECT k AS user_id, event_type, effective_from, effective_to,
           |       effective_to IS NULL AS is_current
           |FROM r ORDER BY user_id, effective_from, event_type""".stripMargin))

  val entries: Seq[CatalogEntry] = Seq(mergeLatest, mergeScd2)
}
