package graft.load

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-wins merge (CDC upsert compaction): apply a changelog of
  * upserts and deletes to a base snapshot and emit the resulting
  * current state — the standard lakehouse MERGE/compaction shape
  * (builder brief; the reference only has JDBC append/replace,
  * `database/db_manager.py`).
  *
  * Scale design: base rows are tagged with a sentinel order older than
  * every update, the union is shuffled ONCE on the key, and a
  * `row_number()` argmax per key picks the newest version; tombstones
  * win like any other row and are then dropped. No driver state, no
  * iterative reconciliation — one exchange + one sorted pass, the same
  * cost envelope as a keyed window feature. Ties on the order column
  * break on `tieCol` so replays are deterministic.
  */
object Merge {

  /** @param base     current snapshot: `keyCol` + payload columns
    * @param updates  changelog carrying the SAME payload columns plus
    *                 `orderCol` (long version/time axis) and
    *                 `isDeleteCol` (boolean tombstone flag)
    * @param tieCol   update column breaking order ties deterministically
    * @return one row per surviving key with the latest payload, in the
    *         base's column layout
    */
  def latestWins(base: DataFrame, updates: DataFrame, keyCol: String,
                 orderCol: String, isDeleteCol: String,
                 tieCol: String): DataFrame = {
    val payload = base.columns.filterNot(_ == keyCol).toSeq
    val b = base.select(
      col(keyCol) +: payload.map(col) :+
        lit(Long.MinValue).as("__ord") :+ lit(Long.MinValue).as("__tie") :+
        lit(false).as("__del"): _*)
    val u = updates.select(
      col(keyCol) +: payload.map(col) :+
        col(orderCol).cast("long").as("__ord") :+
        col(tieCol).cast("long").as("__tie") :+
        col(isDeleteCol).cast("boolean").as("__del"): _*)
    val w = Window.partitionBy(keyCol)
      .orderBy(col("__ord").desc, col("__tie").desc)
    b.unionByName(u)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && !col("__del"))
      .select(col(keyCol) +: payload.map(col): _*)
  }
}
