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

  /** SCD type-2 history build: compress a changelog into validity
    * intervals — one row per (key, state run) with
    * `effective_from`/`effective_to`/`is_current` — the standard
    * warehouse dimension-history shape next to [[latestWins]]'s
    * current-state compaction (builder brief; the reference's loader
    * only appends/replaces).
    *
    * Consecutive changes carrying an UNCHANGED payload are collapsed
    * first (null-safe `lag` compare over every payload column), so a
    * source that re-emits the same state never inflates the history;
    * `effective_to` is then the next surviving change's
    * `effective_from` (exclusive bound), null while current.
    *
    * Scale design: one exchange on the key, then two window passes on
    * the SAME (key, ord, tie) sort — the change-compression filter
    * preserves partitioning and order, so the `lead` pass reuses the
    * exchange without a second shuffle or sort. No driver state; ties
    * on the order column break on `tieCol` so replays are
    * deterministic.
    *
    * @param changes changelog: `keyCol`, `orderCol` (long version/time
    *                axis), `tieCol`, payload = every other column
    * @return key, payload..., effective_from, effective_to (null while
    *         current), is_current
    */
  def scd2History(changes: DataFrame, keyCol: String, orderCol: String,
                  tieCol: String): DataFrame = {
    val payload = changes.columns
      .filterNot(c => c == keyCol || c == orderCol || c == tieCol).toSeq
    val w = Window.partitionBy(keyCol)
      .orderBy(col(orderCol).asc, col(tieCol).asc)
    val unchanged = payload
      .map(c => lag(col(c), 1).over(w) <=> col(c))
      .reduce(_ && _)
    changes
      .withColumn("__dup", when(lag(col(orderCol), 1).over(w).isNotNull &&
        unchanged, true).otherwise(false))
      .filter(!col("__dup"))
      .withColumn("effective_from", col(orderCol).cast("long"))
      .withColumn("effective_to", lead(col("effective_from"), 1).over(w))
      .withColumn("is_current", col("effective_to").isNull)
      .select(col(keyCol) +: payload.map(col) :+ col("effective_from") :+
        col("effective_to") :+ col("is_current"): _*)
  }
}
