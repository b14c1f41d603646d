package graft.llmdata

import org.apache.spark.sql.DataFrame

/** Size-gated persist for MULTIPLE-OF-CORPUS frames — exploded token,
  * shingle, and gram streams, whose cached footprint is LARGER than
  * the raw corpus they derive from (a 3-shingle explode is ~3× the
  * text bytes before cache overhead).
  *
  * The trade this encodes (VERDICT r14 §wrong-2): below the gate,
  * sharing one persisted tokenize/shingle pass across a multi-consumer
  * plan measurably wins (span removal at zipf1: 9.0 s unpersisted vs
  * 5.5 s persisted); at 100 TB, a default MEMORY_AND_DISK persist of a
  * multiple-of-corpus frame is a spill/eviction storm that RECOMPUTE —
  * one extra columnar scan plus a codegen'd split/explode — beats.
  * So: persist while the corpus is small enough that the cached frame
  * plausibly fits cluster memory; above the bound, return the frame
  * unpersisted and let each consumer rescan.
  *
  * The gate reads the INPUT corpus frame's optimizer estimate, not the
  * derived frame's: parquet scans carry real statistics, while an
  * explode's estimate is a multiplier heuristic (and a stats-less
  * LogicalRDD reports a huge sentinel, which here fails SAFE — no
  * persist — matching the 100 TB default rather than the toy one).
  *
  * Callers keep their existing `.unpersist()` releases — a no-op on
  * the recompute path. Bounded frames (band keys per doc, k-rows per
  * source, vocabulary-restricted postings, |partitions| partials) are
  * NOT this class and persist unconditionally.
  */
object PersistPolicy {

  /** Session override for the gate: set
    * `spark.graft.corpusPersistMaxBytes` (e.g. to `0` to force the
    * recompute path everywhere, or higher on a storage-rich cluster).
    * Defaults to [[LlmDataParams.corpusPersistMaxBytes]].
    */
  val confKey = "spark.graft.corpusPersistMaxBytes"

  /** Persist `frame` iff `input`'s estimated size is under the gate. */
  def persistGated(frame: DataFrame, input: DataFrame): DataFrame = {
    val maxBytes = input.sparkSession.conf
      .getOption(confKey).map(_.toLong)
      .getOrElse(LlmDataParams.corpusPersistMaxBytes)
    if (input.queryExecution.optimizedPlan.stats.sizeInBytes
          < BigInt(maxBytes)) frame.persist()
    else frame
  }
}
