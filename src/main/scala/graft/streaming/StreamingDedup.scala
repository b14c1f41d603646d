package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.llmdata.Dedup

/** A document arriving on the ingest stream. */
case class DocEvent(docId: Long, ts: Timestamp, text: String)

/** A document that survived streaming exact dedup: the first arrival
  * of its (normalized) content digest, with the digest attached so a
  * downstream consumer can join back or audit. */
case class KeptDoc(docId: Long, ts: Timestamp, digest: String)

/** Per-digest dedup state: the kept id and how many copies streamed
  * past so far (O(1) per key — one digest of state, never the text). */
case class DedupDigestState(keptId: Long, nCopies: Long)

/** Streaming EXACT dedup — "drop exact repeats at ingest", the first
  * stateful operator a streaming curation path needs (the crawl
  * firehose case; VERDICT r13 §next-5). The streaming counterpart of
  * `Dedup.exactDedup` / `exactDedupNormalized`:
  *
  *  - the content digest (md5 of the raw text, or of the same
  *    regex-free normalization the batch operator uses) is computed as
  *    a codegen'd COLUMN before the stateful stage, so the text itself
  *    never enters the state store — state is one digest key plus two
  *    longs per distinct content;
  *  - the first arrival of a digest emits (Append mode — a kept
  *    document is an immutable fact); every later copy is dropped and
  *    counted in state;
  *  - WITHIN a micro-batch copies collapse to the LOWEST docId, so a
  *    single-batch replay reproduces the batch operator's
  *    min-id-keeps rule exactly (parity-spec'd). ACROSS batches the
  *    keeper is the first arrival — a later batch cannot retract an
  *    already-emitted row; on an id-ordered replay the two rules
  *    agree, which is the parity contract.
  *
  * State lifecycle: each update re-arms an event-time timeout at
  * `watermark + ttlMs`; a digest unseen for the TTL is REMOVED (the
  * same tombstone-reaping trade as `statefulRateSpikes`: a copy
  * arriving after the TTL re-emits — bounded re-emission, in exchange
  * for a state store bounded by the distinct-content rate inside the
  * TTL horizon rather than by lifetime corpus cardinality).
  *
  * 100 TB path: the digest groupByKey is the stream-side analogue of
  * the batch digest groupBy — one exchange on the digest, uniform by
  * construction (md5), so no hot key is possible regardless of how
  * skewed the duplicate distribution is; per-key state is O(1).
  */
object StreamingDedup {

  def statefulExactDedup(docs: Dataset[DocEvent],
                         watermark: String = "10 minutes",
                         ttlMs: Long = 3600000L,
                         normalized: Boolean = true): Dataset[KeptDoc] = {
    import docs.sparkSession.implicits._
    val digest =
      if (normalized) md5(Dedup.normalizedText(col("text")))
      else md5(col("text"))
    docs
      .withColumn("__digest", digest)
      .select(col("docId"), col("ts"), col("__digest").as("digest"))
      .as[(Long, Timestamp, String)]
      .withWatermark("ts", watermark)
      .groupByKey(_._3)
      .flatMapGroupsWithState[DedupDigestState, KeptDoc](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (digest: String, rows: Iterator[(Long, Timestamp, String)],
         state: GroupState[DedupDigestState]) =>
          if (state.hasTimedOut) {
            // digest unseen for the whole TTL: reap (bounded
            // re-emission risk if a copy arrives later — see scaladoc)
            state.remove()
            Iterator.empty
          } else {
            // min docId first: single-batch replay == batch min-id rule
            val batch = rows.toSeq.sortBy(r => (r._1, r._2.getTime))
            val prior = state.getOption
            val keep = prior match {
              case Some(st) =>
                state.update(DedupDigestState(st.keptId,
                  st.nCopies + batch.size))
                None // already emitted in an earlier batch
              case None =>
                val first = batch.head
                state.update(DedupDigestState(first._1, batch.size.toLong))
                Some(KeptDoc(first._1, first._2, digest))
            }
            // TTL from the LATER of watermark and this batch's own max
            // event time — the watermark is 0 until the first batch
            // completes, and a 1970-anchored timeout would reap the
            // digest on the very next trigger
            val maxTs = batch.map(_._2.getTime).max
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs(), maxTs) + ttlMs)
            keep.iterator
          }
      }
  }
}
