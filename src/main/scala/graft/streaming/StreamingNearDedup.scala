package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.llmdata.{Dedup, LlmDataParams, MinHashSignatureExpression}

/** Per-band match evidence for one arriving document: the best prior
  * bucket member by signature agreement (None = no gated match in
  * this band), with the agreement as exact micro-Jaccard estimate. */
case class BandMatch(docId: Long, ts: Timestamp, band: Int,
                     refId: Option[Long], estMicro: Long)

/** Per-(band, key) bucket state: the registered members' ids and
  * MinHash signatures as parallel arrays (the PsampState shape),
  * capped at `cap` members. */
case class BandBucketState(ids: Seq[Long], sigs: Seq[Seq[String]])

/** Streaming NEAR-dup at ingest (VERDICT r14 §next-5) — the
  * MinHash-LSH twin of [[StreamingDedup.statefulExactDedup]],
  * completing the at-ingest story for a crawl firehose: batch has
  * `Dedup.incrementalAssign` (attach to the best reference partner or
  * declare new); this is the same decision made ONLINE, with the
  * reference corpus being everything the stream has already kept.
  *
  * Shape: the MinHash signature is a codegen'd COLUMN before the
  * stateful stage (the digest-dedup discipline — text never enters
  * the state store), each document explodes into its `bands` LSH band
  * keys, and the state key is the BAND KEY — the streaming analogue
  * of the batch band-bucket equi-join, so no hot key is possible
  * beyond what the cap already bounds. Per bucket the state is the
  * first-arrival members' (id, signature) pairs, capped at `cap`
  * (the hot-bucket-cap contract: a full bucket keeps MATCHING against
  * its registered members but registers no more — the star-expansion
  * trade, members stay attachable through the representatives that
  * did register). An arriving document either
  *
  *  - matches a PRIOR member (signature agreement ≥ the batch
  *    Jaccard threshold: `agree·1e6 div H ≥ threshold-micro`, exact
  *    integers, ties to the smaller member id) → emits the match and
  *    does NOT register IN THAT BAND, or
  *  - finds no gated match → registers (if the bucket is under cap)
  *    and emits a no-match row.
  *
  * The keeper rule is PER BAND, not per document: band buckets are
  * independent state keys, so a band's match/register decision cannot
  * see the document's outcome in its other bands. A document judged a
  * duplicate at the doc grain (gated match in band A) still registers
  * as a reference member in any band where it found no gated match —
  * later arrivals there may attach to it, so partial-band near-dups
  * can form REFERENCE CHAINS (B→A→keeper) rather than all pointing at
  * the keeper directly, which is where this twin's verdicts diverge
  * from batch `Dedup.incrementalAssign` (whose band join sees all of
  * a doc's bands at once). Exact-copy chains match in EVERY band and
  * never expose the path; `StreamingNearDedupSpec` pins the
  * partial-band case.
  *
  * Within a micro-batch arrivals process in (docId, ts) order, so a
  * single-batch replay is deterministic and earlier ids are reference
  * for later ones (the min-id-keeps rule). Verification is the
  * SIGNATURE-AGREEMENT estimate, not exact shingle Jaccard — state
  * holds H hex strings per member, O(1) per member, where exact sets
  * would put whole documents in the store; the estimate is the same
  * statistic the batch `dedup_minhash_estimate` operator audits
  * against exact Jaccard. A document's per-band rows combine into its
  * verdict with [[StreamingNearDedup.nearDupVerdicts]] (stateless,
  * per micro-batch — e.g. inside foreachBatch).
  *
  * State lifecycle: event-time TTL per bucket, exactly the
  * digest-dedup tombstone trade. 100 TB path: one exchange on the
  * band key per micro-batch; per-bucket work is ≤ cap signature
  * comparisons per arrival; state is ≤ cap·(H+1) small strings per
  * LIVE bucket inside the TTL horizon.
  */
object StreamingNearDedup {

  /** Default per-bucket registration cap (streaming twin of the batch
    * `lshMaxBucket`, sized for a state store rather than a shuffle). */
  val defaultCap = 100

  def statefulNearDedup(docs: Dataset[DocEvent],
                        watermark: String = "10 minutes",
                        ttlMs: Long = 3600000L,
                        cap: Int = defaultCap): Dataset[BandMatch] = {
    import docs.sparkSession.implicits._
    require(cap > 0, s"cap must be positive: $cap")
    val numHashes = LlmDataParams.numHashes
    val thresholdMicro = (LlmDataParams.jaccardThreshold * 1000000).toLong
    docs
      .withColumn("__sh", when(col("text").isNull,
          expr("cast(array() as array<string>)"))
        .otherwise(graft.llmdata.WordShinglesExpression.shingles(
          col("text"), LlmDataParams.shingleWidth)))
      .withColumn("__mh",
        MinHashSignatureExpression.signature(col("__sh"), numHashes))
      .select(col("docId"), col("ts"), col("__mh"),
        explode(expr(Dedup.bandStructsSql)).as("k"))
      .select(col("docId"), col("ts"), col("__mh"),
        col("k.band"), col("k.key"))
      .as[(Long, Timestamp, Seq[String], Int, String)]
      .withWatermark("ts", watermark)
      .groupByKey(r => (r._4, r._5))
      .flatMapGroupsWithState[BandBucketState, BandMatch](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (bk: (Int, String),
         rows: Iterator[(Long, Timestamp, Seq[String], Int, String)],
         state: GroupState[BandBucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
            val sigs = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
            state.getOption.foreach { st =>
              ids ++= st.ids; sigs ++= st.sigs
            }
            // (docId, ts) order: deterministic, min-id-keeps within batch
            val batch = rows.toSeq.sortBy(r => (r._1, r._2.getTime))
            var maxTs = 0L
            val out = batch.map { case (id, t, sig, band, _) =>
              if (t.getTime > maxTs) maxTs = t.getTime
              // best PRIOR member: max agreement, tie to smaller id
              var bestAgree = -1
              var bestId = Long.MaxValue
              var i = 0
              while (i < ids.length) {
                var a = 0
                var h = 0
                while (h < numHashes) {
                  if (sigs(i)(h) == sig(h)) a += 1
                  h += 1
                }
                if (a > bestAgree || (a == bestAgree && ids(i) < bestId)) {
                  bestAgree = a; bestId = ids(i)
                }
                i += 1
              }
              val estMicro =
                if (bestAgree < 0) 0L
                else bestAgree.toLong * 1000000L / numHashes
              if (bestAgree >= 0 && estMicro >= thresholdMicro)
                BandMatch(id, t, band, Some(bestId), estMicro)
              else {
                if (ids.length < cap) { ids += id; sigs += sig }
                BandMatch(id, t, band, None, 0L)
              }
            }
            state.update(BandBucketState(ids.toSeq, sigs.toSeq))
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs(), maxTs) + ttlMs)
            out.iterator
          }
      }
  }

  /** Stateless per-batch combine of [[BandMatch]] rows into per-doc
    * verdicts — the incrementalAssign output shape: best reference
    * across the document's bands (max estimate, ties to the smaller
    * ref id), `is_new` when no band matched. Run it over a
    * micro-batch's emitted rows (foreachBatch) or any collected
    * window of them. Output: (new_id, ref_id, est_micro, is_new).
    */
  def nearDupVerdicts(matches: DataFrame): DataFrame =
    matches
      .groupBy(col("docId").as("new_id"))
      .agg(max(struct(
        coalesce(col("estMicro"), lit(0L)).as("e"),
        (-coalesce(col("refId"), lit(Long.MaxValue))).as("negRef")
      )).as("__best"))
      .withColumn("matched", col("__best.e") > 0L)
      .select(col("new_id"),
        when(col("matched"), -col("__best.negRef")).as("ref_id"),
        when(col("matched"), col("__best.e")).otherwise(lit(0L))
          .as("est_micro"),
        (!col("matched")).as("is_new"))
}
