package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A (group, distinct-estimate) row emitted whenever a micro-batch
  * touches the group. */
case class HllEstimate(group: Long, nBucketsSeen: Long, zScaled: Long,
                       estDistinct: Long)

/** Per-group HLL register state: 64 small ints, nothing else. */
case class HllRegisters(m: Seq[Int])

/** Streaming HLL distinct counting — the stateful counterpart of
  * `TextAnalysis.hllDistinctByGroup` ("live DAU per day"): each group
  * (e.g. day bucket) keeps the SAME 64 integer max-registers the
  * batch sketch derives from `md5(value)`, folded incrementally as
  * events arrive, with the current estimate re-emitted every
  * micro-batch that touches the group (Update mode).
  *
  * Parity contract (spec-pinned): the register derivation replicates
  * the batch operator's md5 hex arithmetic BIT-FOR-BIT (JVM
  * MessageDigest md5 == Spark/DuckDB md5), so once a group has seen
  * the same value multiset the streaming estimate EQUALS the batch
  * `est_distinct` — registers are max-combined, so arrival order,
  * batching, and duplication cannot move them.
  *
  * State lifecycle: O(1) per group (64 ints); an event-time timeout
  * `ttlMs` past the watermark reaps groups no longer receiving
  * events (a day bucket more than the TTL behind the watermark is
  * closed — its last emitted row was its final estimate).
  */
object StreamingSketch {

  private val M = 64
  private val Cap = 30
  private val Hex = "0123456789abcdef"

  /** The batch sketch's (bucket, rho) for one value — the md5 hex
    * arithmetic of `TextAnalysis.hllSketchRows`, replicated on the
    * JVM. */
  private[streaming] def bucketRho(value: String): (Int, Int) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(value.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    val hv = (0 until 4).map(i => Hex.indexOf(h(i)) << ((3 - i) * 4)).sum
    val tail = h.substring(4, 32)
    val stripped = tail.dropWhile(_ == '0')
    val rho =
      if (stripped.isEmpty) Cap
      else {
        val d = Hex.indexOf(stripped.head)
        val nz = if (d >= 8) 0 else if (d >= 4) 1 else if (d >= 2) 2 else 3
        math.min(Cap, (tail.length - stripped.length) * 4 + nz + 1)
      }
    (hv % M, rho)
  }

  /** The batch estimate from a register array — same integer formula
    * as the SQL (`1890844672 * 2^30 div (650790 * z)`). */
  private[streaming] def estimate(regs: Array[Int]): HllEstimate = {
    val seen = regs.count(_ > 0)
    val zp = regs.filter(_ > 0).map(r => 1L << (Cap - r)).sum
    val z = zp + (M - seen).toLong * (1L << Cap)
    HllEstimate(0L, seen.toLong, z, (1890844672L * (1L << Cap)) / (650790L * z))
  }

  /** @param events (group, value, eventTime-ms) triples — e.g.
    *               (day bucket, user id, timestamp). */
  def statefulDistinct(events: Dataset[(Long, String, java.sql.Timestamp)],
                       watermark: String = "10 minutes",
                       ttlMs: Long = 3600000L): Dataset[HllEstimate] = {
    import events.sparkSession.implicits._
    events
      .toDF("group", "value", "ts")
      .withWatermark("ts", watermark)
      .as[(Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[HllRegisters, HllEstimate](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (group: Long, rows: Iterator[(Long, String, java.sql.Timestamp)],
         state: GroupState[HllRegisters]) =>
          if (state.hasTimedOut) {
            // the group's bucket is TTL past the watermark: closed;
            // its last Update row was the final estimate
            state.remove()
            Iterator.empty
          } else {
            val regs = state.getOption
              .map(_.m.toArray).getOrElse(new Array[Int](M))
            var maxTs = 0L
            rows.foreach { case (_, v, ts) =>
              val (b, r) = bucketRho(v)
              if (r > regs(b)) regs(b) = r
              if (ts.getTime > maxTs) maxTs = ts.getTime
            }
            state.update(HllRegisters(regs.toSeq))
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs(), maxTs) + ttlMs)
            Iterator.single(estimate(regs).copy(group = group))
          }
      }
  }
}
