package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerBlockUpdated}
import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.BlockId

/** Inter-query storage reset for the bench harness (VERDICT r7
  * §wrong-1, hardened per r8 §next-8 + advice #3).
  *
  * Two invariants before the next timed query starts:
  *
  *  - ZERO cached RDD blocks (localCheckpoint blocks register in
  *    `getPersistentRDDs`; they were the r7 contamination vector that
  *    inflated late queries up to 34x). This invariant is HARD — if
  *    blocks survive the bounded wait the bench run fails with a
  *    nonzero exit, so harness contamination can never silently
  *    return as a "regression" in BENCH_r{N}.json.
  *  - ZERO live broadcast blocks. Broadcast pieces are reaped by the
  *    ContextCleaner only after the driver-side references are
  *    garbage-collected, which System.gc() can only request — so this
  *    invariant is polled within the same bounded wait (r8 advice #3)
  *    but degrades to a loud stderr warning instead of a failure: a
  *    lagging GC is scheduler noise, not a harness bug, and failing
  *    on it would make the bench flaky on exactly the machines it
  *    must run unattended on.
  *
  * Broadcast blocks are counted via the public listener-bus surface
  * (`SparkListenerBlockUpdated` carries every block add/remove with
  * its storage level; a level of NONE is a removal) — the block
  * manager's own enumeration APIs are `private[spark]`.
  */
object BenchReset {

  /** Tracks the set of LIVE broadcast blocks from block-update events.
    * Install once, immediately after session creation, so no broadcast
    * predates the listener.
    */
  final class BroadcastTracker extends SparkListener {
    private val live = ConcurrentHashMap.newKeySet[BlockId]()
    override def onBlockUpdated(u: SparkListenerBlockUpdated): Unit = {
      val info = u.blockUpdatedInfo
      if (info.blockId.isBroadcast) {
        if (info.storageLevel.isValid) live.add(info.blockId)
        else live.remove(info.blockId)
      }
    }
    def liveCount: Int = live.size

    /** Distinct broadcast ids with live blocks (for explicit removal). */
    def liveBroadcastIds: Set[Long] = {
      import scala.jdk.CollectionConverters._
      live.asScala.collect {
        case b: org.apache.spark.storage.BroadcastBlockId => b.broadcastId
      }.toSet
    }
  }

  def install(spark: SparkSession): BroadcastTracker = {
    val t = new BroadcastTracker
    spark.sparkContext.addSparkListener(t)
    t
  }

  /** Full storage reset; throws (→ nonzero bench exit) if RDD blocks
    * survive the bounded wait. Call OUTSIDE the timed region.
    */
  def resetOrFail(spark: SparkSession, tracker: BroadcastTracker,
                  timeoutMs: Int = 10000): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    // Drop leftover broadcast blocks EXPLICITLY (synchronous
    // block-manager removal) instead of forcing a GC and waiting for
    // the ContextCleaner: the per-reset System.gc() was the r16
    // sweep's 402 s collector bill (VERDICT r16 §next-2b), and with
    // -XX:+ExplicitGCInvokesConcurrent a gc() nudge is too slow to
    // beat the bounded wait anyway. Idempotent with the
    // ContextCleaner's own later reap of the same ids.
    tracker.liveBroadcastIds.foreach { id =>
      try org.apache.spark.graftbridge.StorageBridge
        .removeBroadcast(spark.sparkContext, id)
      catch { case _: Exception => () } // already reaped is fine
    }
    var waited = 0
    def dirty: Boolean =
      spark.sparkContext.getRDDStorageInfo.nonEmpty || tracker.liveCount > 0
    while (dirty && waited < timeoutMs) {
      // last resort for stragglers registered between the snapshot
      // and the removal loop — the ContextCleaner path still works
      if (waited > 0 && waited % 1000 == 0) System.gc()
      if (waited % 500 == 0)
        tracker.liveBroadcastIds.foreach { id =>
          try org.apache.spark.graftbridge.StorageBridge
            .removeBroadcast(spark.sparkContext, id)
          catch { case _: Exception => () }
        }
      Thread.sleep(100); waited += 100
    }
    check(spark.sparkContext.getRDDStorageInfo.length, tracker.liveCount)
  }

  /** The guard alone, split out so the failure branch is spec-testable
    * without manufacturing a genuinely stuck block manager.
    */
  def check(rddBlocks: Int, broadcastBlocks: Int): Unit = {
    if (rddBlocks > 0)
      throw new IllegalStateException(
        s"bench reset failed: $rddBlocks RDD storage entries survived the bounded " +
          "wait — refusing to time the next query against a contaminated block " +
          "manager (VERDICT r8 §next-8)")
    if (broadcastBlocks > 0)
      System.err.println(
        s"[bench] WARNING: $broadcastBlocks broadcast blocks survived reset " +
          "(ContextCleaner/GC lag) — late-query timings may carry eviction noise")
  }
}
