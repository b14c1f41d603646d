package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A (group, distinct-estimate) row emitted whenever a micro-batch
  * touches the group. */
case class HllEstimate(group: Long, nBucketsSeen: Long, zScaled: Long,
                       estDistinct: Long)

/** Per-group HLL register state: 64 small ints, nothing else. */
case class HllRegisters(m: Seq[Int])

/** A (group, token, running Count-Min estimate) row, emitted for each
  * distinct token a micro-batch carries, AFTER the batch is folded. */
case class CmsEstimate(group: Long, token: String, nCmsEst: Long)

/** A (group, running KMV distinct-estimate) row per touched batch:
  * sketch occupancy, the k-th minimum (0 while under-full), and the
  * estimate (exact count while the sketch is under-full). */
case class KmvEstimate(group: Long, nSketch: Long, kthMin: Long,
                       estDistinct: Long)

/** Per-group KMV state: the bottom-k distinct hashes, ascending. */
case class KmvSketch(h: Seq[Long])

/** Per-group Count-Min cell state: depth x width counters, flattened. */
case class CmsCells(c: Seq[Long])

/** One member of a group's current bottom-k priority sample. */
case class PrioritySampleRow(group: Long, id: String, h: Long, rank: Long)

/** One ranked Misra-Gries candidate for a group (Update-mode re-emit). */
case class HeavyHitterRow(group: Long, token: String, mgCount: Long,
                          rank: Long)

/** Per-group MG summary as parallel arrays (the PsampState shape). */
case class MgState(toks: Seq[String], counts: Seq[Long])

case class HistQuantileRow(group: Long, qPct: Long, nEvents: Long,
                           bucket: Long)

case class HistState(c: Seq[Long])

/** Per-group priority-sample state: the k smallest (hash, id) pairs. */
case class PsampState(hs: Seq[Long], ids: Seq[String])

case class BenfordRow(group: Long, digit: Long, nRows: Long, obsPpm: Long,
                      expPpm: Long, devPpm: Long)

/** Per-group Benford state: the 9 first-digit counters. */
case class BenfordState(c: Seq[Long])

case class SeasonalRow(key: Long, grain: String, bucket: Long, nEvents: Long,
                       sharePpm: Long, isPeak: Boolean)

/** Per-key seasonal grids: 24 hour-of-day + 7 day-of-week counters. */
case class SeasonalState(h: Seq[Long], d: Seq[Long])

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

  private val CmsDepth = graft.llmdata.LlmDataParams.cmsDepth
  private val CmsWidth = graft.llmdata.LlmDataParams.cmsWidth

  /** The batch CMS cell coordinates for one token — the md5 hex
    * arithmetic of `TextAnalysis.cmsAudit` ('cms{j}:'-salted 16-bit
    * decode mod width), replicated on the JVM. */
  private[streaming] def cmsCoords(token: String): Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Int](CmsDepth)
    var j = 0
    while (j < CmsDepth) {
      md.reset()
      val h = md.digest(s"cms$j:$token".getBytes("UTF-8"))
        .take(2).map(b => f"${b & 0xff}%02x").mkString
      val hv = (0 until 4).map(i => Hex.indexOf(h(i)) << ((3 - i) * 4)).sum
      out(j) = hv % CmsWidth
      j += 1
    }
    out
  }

  /** Streaming Count-Min point-frequency tracking — the stateful
    * counterpart of `TextAnalysis.cmsAudit` ("live running count per
    * token, overestimate-bounded, O(1) state per group"): each group
    * keeps the SAME depth x width cell grid the batch sketch builds,
    * incremented as events arrive, and every micro-batch emits the
    * RUNNING estimate (min over the token's cells, Update mode) for
    * each distinct token the batch carried.
    *
    * Parity contract (spec-pinned): increments COMMUTE — unlike
    * Misra-Gries there is no eviction and no order sensitivity — so
    * once a group has absorbed a given arrival multiset its cells
    * EQUAL the batch operator's cell grid regardless of batching,
    * shuffling, or replay order, and the emitted estimate equals the
    * batch `n_cms_est` digit-for-digit (same md5-derived coordinates,
    * integer cells). That is the property that makes CMS the sketch
    * to stream: per-shard/per-day grids also merge by cell-wise sum.
    *
    * State lifecycle: O(1) per group (depth x width longs); event-time
    * TTL reaps idle groups like [[statefulDistinct]].
    */
  def statefulCms(events: Dataset[(Long, String, java.sql.Timestamp)],
                  watermark: String = "10 minutes",
                  ttlMs: Long = 3600000L): Dataset[CmsEstimate] = {
    import events.sparkSession.implicits._
    events
      .toDF("group", "token", "ts")
      .withWatermark("ts", watermark)
      .as[(Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[CmsCells, CmsEstimate](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (group: Long, rows: Iterator[(Long, String, java.sql.Timestamp)],
         state: GroupState[CmsCells]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val cells = state.getOption
              .map(_.c.toArray).getOrElse(new Array[Long](CmsDepth * CmsWidth))
            val seen = scala.collection.mutable.LinkedHashSet.empty[String]
            var maxTs = 0L
            rows.foreach { case (_, tok, ts) =>
              val coords = cmsCoords(tok)
              var j = 0
              while (j < CmsDepth) {
                cells(j * CmsWidth + coords(j)) += 1L
                j += 1
              }
              seen += tok
              if (ts.getTime > maxTs) maxTs = ts.getTime
            }
            state.update(CmsCells(cells.toSeq))
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs(), maxTs) + ttlMs)
            seen.iterator.map { tok =>
              val coords = cmsCoords(tok)
              var est = Long.MaxValue
              var j = 0
              while (j < CmsDepth) {
                est = math.min(est, cells(j * CmsWidth + coords(j)))
                j += 1
              }
              CmsEstimate(group, tok, est)
            }
          }
      }
  }

  /** Streaming fixed-grid histogram QUANTILES — the sixth mergeable
    * sketch twin, closing the summary-statistics gap in the family
    * (HLL counts distinct, CMS counts frequency, priority samples,
    * MG ranks — none answers "what is this group's p99"): per group,
    * the same `nBuckets` clamped bucket-count grid the batch
    * [[graft.enrich.TimeSeriesOps.histogramQuantiles]] builds,
    * incremented as events arrive; every touched micro-batch re-emits
    * the group's current quantile rows (Update mode).
    *
    * Parity contract (spec-pinned, the CMS argument): bucket
    * increments COMMUTE, so once a group has absorbed a given arrival
    * multiset its grid EQUALS the batch operator's counts regardless
    * of batching or order, and the emitted (q_pct, bucket) rows match
    * the batch output digit-for-digit — same IEEE
    * `floor((v − lo)/width)` key, same integer `cum·100 ≥ n·q` cut.
    * Per-shard/per-window grids also merge by cell-wise sum.
    *
    * State: O(nBuckets) longs per live group; event-time TTL like the
    * sketch siblings.
    */
  def statefulHistogramQuantiles(
      events: Dataset[(Long, Double, java.sql.Timestamp)],
      lo: Double, hi: Double, nBuckets: Int,
      qs: Seq[Int] = Seq(50, 90, 99),
      watermark: String = "10 minutes",
      ttlMs: Long = 3600000L): Dataset[HistQuantileRow] = {
    import events.sparkSession.implicits._
    require(nBuckets > 0 && hi > lo, "need hi > lo, nBuckets > 0")
    require(qs.nonEmpty && qs.forall(q => q >= 1 && q <= 100),
      s"quantiles must be in [1, 100]: $qs")
    val width = (hi - lo) / nBuckets
    events
      .toDF("group", "value", "ts")
      .withWatermark("ts", watermark)
      .as[(Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[HistState, HistQuantileRow](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (group: Long, rows: Iterator[(Long, Double, java.sql.Timestamp)],
         state: GroupState[HistState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val cells = state.getOption
              .map(_.c.toArray).getOrElse(new Array[Long](nBuckets))
            var maxTs = 0L
            rows.foreach { case (_, v, ts) =>
              // the batch op's IEEE-identical bucket key, clamped
              val b = math.min(math.max(
                math.floor((v - lo) / width).toLong, 0L),
                nBuckets - 1L).toInt
              cells(b) += 1L
              if (ts.getTime > maxTs) maxTs = ts.getTime
            }
            state.update(HistState(cells.toSeq))
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs(), maxTs) + ttlMs)
            val n = cells.sum
            qs.iterator.map { q =>
              var cum = 0L
              var b = 0
              var hit = -1L
              while (b < nBuckets && hit < 0) {
                cum += cells(b)
                if (cum * 100L >= n * q) hit = b.toLong
                b += 1
              }
              HistQuantileRow(group, q.toLong, n, hit)
            }
          }
      }
  }

  /** Streaming twin of [[graft.clean.Profiler.benfordAudit]] — the
    * seventh mergeable sketch twin: a 9-cell first-digit count grid
    * per group, cell-wise additive, so order and batching are
    * irrelevant and the final emission equals the batch audit
    * digit-for-digit (parity spec-pinned). Digit extraction is the
    * batch op's exact path on the JVM: integer cents via one
    * `math.floor(v·100)`, leading digit from the decimal rendering
    * (no libm log10); expected shares quantize the closed form with
    * the same `Math.log` the batch side's codegen'd `ln` calls.
    *
    * State: 9 longs per live group; event-time TTL like the sketch
    * siblings. Emits all 9 digit rows (zero-count digits included —
    * the batch spine contract) for each touched group per batch.
    */
  def statefulBenford(
      events: Dataset[(Long, Double, java.sql.Timestamp)],
      watermark: String = "10 minutes",
      ttlMs: Long = 3600000L): Dataset[BenfordRow] = {
    import events.sparkSession.implicits._
    val expPpm: Array[Long] = (1 to 9).map(d =>
      math.floor(math.log((d + 1.0) / d) / math.log(10.0) * 1e6 + 0.5).toLong)
      .toArray
    events
      .toDF("group", "value", "ts")
      .withWatermark("ts", watermark)
      .as[(Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[BenfordState, BenfordRow](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (group: Long, rows: Iterator[(Long, Double, java.sql.Timestamp)],
         state: GroupState[BenfordState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val cells = state.getOption
              .map(_.c.toArray).getOrElse(new Array[Long](9))
            var maxTs = 0L
            rows.foreach { case (_, v, ts) =>
              val cents = math.floor(v * 100.0).toLong
              if (cents >= 1L) {
                val digit = cents.toString.charAt(0) - '0'
                cells(digit - 1) += 1L
              }
              if (ts.getTime > maxTs) maxTs = ts.getTime
            }
            state.update(BenfordState(cells.toSeq))
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs(), maxTs) + ttlMs)
            val n = cells.sum
            (1 to 9).iterator.map { d =>
              val obs = if (n > 0) cells(d - 1) * 1000000L / n else 0L
              BenfordRow(group, d.toLong, cells(d - 1), obs, expPpm(d - 1),
                obs - expPpm(d - 1))
            }
          }
      }
  }

  /** Streaming twin of [[graft.enrich.TimeSeriesOps.seasonalProfile]]
    * — the eighth mergeable grid twin: per key a 24-cell hour-of-day
    * and a 7-cell day-of-week counter grid, cell-wise additive, so
    * the final emission equals the batch profile row-for-row
    * regardless of order or batching (parity spec-pinned). Bucket
    * arithmetic is the batch op's exact floor-div + positive-mod
    * path on the JVM (`Math.floorDiv` — the streaming-side spelling
    * of the ADVICE r13 #3 contract); epoch day 0 is Thursday, dow 0
    * = Sunday; peak ties break on the earlier bucket.
    *
    * State: 31 longs per live key; event-time TTL like the sketch
    * siblings. Emits the observed (count > 0) cells of each touched
    * key per batch — the batch op's row set.
    */
  def statefulSeasonalProfile(
      events: Dataset[(Long, Long, java.sql.Timestamp)],
      watermark: String = "10 minutes",
      ttlMs: Long = 3600000L): Dataset[SeasonalRow] = {
    import events.sparkSession.implicits._
    events
      .toDF("key", "t_us", "ts")
      .withWatermark("ts", watermark)
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SeasonalState, SeasonalRow](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[SeasonalState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val h = state.getOption.map(_.h.toArray)
              .getOrElse(new Array[Long](24))
            val d = state.getOption.map(_.d.toArray)
              .getOrElse(new Array[Long](7))
            var maxTs = 0L
            rows.foreach { case (_, tUs, ts) =>
              val hod = (Math.floorDiv(tUs, 3600000000L) % 24 + 24) % 24
              val dow = ((Math.floorDiv(tUs, 86400000000L) + 4) % 7 + 7) % 7
              h(hod.toInt) += 1L
              d(dow.toInt) += 1L
              if (ts.getTime > maxTs) maxTs = ts.getTime
            }
            state.update(SeasonalState(h.toSeq, d.toSeq))
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs(), maxTs) + ttlMs)
            def emit(grain: String, cells: Array[Long]): Iterator[SeasonalRow] = {
              val tot = cells.sum
              val peak = cells.indexOf(cells.max)
              cells.iterator.zipWithIndex
                .filter(_._1 > 0L)
                .map { case (c, b) =>
                  SeasonalRow(key, grain, b.toLong, c, c * 1000000L / tot,
                    b == peak)
                }
            }
            emit("hour", h) ++ emit("dow", d)
          }
      }
  }

  private val KmvK = graft.llmdata.LlmDataParams.kmvK

  /** The 16-bit hash of one value — the md5 decode the batch KMV
    * sketch uses (`TextAnalysis.vocabKmvOverlap`), on the JVM. */
  private[streaming] def kmvHash(value: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(value.getBytes("UTF-8"))
      .take(2).map(b => f"${b & 0xff}%02x").mkString
    (0 until 4).map(i => Hex.indexOf(h(i)).toLong << ((3 - i) * 4)).sum
  }

  /** Streaming KMV (bottom-k minimum values) distinct counting — the
    * third mergeable sketch streamed next to [[statefulDistinct]]
    * (HLL) and [[statefulCms]] (Count-Min): each group keeps its k
    * SMALLEST distinct value hashes, and the running estimate is the
    * standard KMV read-back — `(k-1) * 2^16 / h_k` once the sketch is
    * full, the EXACT distinct-hash count while it is not.
    *
    * Order-independence is structural: the bottom-k of a set union is
    * the bottom-k of the concatenated bottom-k's, so batching,
    * shuffling, and duplication cannot move the converged sketch —
    * and unlike the HLL registers, the KMV sketch also supports
    * cross-group INTERSECTION estimates downstream (the pairwise
    * overlap machinery of `vocabKmvOverlap`), which registers cannot.
    * State: O(k) longs per group; event-time TTL like the siblings.
    */
  def statefulKmv(events: Dataset[(Long, String, java.sql.Timestamp)],
                  watermark: String = "10 minutes",
                  ttlMs: Long = 3600000L,
                  k: Int = KmvK): Dataset[KmvEstimate] = {
    import events.sparkSession.implicits._
    events
      .toDF("group", "value", "ts")
      .withWatermark("ts", watermark)
      .as[(Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[KmvSketch, KmvEstimate](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (group: Long, rows: Iterator[(Long, String, java.sql.Timestamp)],
         state: GroupState[KmvSketch]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sk = scala.collection.mutable.TreeSet.empty[Long]
            state.getOption.foreach(s => sk ++= s.h)
            var maxTs = 0L
            rows.foreach { case (_, v, ts) =>
              val h = kmvHash(v)
              if (sk.size < k) sk += h
              else if (h < sk.max) { sk += h; if (sk.size > k) sk -= sk.max }
              if (ts.getTime > maxTs) maxTs = ts.getTime
            }
            state.update(KmvSketch(sk.toSeq))
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs(), maxTs) + ttlMs)
            val est =
              if (sk.size < k) sk.size.toLong
              else (k - 1).toLong * 65536L / sk.max
            Iterator.single(KmvEstimate(group, sk.size.toLong,
              if (sk.size < k) 0L else sk.max, est))
          }
      }
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

  /** The batch priority-sample's per-id hash
    * (`Sampling.prioritySamplePerGroup`'s
    * `conv(substring(md5('psamp:' || id), 1, 8), 16, 10)`), on the
    * JVM. */
  private[streaming] def psampHash(id: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(("psamp:" + id).getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(h, 16)
  }

  /** Streaming Misra-Gries heavy hitters — the fifth member of the
    * sketch-twin family, closing it: per group, the classic
    * `capacity`-candidate summary (insert; if full, decrement every
    * counter and drop zeros), updated across micro-batches in bounded
    * state. Every touched batch re-emits the group's current top-k
    * candidates ranked by (count desc, token asc) — Update mode, like
    * the priority-sample twin.
    *
    * Contracts (the batch twin is `heavyHittersExact`, whose MG pass
    * feeds an exact recount — a luxury a stream cannot have):
    *  - NO-EVICTION PARITY: while a group's distinct tokens stay
    *    under `capacity`, MG never decrements, so candidate counts
    *    are EXACT and batch/stream outputs are row-identical
    *    regardless of batching (spec-pinned).
    *  - under eviction, the MG guarantee holds per group: any token
    *    with true count > N/capacity is IN the candidate set, and
    *    each reported count undercounts by at most N/capacity — but
    *    counts become arrival-ORDER-dependent, so only the guarantee
    *    (not the digits) is the cross-run contract. Within a batch
    *    rows process in (ts, token) order for replay determinism.
    *
    * State: ≤ capacity (token, count) pairs per live group; the same
    * event-time TTL as the sketch siblings.
    */
  def statefulHeavyHitters(
      events: Dataset[(Long, String, java.sql.Timestamp)],
      watermark: String = "10 minutes", ttlMs: Long = 3600000L,
      capacity: Int = 64, k: Int = 10): Dataset[HeavyHitterRow] = {
    import events.sparkSession.implicits._
    require(capacity > k && k > 0, s"need capacity > k > 0: $capacity, $k")
    events
      .toDF("group", "token", "ts")
      .withWatermark("ts", watermark)
      .as[(Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[MgState, HeavyHitterRow](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (group: Long, rows: Iterator[(Long, String, java.sql.Timestamp)],
         state: GroupState[MgState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val m = scala.collection.mutable.HashMap.empty[String, Long]
            state.getOption.foreach(s => m ++= s.toks.zip(s.counts))
            var maxTs = 0L
            val batch = rows.toSeq.sortBy(r => (r._3.getTime, r._2))
            batch.foreach { case (_, tok, ts) =>
              m.get(tok) match {
                case Some(v) => m(tok) = v + 1
                case None if m.size < capacity => m(tok) = 1L
                case None =>
                  val dead = List.newBuilder[String]
                  for ((key, v) <- m)
                    if (v == 1L) dead += key else m(key) = v - 1
                  dead.result().foreach(m.remove)
              }
              if (ts.getTime > maxTs) maxTs = ts.getTime
            }
            val pairs = m.toSeq
            state.update(MgState(pairs.map(_._1), pairs.map(_._2)))
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs(), maxTs) + ttlMs)
            pairs.sortBy { case (t, c) => (-c, t) }.take(k)
              .iterator.zipWithIndex.map { case ((t, c), i) =>
                HeavyHitterRow(group, t, c, i + 1L)
              }
          }
      }
  }

  /** Streaming bottom-k PRIORITY sample — the fourth mergeable sketch
    * in this family, and the one that answers "keep a uniform random
    * k of every group's DISTINCT members over an unbounded stream in
    * bounded memory". Each group retains the k smallest (id-digest,
    * id) pairs; because the bottom-k of a union is the bottom-k of
    * concatenated bottom-k's, arrival order, batching, restarts, and
    * duplicates cannot move the converged sample — so the emitted
    * rows are pinned ROW-IDENTICAL to the batch
    * `Sampling.prioritySamplePerGroup` over the same distinct
    * multiset (the spec's contract). That contract assumes the batch
    * query hashes and orders the SAME STRING RENDERING of the member
    * id that this signature's `value: String` carries: the state key
    * here breaks 32-bit-digest ties lexicographically, while the
    * batch path tie-breaks in the id column's native type — with
    * NUMERIC batch ids the two orders diverge exactly on digest
    * collisions, which are expected once a group holds ≳65k distinct
    * members (birthday bound on 32 bits). Callers wanting parity on
    * numeric ids must cast them to the same string form on the batch
    * side (r14 advice #3). Every touched micro-batch
    * re-emits the group's current ranked sample (Update mode; k is
    * small by construction). State: O(k) per group, event-time TTL
    * like the sketch siblings.
    */
  def statefulPrioritySample(
      events: Dataset[(Long, String, java.sql.Timestamp)],
      watermark: String = "10 minutes", ttlMs: Long = 3600000L,
      k: Int = 20): Dataset[PrioritySampleRow] = {
    import events.sparkSession.implicits._
    events
      .toDF("group", "value", "ts")
      .withWatermark("ts", watermark)
      .as[(Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[PsampState, PrioritySampleRow](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (group: Long, rows: Iterator[(Long, String, java.sql.Timestamp)],
         state: GroupState[PsampState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val set = scala.collection.mutable.TreeSet.empty[(Long, String)]
            state.getOption.foreach(s => set ++= s.hs.zip(s.ids))
            var maxTs = 0L
            rows.foreach { case (_, v, ts) =>
              set += ((psampHash(v), v))
              while (set.size > k) set -= set.max
              if (ts.getTime > maxTs) maxTs = ts.getTime
            }
            val pairs = set.toSeq
            state.update(PsampState(pairs.map(_._1), pairs.map(_._2)))
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs(), maxTs) + ttlMs)
            pairs.iterator.zipWithIndex.map { case ((h, id), i) =>
              PrioritySampleRow(group, id, h, i + 1L)
            }
          }
      }
  }
}
