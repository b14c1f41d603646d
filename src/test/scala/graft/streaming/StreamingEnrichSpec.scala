package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class StreamingEnrichSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("statefulEma reproduces the batch EMA recursion across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Bar]
    val query = StreamingEnrich.run(input.toDS(), span = 3, "ema_stream")

    // batch 1: seed + one recursion step for ticker A; seed for B
    input.addData(
      Bar("A", ts(0), 10.0, 100.0),
      Bar("A", ts(1), 14.0, 50.0),
      Bar("B", ts(0), 5.0, 10.0))
    query.processAllAvailable()
    // batch 2: state carries across micro-batches
    input.addData(Bar("A", ts(2), 14.0, 70.0))
    query.processAllAvailable()

    val rows = spark.table("ema_stream").as[EnrichedBar].collect()
      .sortBy(r => (r.ticker, r.ts.getTime))
    query.stop()

    // alpha = 0.5: ema = [10, 0.5*14+0.5*10=12, 0.5*14+0.5*12=13]
    val a = rows.filter(_.ticker == "A")
    assert(a.map(_.ema).toSeq == Seq(10.0, 12.0, 13.0))
    // obv: [0, +50 (close up), +50+70 (up again... 14==14 -> sign 0)]
    assert(a.map(_.obv).toSeq == Seq(0.0, 50.0, 50.0))
    assert(a.map(_.barCount).toSeq == Seq(1L, 2L, 3L))
    assert(rows.filter(_.ticker == "B").map(_.ema).toSeq == Seq(5.0))
  }

  test("statefulEma matches the batch EWMA on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val data = (0 until 20).map(i => Bar("T", ts(i), 100.0 + (i * 7 % 5), 10.0))

    val input = MemoryStream[Bar]
    val query = StreamingEnrich.run(input.toDS(), span = 5, "ema_stream2")
    // feed in three uneven micro-batches
    input.addData(data.take(7)); query.processAllAvailable()
    input.addData(data.slice(7, 8)); query.processAllAvailable()
    input.addData(data.drop(8)); query.processAllAvailable()
    val streamed = spark.table("ema_stream2").as[EnrichedBar].collect()
      .sortBy(_.ts.getTime).map(_.ema)
    query.stop()

    // batch recursion, adjust=False
    val alpha = 2.0 / 6.0
    val batch = data.map(_.close).scanLeft(Option.empty[Double]) {
      case (None, x) => Some(x)
      case (Some(prev), x) => Some(alpha * x + (1 - alpha) * prev)
    }.flatten
    assert(streamed.length == 20)
    streamed.zip(batch).foreach { case (s, b) => assert(math.abs(s - b) < 1e-12) }
  }

  test("statefulEma equals the batch EwmaWindowFunction column bit for bit") {
    // The stateful stream and the batch window column implement the
    // SAME pandas adjust=False recursion with the SAME floating-point
    // operation order (alpha*x + (1-alpha)*prev), so parity is exact
    // equality, not tolerance — pinning the stateful semantics the way
    // the hashClassifier test pins the stateless ones (VERDICT r8
    // §next-7). Two tickers, out-of-order arrival within a batch, and
    // uneven micro-batch cuts all land on the same values.
    implicit val sqlCtx = spark.sqlContext
    val span = 5
    val bars = (0 until 24).flatMap { i =>
      Seq(Bar("A", ts(i), 100.0 + (i * 7 % 11) * 0.37, 10.0 + i),
          Bar("B", ts(i), 50.0 - (i * 5 % 7) * 0.21, 5.0))
    }
    val input = MemoryStream[Bar]
    val query = StreamingEnrich.run(input.toDS(), span, "ema_parity")
    // batch 1 arrives out of event-time order inside the micro-batch
    input.addData(bars.take(10).reverse: _*); query.processAllAvailable()
    input.addData(bars.slice(10, 11): _*); query.processAllAvailable()
    input.addData(bars.drop(11): _*); query.processAllAvailable()
    val streamed = spark.table("ema_parity").as[EnrichedBar].collect()
      .map(r => (r.ticker, r.ts.getTime) -> r.ema).toMap
    query.stop()

    val batch = bars.toDF()
      .withColumn("ema_batch", graft.enrich.Ewma.over(
        org.apache.spark.sql.functions.col("close"), span, 1,
        Seq(org.apache.spark.sql.functions.col("ticker")),
        Seq(org.apache.spark.sql.functions.col("ts"))))
      .collect()
      .map(r => (r.getAs[String]("ticker"), r.getAs[Timestamp]("ts").getTime) ->
        r.getAs[Double]("ema_batch")).toMap
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (k, v) =>
      assert(v == batch(k), s"stream/batch EMA diverge at $k")
    }
  }

  test("statefulSessionize matches the batch Sessionize numbering across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    // two users, gaps straddling the 5-minute threshold, ties on ts
    val gapMs = 5L * 60000
    val evs = Seq(
      SessionEvent(1L, ts(0), 100L), SessionEvent(1L, ts(1), 101L),
      SessionEvent(1L, ts(9), 102L),  // 8-min gap -> new session
      SessionEvent(1L, ts(9), 103L),  // tie, same session, eventId order
      SessionEvent(1L, ts(20), 104L), // new session
      SessionEvent(2L, ts(2), 200L),
      SessionEvent(2L, ts(6), 201L),  // 4-min gap -> same session
      SessionEvent(2L, ts(30), 202L)) // new session
    val input = MemoryStream[SessionEvent]
    val query = StreamingEnrich.runSessionize(input.toDS(), gapMs, "sess_stream")
    // out-of-order inside batch 1; state carries into batch 2
    input.addData(evs.take(5).reverse: _*); query.processAllAvailable()
    input.addData(evs.drop(5): _*); query.processAllAvailable()
    val streamed = spark.table("sess_stream").as[SessionizedEvent].collect()
      .map(e => e.eventId -> e.sessionSeq).toMap
    query.stop()

    val batch = graft.enrich.Sessionize.sessionize(
        evs.toDF().withColumn("t_ms",
          org.apache.spark.sql.functions.expr("unix_millis(ts)")),
        keyCol = "userId", timeCol = "t_ms", tieCol = "eventId", gap = gapMs)
      .collect()
      .map(r => r.getAs[Long]("eventId") -> r.getAs[Long]("session_seq")).toMap
    assert(streamed == batch)
    // and the numbering is what the gap rule says
    assert(streamed(100L) == 1L && streamed(101L) == 1L)
    assert(streamed(102L) == 2L && streamed(103L) == 2L)
    assert(streamed(104L) == 3L)
    assert(streamed(200L) == 1L && streamed(201L) == 1L && streamed(202L) == 2L)
  }

  test("statefulSessionStats emits closed sessions on gap and on watermark timeout") {
    implicit val sqlCtx = spark.sqlContext
    val gapMs = 5L * 60000
    val input = MemoryStream[SessionEvent]
    val query = StreamingEnrich.statefulSessionStats(input.toDS(), gapMs, "2 minutes")
      .writeStream.format("memory").queryName("sess_stats")
      .outputMode("append").start()
    // batch 1: user 1 opens a session (2 events, 1 min apart)
    input.addData(SessionEvent(1L, ts(0), 100L), SessionEvent(1L, ts(1), 101L))
    query.processAllAvailable()
    assert(spark.table("sess_stats").count() == 0) // still open
    // batch 2: event 20 min later -> DATA-DRIVEN close of session 1
    input.addData(SessionEvent(1L, ts(21), 102L))
    query.processAllAvailable()
    val afterGap = spark.table("sess_stats").as[ClosedSession].collect()
    assert(afterGap.toSeq == Seq(ClosedSession(1L, 1L, 2L,
      ts(0).getTime, ts(1).getTime, 60000L)))
    // batch 3: a far-future event advances the watermark past
    // last(21min) + gap(5) + delay(2) -> TIMEOUT closes session 2
    input.addData(SessionEvent(2L, ts(60), 200L))
    query.processAllAvailable()
    // one more empty-ish trigger so the timed-out group is invoked
    input.addData(SessionEvent(2L, ts(61), 201L))
    query.processAllAvailable()
    val all = spark.table("sess_stats").as[ClosedSession].collect()
      .sortBy(c => (c.userId, c.sessionSeq))
    assert(all.exists(c => c.userId == 1L && c.sessionSeq == 2L &&
      c.nEvents == 1L && c.tStartMs == ts(21).getTime && c.durationMs == 0L),
      s"session 2 not flushed by timeout: ${all.toSeq}")
    // batch 4: user 1 RETURNS after the watermark close — the
    // tombstone keeps the counter, so this is session 3, not a
    // restart at 1 (and the already-emitted session 2 is not
    // re-closed)
    input.addData(SessionEvent(1L, ts(62), 103L))
    query.processAllAvailable()
    // advance the watermark past 62 + gap(5) + delay(2) so the
    // timeout flushes session 3, then one more trigger to invoke it
    input.addData(SessionEvent(2L, ts(120), 202L))
    query.processAllAvailable()
    input.addData(SessionEvent(2L, ts(121), 203L))
    query.processAllAvailable()
    val done = spark.table("sess_stats").as[ClosedSession].collect()
    query.stop()
    assert(done.exists(c => c.userId == 1L && c.sessionSeq == 3L &&
      c.nEvents == 1L && c.tStartMs == ts(62).getTime),
      s"post-tombstone session did not continue numbering: ${done.toSeq}")
    val keys = done.map(c => (c.userId, c.sessionSeq))
    assert(keys.distinct.length == keys.length,
      s"duplicate (userId, sessionSeq) in append output: ${done.toSeq}")
  }

  test("statefulSessionStats matches batch Sessionize.sessionStats on the same events") {
    // VERDICT r11 §next-6: the rollup's emitted rows — not just the
    // numbering — pinned against the batch aggregate on one fixture.
    // Four users with irregular gaps (some sessions close data-driven,
    // the stragglers only via the event-time timeout); a far-future
    // sentinel user advances the watermark so every non-sentinel
    // session flushes, then the sets must be EQUAL.
    implicit val sqlCtx = spark.sqlContext
    val gapMs = 5L * 60000
    val events = for {
      u <- 1L to 4L
      i <- 0 until 12
      // per-user stride: gaps of u, 2u, ... minutes; every 4th event
      // jumps 7+u minutes (> gap for u >= 1 when 7+u > 5) so sessions
      // split at user-specific points
      m = (0 until i).map(k => if (k % 4 == 3) 7 + u.toInt else 1 + (k % 3)).sum
    } yield SessionEvent(u, ts(m), u * 1000 + i)
    val chrono = events.sortBy(e => (e.ts.getTime, e.userId))

    val input = MemoryStream[SessionEvent]
    val query = StreamingEnrich.statefulSessionStats(input.toDS(), gapMs, "2 minutes")
      .writeStream.format("memory").queryName("sess_parity")
      .outputMode("append").start()
    // feed chronologically in uneven micro-batches (watermark-safe)
    chrono.grouped(7).foreach { chunk =>
      input.addData(chunk); query.processAllAvailable()
    }
    // sentinel advances the watermark far past every lastMs + gap,
    // then one more trigger invokes the timed-out groups
    input.addData(SessionEvent(99L, ts(1000), 999000L)); query.processAllAvailable()
    input.addData(SessionEvent(99L, ts(1001), 999001L)); query.processAllAvailable()
    val streamed = spark.table("sess_parity").as[ClosedSession].collect()
      .filter(_.userId != 99L).toSet
    query.stop()

    val batch = graft.enrich.Sessionize.sessionStats(
        events.toDF("userId", "ts", "eventId")
          .withColumn("tms", $"ts".cast("long") * 1000L),
        "userId", "tms", "eventId", gapMs)
      .select($"userId", $"session_seq", $"n_events", $"t_start", $"t_end", $"duration")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map { case (u, s, n, t0, t1, d) => ClosedSession(u, s, n, t0, t1, d) }
      .toSet
    assert(streamed == batch,
      s"stream/batch divergence: only-stream=${streamed -- batch}, only-batch=${batch -- streamed}")
    assert(batch.size >= 8, s"fixture too weak: ${batch.size} sessions")
  }

  test("statefulFunnel matches batch Funnel.funnelTimes on a time-ordered stream") {
    implicit val sqlCtx = spark.sqlContext
    val stages = ("view", "click", "purchase")
    // per-user strictly increasing times (the documented parity
    // domain); stage orderings vary per user: converted, stalled,
    // out-of-order-stage, stage-free
    val evs = for {
      u <- 1L to 4L
      (ty, i) <- (u match {
        case 1L => Seq("view", "click", "purchase")
        case 2L => Seq("click", "view", "click") // first click too early
        case 3L => Seq("view", "error", "signup")
        case _ => Seq("error", "signup", "error")
      }).zipWithIndex
    } yield FunnelEvent(u, ts((u * 10 + i).toInt), u * 100 + i, ty)
    val chrono = evs.sortBy(e => (e.ts.getTime, e.eventId))

    val input = MemoryStream[FunnelEvent]
    val query = StreamingEnrich.statefulFunnel(input.toDS(), stages)
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("update").start()
    chrono.grouped(5).foreach { chunk =>
      input.addData(chunk); query.processAllAvailable()
    }
    val emitted = spark.table("funnel_stream").as[FunnelProgress].collect()
    query.stop()
    // final state per user = the most-progressed emission
    val streamed = emitted.groupBy(_.userId).map { case (u, rows) =>
      u -> rows.maxBy(r => (r.stagesCompleted, r.t1, r.t2, r.t3))
    }

    val batch = graft.enrich.Funnel.funnelTimes(
        evs.map(e => (e.userId, e.ts.getTime, e.eventType))
          .toDF("userId", "tms", "eventType"),
        "userId", "tms", "eventType", Seq("view", "click", "purchase"))
      .collect()
      .map { r =>
        def t(i: Int) = if (r.isNullAt(i)) Long.MinValue else r.getLong(i)
        r.getLong(0) -> FunnelProgress(r.getLong(0), t(1), t(2), t(3),
          r.getLong(4), r.getBoolean(5))
      }.toMap
    assert(streamed == batch,
      s"stream=$streamed\nbatch=$batch")
    assert(batch(1L).converted && !batch(2L).converted)
    assert(batch(4L).stagesCompleted == 0L)
  }

  test("statefulFunnelWatermarked: late cross-batch stage arrivals reach exact batch parity") {
    // VERDICT r12 next-4: the plain funnel's parity domain is
    // time-ordered streams; this pins the watermarked variant on the
    // ADVERSARIAL arrival order — the middle stage arrives a
    // micro-batch AFTER the final stage, within the watermark.
    implicit val sqlCtx = spark.sqlContext
    val stages = ("view", "click", "purchase")
    val u1 = Seq( // event-time order: view@10, click@20, purchase@30
      FunnelEvent(1L, ts(10), 100L, "view"),
      FunnelEvent(1L, ts(20), 101L, "click"),
      FunnelEvent(1L, ts(30), 102L, "purchase"))
    val u2 = Seq( // click@12 precedes view@14 -> must NOT count; click@22 does
      FunnelEvent(2L, ts(12), 200L, "click"),
      FunnelEvent(2L, ts(14), 201L, "view"),
      FunnelEvent(2L, ts(22), 202L, "click"),
      FunnelEvent(2L, ts(25), 203L, "purchase"))
    val input = MemoryStream[FunnelEvent]
    val query = StreamingEnrich
      .statefulFunnelWatermarked(input.toDS(), stages, "15 minutes")
      .writeStream.format("memory").queryName("funnel_wm")
      .outputMode("update").start()
    // batch 1: purchases BEFORE their middle stages (arrival order)
    input.addData(u1(0), u1(2), u2(1), u2(3)); query.processAllAvailable()
    // batch 2: the late middle stages — event times BELOW batch 1's
    // max but above the watermark (30min - 15min = 15 ... u2's click@12
    // is below wm(15)! use per-test check below), so they must land
    // IN ORDER between the already-arrived stages
    input.addData(u1(1), u2(0), u2(2)); query.processAllAvailable()
    // sentinel advances the watermark far past every event, then one
    // more trigger fires the buffered users' event-time timeouts
    input.addData(FunnelEvent(99L, ts(500), 900L, "view")); query.processAllAvailable()
    input.addData(FunnelEvent(99L, ts(501), 901L, "view")); query.processAllAvailable()
    val emitted = spark.table("funnel_wm").as[FunnelProgress].collect()
    query.stop()
    val streamed = emitted.filter(_.userId != 99L).groupBy(_.userId)
      .map { case (u, rows) =>
        u -> rows.maxBy(r => (r.stagesCompleted, r.t1, r.t2, r.t3))
      }
    // batch truth over the events the stream actually kept: u2's
    // click@12 arrived in batch 2 with ts(12) < watermark ts(15) ->
    // the ENGINE drops it (documented contract); everything else is
    // within the watermark. The batch side gets the same surviving
    // set — and u2's funnel is IDENTICAL either way, because a click
    // before the first view never counts in the batch chain.
    val survived = (u1 ++ u2).filterNot(e => e.userId == 2L && e.eventId == 200L)
    val batch = graft.enrich.Funnel.funnelTimes(
        survived.map(e => (e.userId, e.ts.getTime, e.eventType))
          .toDF("userId", "tms", "eventType"),
        "userId", "tms", "eventType", Seq("view", "click", "purchase"))
      .collect()
      .map { r =>
        def t(i: Int) = if (r.isNullAt(i)) Long.MinValue else r.getLong(i)
        r.getLong(0) -> FunnelProgress(r.getLong(0), t(1), t(2), t(3),
          r.getLong(4), r.getBoolean(5))
      }.toMap
    assert(streamed == batch, s"stream=$streamed\nbatch=$batch")
    // the adversarial case really converted: the late click landed
    // between view and purchase
    assert(batch(1L) == FunnelProgress(1L, ts(10).getTime, ts(20).getTime,
      ts(30).getTime, 3L, converted = true))
    assert(batch(2L).converted && batch(2L).t2 == ts(22).getTime)
    // and the PLAIN funnel on the same arrival order does NOT convert
    // u1 — the divergence the watermarked variant exists to close
    val input2 = MemoryStream[FunnelEvent]
    val plain = StreamingEnrich.statefulFunnel(input2.toDS(), stages)
      .writeStream.format("memory").queryName("funnel_plain_adv")
      .outputMode("update").start()
    input2.addData(u1(0), u1(2)); plain.processAllAvailable()
    input2.addData(u1(1)); plain.processAllAvailable()
    val plainOut = spark.table("funnel_plain_adv").as[FunnelProgress].collect()
    plain.stop()
    assert(!plainOut.filter(_.userId == 1L).maxBy(_.stagesCompleted).converted)
  }

  test("statefulLatestWins matches batch Merge.latestWins after any changelog prefix") {
    implicit val sqlCtx = spark.sqlContext
    val changelog = Seq(
      UpsertEvent(1L, 10.0, 5L, 1L, isDelete = false),
      UpsertEvent(2L, 20.0, 3L, 2L, isDelete = false),
      UpsertEvent(1L, 11.0, 9L, 3L, isDelete = false), // newer -> wins
      UpsertEvent(3L, 30.0, 4L, 4L, isDelete = false),
      UpsertEvent(2L, 0.0, 7L, 5L, isDelete = true), // tombstone k=2
      UpsertEvent(1L, 99.0, 2L, 6L, isDelete = false), // LATE: loses to ord 9
      UpsertEvent(3L, 31.0, 4L, 7L, isDelete = false), // ord tie: higher tie wins
      UpsertEvent(4L, 40.0, 1L, 8L, isDelete = false))

    val input = MemoryStream[UpsertEvent]
    val query = StreamingEnrich.statefulLatestWins(input.toDS())
      .writeStream.format("memory").queryName("latest_wins_stream")
      .outputMode("update").start()
    changelog.grouped(3).foreach { chunk =>
      input.addData(chunk); query.processAllAvailable()
    }
    val emitted = spark.table("latest_wins_stream").as[CurrentRow].collect()
    query.stop()
    // final state per key = the newest (ord, tie) emission
    val finalState = emitted.groupBy(_.key).map { case (k, rows) =>
      k -> rows.maxBy(r => (r.ord, r.tie))
    }

    val base = Seq.empty[(Long, Double)].toDF("key", "value")
    val batch = graft.load.Merge.latestWins(base,
        changelog.toDF(), keyCol = "key", orderCol = "ord",
        isDeleteCol = "isDelete", tieCol = "tie")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // surviving keys agree on the payload; tombstoned keys are emitted
    // as deleted by the stream and dropped by the batch merge
    assert(finalState.filterNot(_._2.deleted)
      .map { case (k, r) => k -> r.value } == batch)
    assert(finalState(2L).deleted && !batch.contains(2L))
    assert(finalState(1L).value == 11.0) // late row lost
    assert(finalState(3L).value == 31.0) // tie broke on tie column
  }

  test("dedupWithinWatermark drops re-delivered events, keeps distinct ones") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Bar]
    val query = StreamingEnrich.dedupWithinWatermark(input.toDF())
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    input.addData(
      Bar("A", ts(0), 10.0, 1.0),
      Bar("A", ts(0), 10.0, 1.0), // duplicate delivery in-batch
      Bar("A", ts(1), 11.0, 2.0))
    query.processAllAvailable()
    input.addData(Bar("A", ts(1), 11.0, 2.0)) // duplicate across batches
    query.processAllAvailable()
    val n = spark.table("dedup_stream").count()
    query.stop()
    assert(n == 2)
  }

  test("batch operators run unchanged on a stream: hashClassifier parity") {
    // the llmdata projections are pure (no windows, no state), so the
    // SAME definition drives readStream -> transform -> writeStream —
    // the unified batch/stream contract the design notes promise
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val streamed = graft.llmdata.TextAnalysis.hashClassifier(
      input.toDF().toDF("doc_id", "text"))
    val query = streamed.writeStream.format("memory")
      .queryName("cls_stream").outputMode("append").start()
    val docs = Seq(
      (0L, "the cat sat on the mat"),
      (1L, "alpha beta gamma delta"))
    input.addData(docs: _*)
    query.processAllAvailable()
    val stream = spark.table("cls_stream").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("score"), r.getAs[Boolean]("keep"))).toMap
    query.stop()
    val batch = graft.llmdata.TextAnalysis.hashClassifier(
      docs.toDF("doc_id", "text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("score"), r.getAs[Boolean]("keep"))).toMap
    assert(stream == batch)
  }

  test("windowedStats aggregates per ticker per tumbling window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Bar]
    val query = StreamingEnrich.windowedStats(input.toDF(), "1 minute", "2 minutes")
      .writeStream.format("memory").queryName("win_stream")
      .outputMode("update").start()
    input.addData(
      Bar("A", ts(0), 10.0, 100.0),
      Bar("A", new Timestamp(ts(0).getTime + 1000), 12.0, 50.0),
      Bar("A", ts(1), 20.0, 10.0))
    query.processAllAvailable()
    val rows = spark.table("win_stream").collect()
    query.stop()
    val w0 = rows.find(_.getAs[Long]("n_bars") == 2L).get
    assert(w0.getAs[Double]("avg_close") == 11.0)
    assert(w0.getAs[Double]("sum_volume") == 150.0)
  }

  test("statefulRateSpikes closes buckets data-driven, flushes on watermark, never re-emits") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val query = StreamingEnrich.statefulRateSpikes(input.toDS(),
        bucketMs = 60000L, window = 7, factor = 3, watermark = "2 minutes")
      .writeStream.format("memory").queryName("spikes")
      .outputMode("append").start()
    // batch 1: buckets 0..6 one event each + four events in bucket 7;
    // everything before the open bucket 7 closes immediately
    val base = (0 to 6).map(m => SessionEvent(1L, ts(m), m.toLong))
    val burst = (0 to 3).map(i => SessionEvent(1L, ts(7), 70L + i))
    input.addData(scala.util.Random.shuffle(base ++ burst): _*)
    query.processAllAvailable()
    val b0 = ts(0).getTime / 60000L // absolute epoch bucket of minute 0
    val early = spark.table("spikes").as[SpikeBucket].collect()
    assert(early.map(_.bucket).sorted.toSeq == (b0 to b0 + 6),
      s"buckets 0..6 should close when 7 opens: ${early.toSeq}")
    // the low-trail edge flags by the integer rule (n*7 > trail*3 with
    // trail 1 or 2); from trail >= 3 a single event is quiet
    assert(early.filter(_.isSpike).map(_.bucket - b0).sorted.toSeq ==
      Seq(1L, 2L), early.toSeq)
    // batch 2: bucket 8 opens -> 7 closes with trail 0..6 = 7: spike
    input.addData(SessionEvent(1L, ts(8), 80L))
    query.processAllAvailable()
    val b7 = spark.table("spikes").as[SpikeBucket].collect()
      .find(_.bucket == b0 + 7L).get
    assert(b7 == SpikeBucket(1L, b0 + 7L, 4L, 7L, true), b7)
    // sentinel advances the watermark far past bucket 8's end, next
    // trigger fires the timeout -> bucket 8 flushes (trail 1..7 = 10)
    input.addData(SessionEvent(9L, ts(500), 900L)); query.processAllAvailable()
    input.addData(SessionEvent(9L, ts(501), 901L)); query.processAllAvailable()
    val b8 = spark.table("spikes").as[SpikeBucket].collect()
      .find(b => b.userId == 1L && b.bucket == b0 + 8L).get
    assert(b8 == SpikeBucket(1L, b0 + 8L, 1L, 10L, false), b8)
    // the tombstoned key returns much later: new buckets emit, the
    // flushed one never re-emits
    input.addData(SessionEvent(1L, ts(600), 990L)); query.processAllAvailable()
    input.addData(SessionEvent(1L, ts(601), 991L)); query.processAllAvailable()
    val all = spark.table("spikes").as[SpikeBucket].collect()
      .filter(_.userId == 1L)
    query.stop()
    val keys = all.map(b => (b.userId, b.bucket))
    assert(keys.distinct.length == keys.length,
      s"duplicate (key, bucket) in append output: ${all.toSeq}")
    assert(all.exists(_.bucket == b0 + 600L),
      s"post-tombstone bucket missing: ${all.toSeq}")
  }

  test("statefulRateSpikes evicts the tombstone after its TTL (ADVICE r13 #2)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    // ttlBuckets = 5 (5 minutes at 1-minute buckets): key 1's
    // tombstone must be REMOVED once the watermark runs 5 buckets past
    // its flush, so the state store does not grow with lifetime key
    // cardinality
    val query = StreamingEnrich.statefulRateSpikes(input.toDS(),
        bucketMs = 60000L, window = 7, factor = 3, watermark = "2 minutes",
        ttlBuckets = 5)
      .writeStream.format("memory").queryName("spikes_ttl")
      .outputMode("append").start()
    def stateRows: Long = {
      val p = query.recentProgress.reverse
        .find(_.stateOperators.nonEmpty)
      p.map(_.stateOperators(0).numRowsTotal).getOrElse(-1L)
    }
    // key 1 is active in bucket 0; the sentinel key 9 keeps the
    // watermark moving on every later batch
    input.addData(SessionEvent(1L, ts(0), 1L), SessionEvent(9L, ts(1), 2L))
    query.processAllAvailable()
    // watermark passes bucket 0's end -> key 1 flushes and tombstones
    input.addData(SessionEvent(9L, ts(10), 3L)); query.processAllAvailable()
    val flushed = spark.table("spikes_ttl").as[SpikeBucket].collect()
      .filter(_.userId == 1L)
    assert(flushed.length == 1, flushed.toSeq)
    assert(stateRows == 2L, s"expected key-1 tombstone + sentinel: $stateRows")
    // watermark runs far past flush + 5 buckets -> second timeout
    // fires -> the tombstone is reaped; only the sentinel holds state
    input.addData(SessionEvent(9L, ts(60), 4L)); query.processAllAvailable()
    input.addData(SessionEvent(9L, ts(61), 5L)); query.processAllAvailable()
    assert(stateRows == 1L,
      s"tombstone should be evicted after TTL, state rows = $stateRows")
    // eviction never re-emits anything for the reaped key
    val after = spark.table("spikes_ttl").as[SpikeBucket].collect()
      .filter(_.userId == 1L)
    query.stop()
    assert(after.toSeq == flushed.toSeq, after.toSeq)
  }

  test("statefulRateSpikes matches batch rateSpikes on a bucket-monotone stream") {
    implicit val sqlCtx = spark.sqlContext
    // three users, irregular activity with bursts and gaps; events
    // arrive bucket-monotone per key but SHUFFLED within buckets and
    // split mid-bucket across micro-batches
    val events = for {
      u <- 1L to 3L
      m <- 0 until 30
      n = if ((m + u) % 9 == 0) 5 else if (m % (2 + u.toInt) == 0) 1 else 0
      i <- 0 until n
    } yield SessionEvent(u, ts(m), u * 10000 + m * 10 + i)
    val chrono = events.sortBy(e => (e.ts.getTime, e.userId, e.eventId))

    val input = MemoryStream[SessionEvent]
    val query = StreamingEnrich.statefulRateSpikes(input.toDS(),
        bucketMs = 60000L, window = 7, factor = 3, watermark = "2 minutes")
      .writeStream.format("memory").queryName("spikes_parity")
      .outputMode("append").start()
    chrono.grouped(11).foreach { chunk =>
      input.addData(chunk); query.processAllAvailable()
    }
    input.addData(SessionEvent(99L, ts(5000), 999000L)); query.processAllAvailable()
    input.addData(SessionEvent(99L, ts(5001), 999001L)); query.processAllAvailable()
    val streamed = spark.table("spikes_parity").as[SpikeBucket].collect()
      .filter(_.userId != 99L).toSet
    query.stop()

    val batch = graft.enrich.TimeSeriesOps.rateSpikes(
        events.toDF("userId", "ts", "eventId")
          .withColumn("tms", $"ts".cast("long") * 1000L),
        "userId", "tms", bucket = 60000L, window = 7, factor = 3)
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map { case (u, b, n, t, s) => SpikeBucket(u, b, n, t, s) }
      .toSet
    assert(streamed == batch,
      s"stream/batch divergence: only-stream=${streamed -- batch}, only-batch=${batch -- streamed}")
    assert(batch.exists(_.isSpike), s"fixture too weak, no spike: $batch")
  }
}
