package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.llmdata.Dedup

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("single-batch replay reproduces the batch min-id keep rule exactly") {
    implicit val sqlCtx = spark.sqlContext
    // duplicates under normalization (case/punct/space), arriving in
    // SHUFFLED id order within the one batch
    val docs = Seq(
      DocEvent(5L, ts(0), "Hello, world!"),
      DocEvent(2L, ts(1), "hello world"),
      DocEvent(9L, ts(2), "HELLO   WORLD."),
      DocEvent(3L, ts(0), "something else"),
      DocEvent(7L, ts(1), "a third text"))
    val input = MemoryStream[DocEvent]
    val query = StreamingDedup.statefulExactDedup(input.toDS())
      .writeStream.format("memory").queryName("dedup_one")
      .outputMode("append").start()
    input.addData(scala.util.Random.shuffle(docs): _*)
    query.processAllAvailable()
    val kept = spark.table("dedup_one").as[KeptDoc].collect()
      .map(_.docId).sorted.toSeq
    query.stop()
    val batch = Dedup.exactDedupNormalized(
        docs.map(d => (d.docId, d.text)).toDF("doc_id", "text"))
      .select("keep_id").as[Long].collect().sorted.toSeq
    assert(kept == batch)
    assert(kept == Seq(2L, 3L, 7L)) // min id of the hello-world trio
  }

  test("cross-batch duplicates are dropped; distinct content passes") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DocEvent]
    val query = StreamingDedup.statefulExactDedup(input.toDS(),
        normalized = false)
      .writeStream.format("memory").queryName("dedup_x")
      .outputMode("append").start()
    input.addData(DocEvent(1L, ts(0), "alpha"), DocEvent(2L, ts(0), "beta"))
    query.processAllAvailable()
    // batch 2: one exact repeat (dropped, despite the LOWER id — the
    // emitted row is immutable), one new document
    input.addData(DocEvent(0L, ts(1), "alpha"), DocEvent(3L, ts(1), "gamma"))
    query.processAllAvailable()
    val kept = spark.table("dedup_x").as[KeptDoc].collect()
      .map(_.docId).sorted.toSeq
    query.stop()
    assert(kept == Seq(1L, 2L, 3L))
  }

  test("raw mode distinguishes texts that normalization would collapse") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DocEvent]
    val query = StreamingDedup.statefulExactDedup(input.toDS(),
        normalized = false)
      .writeStream.format("memory").queryName("dedup_raw")
      .outputMode("append").start()
    input.addData(DocEvent(1L, ts(0), "Hello!"), DocEvent(2L, ts(0), "hello"))
    query.processAllAvailable()
    val kept = spark.table("dedup_raw").as[KeptDoc].collect()
    query.stop()
    assert(kept.map(_.docId).sorted.toSeq == Seq(1L, 2L))
  }

  test("TTL eviction bounds state; a post-TTL copy re-emits (documented trade)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DocEvent]
    // 5-minute TTL, 2-minute watermark delay
    val query = StreamingDedup.statefulExactDedup(input.toDS(),
        watermark = "2 minutes", ttlMs = 5L * 60000L)
      .writeStream.format("memory").queryName("dedup_ttl")
      .outputMode("append").start()
    def stateRows: Long = query.recentProgress.reverse
      .find(_.stateOperators.nonEmpty)
      .map(_.stateOperators(0).numRowsTotal).getOrElse(-1L)
    input.addData(DocEvent(1L, ts(0), "evictme"))
    query.processAllAvailable()
    // sentinel advances the watermark past ts(0)+TTL; next triggers
    // fire the timeout and reap the digest
    input.addData(DocEvent(50L, ts(30), "sentinel-a")); query.processAllAvailable()
    input.addData(DocEvent(51L, ts(31), "sentinel-b")); query.processAllAvailable()
    input.addData(DocEvent(52L, ts(32), "sentinel-c")); query.processAllAvailable()
    // "evictme" and "sentinel-a" are reaped (their TTLs passed);
    // recent sentinels still hold state
    assert(stateRows < 4L, s"state should shrink after TTL: $stateRows")
    // a copy arriving after the TTL re-emits: bounded re-emission, the
    // price of a state store that does not grow with corpus lifetime
    input.addData(DocEvent(99L, ts(33), "evictme"))
    query.processAllAvailable()
    val kept = spark.table("dedup_ttl").as[KeptDoc].collect()
      .filter(k => k.docId == 1L || k.docId == 99L)
    query.stop()
    assert(kept.map(_.docId).sorted.toSeq == Seq(1L, 99L),
      s"post-TTL copy should re-emit: ${kept.toSeq}")
  }

  test("checkpoint restart: dedup state survives a stop/start, no re-emission") {
    implicit val sqlCtx = spark.sqlContext
    // the memory sink cannot recover from a checkpoint — a FILE sink
    // exercises the real restart path (state store + offsets + sink
    // log all recover)
    val ckpt = java.nio.file.Files.createTempDirectory("dedup_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("dedup_out").toString
    val input = MemoryStream[DocEvent]
    def start() = StreamingDedup.statefulExactDedup(input.toDS())
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt).option("path", out)
      .outputMode("append").start()
    val q1 = start()
    input.addData(DocEvent(1L, ts(0), "persisted"), DocEvent(2L, ts(0), "other"))
    q1.processAllAvailable()
    q1.stop()
    assert(spark.read.parquet(out).count() == 2)
    // new query, same checkpoint: the digest state store recovers
    val q2 = start()
    input.addData(DocEvent(9L, ts(1), "persisted")) // duplicate across restart
    input.addData(DocEvent(10L, ts(1), "fresh"))
    q2.processAllAvailable()
    q2.stop()
    val kept = spark.read.parquet(out).as[KeptDoc].collect()
      .map(_.docId).toSet
    // the recovered state must suppress the cross-restart duplicate
    // while fresh content still passes
    assert(kept == Set(1L, 2L, 10L),
      s"restart broke dedup state: $kept")
  }

  test("state holds one digest row per DISTINCT content, not per document") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DocEvent]
    val query = StreamingDedup.statefulExactDedup(input.toDS())
      .writeStream.format("memory").queryName("dedup_state")
      .outputMode("append").start()
    // 40 documents, 4 distinct contents
    val docs = (0 until 40).map(i =>
      DocEvent(i.toLong, ts(0), s"content ${i % 4}"))
    input.addData(docs: _*)
    query.processAllAvailable()
    val rows = query.recentProgress.reverse
      .find(_.stateOperators.nonEmpty)
      .map(_.stateOperators(0).numRowsTotal).getOrElse(-1L)
    val kept = spark.table("dedup_state").count()
    query.stop()
    assert(rows == 4L, s"state rows = $rows")
    assert(kept == 4L)
  }
}
