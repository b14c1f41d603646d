package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.llmdata.TextAnalysis

class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("streaming registers converge to the batch sketch exactly, any batching") {
    implicit val sqlCtx = spark.sqlContext
    // two day-groups, duplicated users, arrival shuffled and split
    // across three micro-batches
    val events = (0 until 300).map { i =>
      (if (i % 3 == 0) 1L else 2L, s"u${i % 45}", ts(i % 10))
    }
    val input = MemoryStream[(Long, String, Timestamp)]
    val query = StreamingSketch.statefulDistinct(input.toDS())
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("update").start()
    val shuffled = new scala.util.Random(9).shuffle(events)
    shuffled.grouped(110).foreach { chunk =>
      input.addData(chunk); query.processAllAvailable()
    }
    // last Update row per group = the converged estimate
    val streamed = spark.table("hll_stream").as[HllEstimate].collect()
      .zipWithIndex.groupBy(_._1.group)
      .map { case (g, rows) => g -> rows.maxBy(_._2)._1 }
    query.stop()
    val batch = TextAnalysis.hllDistinctByGroup(
        events.toDF("g", "v", "t").select($"g".as("day"), $"v"),
        "day", "v")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (g, e) =>
      assert((e.nBucketsSeen, e.zScaled, e.estDistinct) == batch(g),
        s"group $g: stream $e vs batch ${batch(g)}")
    }
  }

  test("duplicates never move the registers; TTL reaps idle groups") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val query = StreamingSketch.statefulDistinct(input.toDS(),
        watermark = "2 minutes", ttlMs = 5L * 60000L)
      .writeStream.format("memory").queryName("hll_ttl")
      .outputMode("update").start()
    input.addData((1L, "alice", ts(0)), (1L, "bob", ts(0)))
    query.processAllAvailable()
    val first = spark.table("hll_ttl").as[HllEstimate].collect()
      .filter(_.group == 1L).last
    // replay the same users: estimate must not move
    input.addData((1L, "alice", ts(1)), (1L, "bob", ts(1)))
    query.processAllAvailable()
    val second = spark.table("hll_ttl").as[HllEstimate].collect()
      .filter(_.group == 1L).last
    assert(second == first, s"$second vs $first")
    // sentinel advances the watermark far past group 1's TTL
    input.addData((9L, "s", ts(60))); query.processAllAvailable()
    input.addData((9L, "s", ts(61))); query.processAllAvailable()
    val rows = query.recentProgress.reverse.find(_.stateOperators.nonEmpty)
      .map(_.stateOperators(0).numRowsTotal).getOrElse(-1L)
    query.stop()
    assert(rows == 1L, s"idle group should be reaped, state rows = $rows")
  }

  // ------------------------------------------------------ statefulCms

  test("streaming CMS estimates equal the batch sketch digit-for-digit") {
    implicit val sqlCtx = spark.sqlContext
    // skewed token stream on one group, shuffled, split across batches;
    // a final probe batch re-sends each distinct token once so the last
    // emission per token reflects the FULL multiset
    val body = (0 until 400).map(i => (7L, s"w${i % 23}", ts(i % 9)))
    val probe = (0 until 23).map(i => (7L, s"w$i", ts(10)))
    val input = MemoryStream[(Long, String, Timestamp)]
    val query = StreamingSketch.statefulCms(input.toDS())
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("update").start()
    new scala.util.Random(4).shuffle(body).grouped(130).foreach { chunk =>
      input.addData(chunk); query.processAllAvailable()
    }
    input.addData(probe); query.processAllAvailable()
    val streamed = spark.table("cms_stream").as[CmsEstimate].collect()
      .zipWithIndex.groupBy(_._1.token)
      .map { case (t, rows) => t -> rows.maxBy(_._2)._1.nCmsEst }
    query.stop()
    // batch reference over the SAME multiset (body + probe)
    val batch = TextAnalysis.cmsAudit(
        (body ++ probe).zipWithIndex
          .map { case ((_, tok, _), i) => (i.toLong, tok) }
          .toDF("doc_id", "text"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (tok, est) =>
      assert(est == batch(tok), s"token $tok: stream $est vs batch ${batch(tok)}")
    }
  }

  test("streaming CMS is arrival-order-independent (increments commute)") {
    implicit val sqlCtx = spark.sqlContext
    val body = (0 until 200).map(i => (1L, s"t${i % 17}", ts(i % 5)))
    def run(seed: Int, name: String): Map[String, Long] = {
      val input = MemoryStream[(Long, String, Timestamp)]
      val query = StreamingSketch.statefulCms(input.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      new scala.util.Random(seed).shuffle(body).grouped(45).foreach { c =>
        input.addData(c); query.processAllAvailable()
      }
      input.addData((0 until 17).map(i => (1L, s"t$i", ts(9))))
      query.processAllAvailable()
      val out = spark.table(name).as[CmsEstimate].collect()
        .zipWithIndex.groupBy(_._1.token)
        .map { case (t, rows) => t -> rows.maxBy(_._2)._1.nCmsEst }
      query.stop()
      out
    }
    assert(run(11, "cms_a") == run(77, "cms_b"))
  }

  // ------------------------------------------------------ statefulKmv

  /** In-memory KMV reference over a value multiset. */
  private def kmvRef(values: Seq[String], k: Int = 64): (Long, Long, Long) = {
    val hs = values.map(StreamingSketch.kmvHash).distinct.sorted.take(k)
    if (hs.size < k) (hs.size.toLong, 0L, hs.size.toLong)
    else (k.toLong, hs.last, (k - 1).toLong * 65536L / hs.last)
  }

  test("streaming KMV converges to the set-determined sketch, any batching") {
    implicit val sqlCtx = spark.sqlContext
    // 500 distinct values with heavy duplication on group 1; group 2
    // stays under-full (exact-count regime)
    val events = (0 until 1500).map { i =>
      if (i % 3 == 0) (2L, s"small${i % 31}", ts(i % 7)) // 31 coprime to 3: 31 distinct
      else (1L, s"big${i % 500}", ts(i % 7))
    }
    def run(seed: Int, name: String): Map[Long, (Long, Long, Long)] = {
      val input = MemoryStream[(Long, String, Timestamp)]
      val query = StreamingSketch.statefulKmv(input.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      new scala.util.Random(seed).shuffle(events).grouped(400).foreach { c =>
        input.addData(c); query.processAllAvailable()
      }
      val out = spark.table(name).as[KmvEstimate].collect()
        .zipWithIndex.groupBy(_._1.group)
        .map { case (g, rows) =>
          val last = rows.maxBy(_._2)._1
          g -> ((last.nSketch, last.kthMin, last.estDistinct))
        }
      query.stop()
      out
    }
    val a = run(3, "kmv_a")
    assert(a(1L) == kmvRef(events.filter(_._1 == 1L).map(_._2)))
    assert(a(2L) == kmvRef(events.filter(_._1 == 2L).map(_._2)))
    // group 2 is under-full: the estimate IS the exact distinct count
    assert(a(2L)._3 == 31L, a(2L).toString)
    // full sketch estimate sits in the KMV error band (~1/sqrt(64))
    assert(math.abs(a(1L)._3 - 500L) < 190L, a(1L).toString)
    // order-independent
    assert(run(31, "kmv_b") == a)
  }

  test("streaming KMV TTL reaps idle groups") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val query = StreamingSketch.statefulKmv(input.toDS(),
        watermark = "2 minutes", ttlMs = 5L * 60000L)
      .writeStream.format("memory").queryName("kmv_ttl")
      .outputMode("update").start()
    input.addData((1L, "x", ts(0)))
    query.processAllAvailable()
    input.addData((9L, "s", ts(60))); query.processAllAvailable()
    input.addData((9L, "s", ts(61))); query.processAllAvailable()
    val rows = query.recentProgress.reverse.find(_.stateOperators.nonEmpty)
      .map(_.stateOperators(0).numRowsTotal).getOrElse(-1L)
    query.stop()
    assert(rows == 1L, s"idle group should be reaped, state rows = $rows")
  }

  test("streaming CMS TTL reaps idle groups") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val query = StreamingSketch.statefulCms(input.toDS(),
        watermark = "2 minutes", ttlMs = 5L * 60000L)
      .writeStream.format("memory").queryName("cms_ttl")
      .outputMode("update").start()
    input.addData((1L, "x", ts(0)), (1L, "y", ts(0)))
    query.processAllAvailable()
    // sentinel group advances the watermark far past group 1's TTL
    input.addData((9L, "s", ts(60))); query.processAllAvailable()
    input.addData((9L, "s", ts(61))); query.processAllAvailable()
    val rows = query.recentProgress.reverse.find(_.stateOperators.nonEmpty)
      .map(_.stateOperators(0).numRowsTotal).getOrElse(-1L)
    query.stop()
    assert(rows == 1L, s"idle group should be reaped, state rows = $rows")
  }

  // --------------------------------------- statefulPrioritySample

  test("streaming priority sample equals the batch operator row-for-row") {
    implicit val sqlCtx = spark.sqlContext
    // 2 groups, 200 distinct ids each, duplicates everywhere
    val events = (0 until 1200).map { i =>
      (i % 2 + 1L, s"${i % 400}", ts(i % 9))
    }
    def run(seed: Int, name: String): Set[(Long, String, Long, Long)] = {
      val input = MemoryStream[(Long, String, Timestamp)]
      val query = StreamingSketch.statefulPrioritySample(input.toDS(), k = 7)
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      new scala.util.Random(seed).shuffle(events).grouped(300).foreach { c =>
        input.addData(c); query.processAllAvailable()
      }
      // last emitted sample per group wins
      val all = spark.table(name).as[PrioritySampleRow].collect().zipWithIndex
      // a group's final sample = the k rows emitted contiguously at
      // its last touch; identify them as the trailing k rows
      val out = all.groupBy(_._1.group).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(_._2).takeRight(7).map(_._1)
      }.map(r => (r.group, r.id, r.h, r.rank)).toSet
      query.stop()
      out
    }
    val streamed = run(5, "psamp_a")
    val batch = graft.llmdata.Sampling.prioritySamplePerGroup(
        events.map { case (g, v, _) => (g, v) }.toDF("grp", "id"),
        groupCol = "grp", idCol = "id", k = 7)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(streamed == batch,
      s"streaming/batch mismatch:\n streamed=$streamed\n batch=$batch")
    // order-independence: a different shuffle converges identically
    assert(run(17, "psamp_b") == streamed)
  }

  test("priority sample state is bounded at k pairs per group") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val query = StreamingSketch.statefulPrioritySample(input.toDS(), k = 5)
      .writeStream.format("memory").queryName("psamp_bound")
      .outputMode("update").start()
    input.addData((0 until 500).map(i => (1L, s"v$i", ts(1))))
    query.processAllAvailable()
    val lastRows = spark.table("psamp_bound").as[PrioritySampleRow]
      .collect()
    query.stop()
    // emitted sample never exceeds k, ranks are 1..k
    assert(lastRows.map(_.rank).max == 5L)
    assert(lastRows.groupBy(_.group).forall(_._2.length >= 5))
  }
}
