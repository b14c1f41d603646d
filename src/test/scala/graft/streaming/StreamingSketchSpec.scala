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
}
