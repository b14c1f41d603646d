package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("no-eviction parity: counts equal the exact batch frequencies, any batching") {
    implicit val sqlCtx = spark.sqlContext
    // 30 distinct tokens per group, capacity 64 -> MG never decrements
    val events = (0 until 900).map { i =>
      (i % 2 + 1L, s"tok${i % 30}_${i % 2}", ts(i % 7))
    }
    def run(seed: Int, name: String): Set[(Long, String, Long, Long)] = {
      val input = MemoryStream[(Long, String, Timestamp)]
      val query = StreamingSketch.statefulHeavyHitters(input.toDS(), k = 10)
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      new scala.util.Random(seed).shuffle(events).grouped(250).foreach { c =>
        input.addData(c); query.processAllAvailable()
      }
      val all = spark.table(name).as[HeavyHitterRow].collect().zipWithIndex
      val out = all.groupBy(_._1.group).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(_._2).takeRight(10).map(_._1)
      }.map(r => (r.group, r.token, r.mgCount, r.rank)).toSet
      query.stop()
      out
    }
    val streamed = run(3, "hh_a")
    // exact batch top-10 per group by (count desc, token asc)
    val batch = events.map { case (g, t, _) => (g, t) }
      .groupBy(identity).map { case ((g, t), xs) => (g, t, xs.size.toLong) }
      .toSeq.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy { case (_, t, c) => (-c, t) }.take(10).zipWithIndex
          .map { case ((g, t, c), i) => (g, t, c, i + 1L) }
      }.toSet
    assert(streamed == batch)
    // batching/order independence under no-eviction
    assert(run(11, "hh_b") == streamed)
  }

  test("under eviction the MG guarantee holds: hot tokens survive, error bounded") {
    implicit val sqlCtx = spark.sqlContext
    // capacity 8, one group: a token with 40% mass MUST be present
    // with count within N/capacity of truth
    val hot = (0 until 400).map(i => (1L, "HOT", ts(i % 5)))
    val noise = (0 until 600).map(i => (1L, s"n${i}", ts(i % 5)))
    val events = scala.util.Random.shuffle(hot ++ noise)
    val input = MemoryStream[(Long, String, Timestamp)]
    val query = StreamingSketch.statefulHeavyHitters(input.toDS(),
        capacity = 8, k = 5)
      .writeStream.format("memory").queryName("hh_ev")
      .outputMode("update").start()
    events.grouped(200).foreach { c =>
      input.addData(c); query.processAllAvailable()
    }
    val all = spark.table("hh_ev").as[HeavyHitterRow].collect().zipWithIndex
    query.stop()
    val last = all.sortBy(_._2).takeRight(5).map(_._1)
    val hotRow = last.find(_.token == "HOT")
    assert(hotRow.isDefined, s"hot token must survive eviction: $last")
    val n = 1000L
    assert(hotRow.get.mgCount <= 400L)
    assert(hotRow.get.mgCount >= 400L - n / 8L,
      s"undercount must stay within N/capacity: ${hotRow.get.mgCount}")
  }
}
