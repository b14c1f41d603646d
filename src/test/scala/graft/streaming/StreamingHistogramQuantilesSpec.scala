package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.enrich.TimeSeriesOps

class StreamingHistogramQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  // two groups, values spread over [0, 100); clamping exercised by
  // out-of-range points
  private val events: Seq[(Long, Double, Timestamp)] =
    (0 until 500).map { i =>
      (i % 2 + 1L, (i * 7 % 100) + (i % 3) * 0.25, ts(i % 9))
    } ++ Seq((1L, -5.0, ts(1)), (1L, 250.0, ts(2)), (2L, 99.99, ts(3)))

  private def runToFinal(evs: Seq[(Long, Double, Timestamp)], chunk: Int,
                         seed: Int): Set[(Long, Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    @volatile var last: Map[Long, Seq[HistQuantileRow]] = Map.empty
    val input = MemoryStream[(Long, Double, Timestamp)]
    val query = StreamingSketch.statefulHistogramQuantiles(input.toDS(),
        lo = 0.0, hi = 100.0, nBuckets = 20)
      .writeStream.outputMode("update")
      .foreachBatch { (df: Dataset[HistQuantileRow], _: Long) =>
        // Update mode emits only TOUCHED groups; keep each group's
        // latest emission
        df.collect().groupBy(_.group).foreach { case (g, rows) =>
          last = last.updated(g, rows.toSeq)
        }
      }
      .start()
    new scala.util.Random(seed).shuffle(evs).grouped(chunk).foreach { c =>
      input.addData(c); query.processAllAvailable()
    }
    query.stop()
    last.values.flatten
      .map(r => (r.group, r.qPct, r.nEvents, r.bucket)).toSet
  }

  test("stream equals batch digit-for-digit, any batching or order") {
    val batch = TimeSeriesOps.histogramQuantiles(
        events.toDF("group", "value", "ts"),
        keyCol = "group", valueCol = "value",
        lo = 0.0, hi = 100.0, nBuckets = 20)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val a = runToFinal(events, 120, seed = 5)
    assert(a == batch)
    // order/batching independence (increments commute)
    assert(runToFinal(events, 37, seed = 23) == batch)
  }

  test("clamping: out-of-range values land in the edge buckets") {
    val tiny = Seq((9L, -100.0, ts(0)), (9L, 1e9, ts(1)), (9L, 55.0, ts(2)))
    val out = TimeSeriesOps.histogramQuantiles(
        tiny.toDF("group", "value", "ts"), "group", "value",
        lo = 0.0, hi = 100.0, nBuckets = 10, qs = Seq(1, 50, 100))
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(out(1L) == 0L)   // p1 -> the clamped low bucket
    assert(out(50L) == 5L)  // 55.0 -> bucket 5
    assert(out(100L) == 9L) // p100 -> the clamped high bucket
  }
}
