package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.enrich.TimeSeriesOps

/** Streaming EWMA control chart: digit-for-digit parity with the
  * batch op across micro-batch splits, calendar-gap zero-fill, and
  * the late-bucket drop contract.
  */
class StreamingEwmaAnomalySpec extends SparkSpec {
  import spark.implicits._

  private val counts = Seq(0L -> 4L, 1L -> 4L, 3L -> 40L, 4L -> 1L)

  private def batchRows = {
    val events = counts.flatMap { case (d, n) =>
      Seq.fill(n.toInt)(Tuple1(d * 86400000000L))
    }.toDF("t")
    TimeSeriesOps.ewmaAnomaly(events, "t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getBoolean(4)))
  }

  private def streamRows(splits: Seq[Seq[SeriesCount]]) = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SeriesCount]
    val name = s"ewma_anomaly_${splits.map(_.size).mkString("_")}"
    val query = StreamingEnrich.runEwmaAnomaly(
      input.toDS(), span = 7, thresholdPpm = 500000L, name)
    splits.foreach { b =>
      input.addData(b: _*); query.processAllAvailable()
    }
    val out = spark.table(name).as[EwmaAnomalyRow].collect()
      .sortBy(_.bucket)
      .map(r => (r.bucket, r.nEvents, r.ewmaPrior, r.devPpm, r.isAnomaly))
    query.stop()
    out
  }

  test("stream == batch in one micro-batch, silent day zero-filled") {
    val cells = counts.map { case (d, n) => SeriesCount("s", d, n) }
    assert(streamRows(Seq(cells)).toSeq === batchRows.toSeq)
  }

  test("stream == batch across micro-batch splits (state carries)") {
    val cells = counts.map { case (d, n) => SeriesCount("s", d, n) }
    assert(streamRows(Seq(cells.take(1), cells.slice(1, 3), cells.drop(3)))
      .toSeq === batchRows.toSeq)
  }

  test("a late bucket at or below the high-water mark is dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SeriesCount]
    val query = StreamingEnrich.runEwmaAnomaly(
      input.toDS(), span = 7, thresholdPpm = 500000L, "ewma_anomaly_late")
    input.addData(SeriesCount("s", 0L, 4L), SeriesCount("s", 1L, 4L))
    query.processAllAvailable()
    input.addData(SeriesCount("s", 1L, 99L), SeriesCount("s", 0L, 99L))
    query.processAllAvailable()
    val rows = spark.table("ewma_anomaly_late").as[EwmaAnomalyRow].collect()
    query.stop()
    assert(rows.length === 2)
    assert(rows.forall(_.nEvents === 4L))
  }

  test("series are independent state keys") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SeriesCount]
    val query = StreamingEnrich.runEwmaAnomaly(
      input.toDS(), span = 7, thresholdPpm = 500000L, "ewma_anomaly_keys")
    input.addData(SeriesCount("a", 0L, 10L), SeriesCount("b", 0L, 1L),
      SeriesCount("a", 1L, 10L), SeriesCount("b", 1L, 9L))
    query.processAllAvailable()
    val rows = spark.table("ewma_anomaly_keys").as[EwmaAnomalyRow].collect()
    query.stop()
    val b1 = rows.find(r => r.series == "b" && r.bucket == 1L).get
    assert(b1.devPpm === 8000000L) // (9-1)/1
    assert(b1.isAnomaly)
    val a1 = rows.find(r => r.series == "a" && r.bucket == 1L).get
    assert(a1.devPpm === 0L)
    assert(!a1.isAnomaly)
  }
}
