package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llmdata.Dedup

class StreamingNearDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  private val refTexts = Seq(
    1L -> "the quick brown fox jumps over the lazy dog tonight",
    2L -> "pack my box with five dozen liquor jugs right now",
    3L -> "how vexingly quick daft zebras jump around the park",
    4L -> "sphinx of black quartz judge my vow before dawn")

  test("single-batch parity: verdicts match Dedup.incrementalAssign decisions") {
    implicit val sqlCtx = spark.sqlContext
    val newDocs = Seq(
      101L -> refTexts(1)._2, // exact copy of doc 2
      102L -> "completely unrelated words about gardening and soil health",
      103L -> refTexts(3)._2) // exact copy of doc 4
    val input = MemoryStream[DocEvent]
    val query = StreamingNearDedup.statefulNearDedup(input.toDS())
      .writeStream.format("memory").queryName("nd_parity")
      .outputMode("append").start()
    input.addData(refTexts.map { case (id, t) => DocEvent(id, ts(0), t) }: _*)
    query.processAllAvailable()
    input.addData(newDocs.map { case (id, t) => DocEvent(id, ts(1), t) }: _*)
    query.processAllAvailable()
    val got = StreamingNearDedup.nearDupVerdicts(
        spark.table("nd_parity").filter(col("docId") >= 100L))
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]),
        r.getBoolean(3)))
      .sortBy(_._1).toSeq
    query.stop()
    val batch = Dedup.incrementalAssign(
        newDocs.toDF("doc_id", "text"),
        refTexts.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]),
        r.getBoolean(3)))
      .sortBy(_._1).toSeq
    assert(got == batch)
    assert(got == Seq((101L, Some(2L), false), (102L, None, true),
      (103L, Some(4L), false)))
  }

  test("cross-batch: duplicates attach to the ORIGINAL keeper, never a dup") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DocEvent]
    val query = StreamingNearDedup.statefulNearDedup(input.toDS())
      .writeStream.format("memory").queryName("nd_chain")
      .outputMode("append").start()
    input.addData(DocEvent(5L, ts(0), refTexts.head._2))
    query.processAllAvailable()
    input.addData(DocEvent(6L, ts(1), refTexts.head._2)) // dup of 5
    query.processAllAvailable()
    // 7 must attach to 5 (the keeper), NOT to 6 — dups never register
    input.addData(DocEvent(7L, ts(2), refTexts.head._2))
    query.processAllAvailable()
    val v = StreamingNearDedup.nearDupVerdicts(spark.table("nd_chain"))
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]),
        r.getBoolean(3))).sortBy(_._1).toSeq
    query.stop()
    assert(v == Seq((5L, None, true), (6L, Some(5L), false),
      (7L, Some(5L), false)))
    // and the estimate on an exact copy is exactly 1e6
    assert(spark.table("nd_chain").filter(col("docId") === 7L)
      .agg(max("estMicro")).as[Long].head() == 1000000L)
  }

  // Six texts that provably share their band-0 bucket (common
  // low-hash core shingle "oak kit bee") while pairwise signature
  // agreement stays ≤ 4 of 12 — BELOW the 0.4 gate (needs ≥ 5).
  // Found by offline search over the same md5 scheme; the first test
  // below re-validates both properties in-engine so the pin cannot
  // silently rot.
  private val bucketMates = Seq(
    11L -> "oak kit bee owl oak fen bee",
    12L -> "oak kit bee fen elm green fox",
    13L -> "oak kit bee kit sky ash bee",
    14L -> "oak kit bee red fen sky green")

  test("fixture self-check: bucketMates share band 0, all below the gate") {
    val df = bucketMates.toDF("doc_id", "text")
    val keys = Dedup.bandKeys(Dedup.sketch(df))
      .filter(col("band") === 0).select("key").distinct().count()
    assert(keys == 1L, "all four must land in ONE band-0 bucket")
    // no pair passes the batch near-dup gate (exact OR estimate)
    assert(Dedup.verifiedNearDups(Dedup.sketch(df)).count() == 0L)
  }

  // Partial-band near-dup of refTexts.head: 7/12 signature agreement
  // (above the 5-of-12 gate), SAME band-0 bucket, DIFFERENT buckets in
  // bands 1-3. Found by offline search over the same md5 scheme; the
  // self-check test re-validates all three properties in-engine.
  private val partialBandText =
    "sky quick brown fox jumps over the lazy dog tonight"

  test("fixture self-check: partialBandText shares ONLY band 0 with keeper") {
    val df = Seq(31L -> refTexts.head._2, 32L -> partialBandText)
      .toDF("doc_id", "text")
    val shared = Dedup.bandKeys(Dedup.sketch(df))
      .groupBy("band", "key").count().filter(col("count") === 2)
      .select("band").as[Int].collect().toSeq
    assert(shared == Seq(0), s"must share exactly band 0, got $shared")
    // and the pair is gated IN (signature agreement 7/12 >= 5/12)
    assert(Dedup.minhashCandidates(Dedup.sketch(df)).count() == 1L)
  }

  test("partial-band near-dup registers in unmatched bands: chained refs") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DocEvent]
    val query = StreamingNearDedup.statefulNearDedup(input.toDS())
      .writeStream.format("memory").queryName("nd_partial")
      .outputMode("append").start()
    input.addData(DocEvent(31L, ts(0), refTexts.head._2)) // keeper
    query.processAllAvailable()
    input.addData(DocEvent(32L, ts(1), partialBandText))
    query.processAllAvailable()
    input.addData(DocEvent(33L, ts(2), partialBandText)) // copy of 32
    query.processAllAvailable()
    val rows = spark.table("nd_partial").as[BandMatch].collect()
    query.stop()
    // 32 matched the keeper in band 0 (7/12 agreement)...
    val m32 = rows.filter(_.docId == 32L).map(r => r.band -> r.refId).toMap
    assert(m32(0) == Some(31L))
    assert(m32(1).isEmpty && m32(2).isEmpty && m32(3).isEmpty)
    // ...and at the doc grain 32 IS a duplicate of 31
    val v32 = StreamingNearDedup.nearDupVerdicts(
        spark.table("nd_partial").filter(col("docId") === 32L))
      .collect().head
    assert(Option(v32.get(1)).map(_.asInstanceOf[Long]) == Some(31L))
    assert(v32.getLong(2) == 7L * 1000000L / 12L)
    // THE PINNED SEMANTICS (per-band keeper rule): 32, though a
    // doc-grain duplicate, registered in bands 1-3 — so its exact
    // copy 33 attaches to 32 (est 1e6 beats band 0's 7/12 vs 31),
    // forming the reference chain 33 -> 32 -> 31 the contract states.
    val m33 = rows.filter(_.docId == 33L).map(r => r.band -> r.refId).toMap
    assert(m33(0) == Some(31L)) // 32 never registered in band 0
    assert(m33(1) == Some(32L) && m33(2) == Some(32L) && m33(3) == Some(32L))
    val v33 = StreamingNearDedup.nearDupVerdicts(
        spark.table("nd_partial").filter(col("docId") === 33L))
      .collect().head
    assert(Option(v33.get(1)).map(_.asInstanceOf[Long]) == Some(32L))
    assert(v33.getLong(2) == 1000000L)
  }

  test("hot-bucket cap: a full bucket registers no more but keeps matching") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DocEvent]
    val query = StreamingNearDedup.statefulNearDedup(input.toDS(), cap = 2)
      .writeStream.format("memory").queryName("nd_cap")
      .outputMode("append").start()
    input.addData(bucketMates.map { case (id, t) => DocEvent(id, ts(0), t) }: _*)
    query.processAllAvailable()
    // batch 2: exact copies of an UNDER-cap member (11) and an
    // OVER-cap member (13)
    input.addData(DocEvent(21L, ts(1), bucketMates.head._2),
      DocEvent(23L, ts(1), bucketMates(2)._2))
    query.processAllAvailable()
    val rows = spark.table("nd_cap").as[BandMatch].collect()
    query.stop()
    // band 0 filled by 11 and 12 (cap = 2); 13/14 arrived over-cap
    val b0 = rows.filter(r => r.band == 0).map(r => r.docId -> r.refId).toMap
    assert(b0(11L).isEmpty && b0(12L).isEmpty)
    assert(b0(13L).isEmpty && b0(14L).isEmpty) // below gate vs 11/12
    // copy of 11: the full bucket still MATCHES its registered member
    assert(b0(21L) == Some(11L))
    // copy of 13: 13 never registered in band 0 — no match there...
    assert(b0(23L).isEmpty)
    // ...but 13 DID register in its fresh band-1..3 buckets, so the
    // copy still attaches at the doc grain (the star-expansion trade:
    // over-cap members stay reachable through their other bands)
    val v23 = StreamingNearDedup.nearDupVerdicts(
        spark.table("nd_cap").filter(col("docId") === 23L))
      .collect().head
    assert(Option(v23.get(1)).map(_.asInstanceOf[Long]) == Some(13L))
    assert(!v23.getBoolean(3))
  }
}
