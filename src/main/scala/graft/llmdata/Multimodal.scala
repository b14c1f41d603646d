package graft.llmdata

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata alongside (builder
  * brief). The Spark-side plumbing — schema contract, partition-local
  * batched processing, deterministic output shape — is real and
  * tested; the actual media decode is a clearly-marked STUB (the
  * container has no image/audio codecs), swappable for a JNI/library
  * call without touching the plan.
  *
  * 100 TB design: payloads never reach the driver; decode/feature
  * extraction runs as `mapPartitions` over the binary column so each
  * task processes its partition's payloads in one batch-shaped pass
  * (the Scala analogue of `mapInPandas` — same per-partition batch
  * contract, no per-row UDF dispatch). Metadata-only pipelines prune
  * the binary column at the parquet scan, so a stats query never even
  * reads the payload bytes.
  */
object Multimodal {

  /** Typed metadata contract for a decoded media payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** ==== STUB ==== Deterministic fake decode: derives plausible
    * dimensions from the payload bytes alone. A real implementation
    * would parse the container header (PNG/JPEG/WAV/...) here; the
    * signature and determinism contract are what the pipeline relies
    * on.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int, String) = {
    val n = payload.length
    (64 + n % 512, 64 + (n / 7) % 512, 3, "fake/rgb8")
  }

  /** ==== STUB ==== Deterministic fake frame sampling: returns the
    * byte offsets a real video decoder would seek to for `k` evenly
    * spaced frames.
    */
  def frameOffsetsStub(payload: Array[Byte], k: Int): Seq[Long] = {
    val n = math.max(payload.length.toLong, 1L)
    (0 until k).map(i => i * n / k)
  }

  /** Wraps a text corpus as a media table (payload = utf-8 bytes) —
    * the demo source for the multimodal plumbing, since the testdata
    * ships no binary table.
    */
  def asMediaTable(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("media_id"),
      col(textCol).cast("binary").as("payload"))

  /** Decode + feature-extract over the binary column, batched per
    * partition (`mapPartitions`): schema in `(media_id, payload)`,
    * schema out `(media_id, byte_len, meta struct)`. The iterator is
    * consumed lazily, so a partition streams through constant memory
    * regardless of payload count.
    */
  def extractMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("byte_len", LongType, nullable = false),
      StructField("meta", mediaMetaType, nullable = false)))
    val rdd = media.select(col("media_id").cast("long"), col("payload")).rdd
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val (w, h, c, fmt) = decodeStub(payload)
          Row(id, payload.length.toLong, Row(w, h, c, fmt))
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Pure-SQL metadata projection over the binary column (digest,
    * length, head bytes, stub-decoded dimensions) — the oracle-checked
    * path: everything here is a codegen'd expression, demonstrating
    * that metadata extraction needs neither the driver nor a UDF.
    */
  def metaProjection(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      length(col("payload")).cast("long").as("byte_len"),
      md5(col("payload")).as("payload_md5"),
      lower(hex(expr("substring(payload, 1, 8)"))).as("head_hex"),
      (lit(64) + length(col("payload")) % 512).cast("long").as("fake_width"),
      (lit(64) + expr("length(payload) div 7") % 512).cast("long").as("fake_height"))
}
