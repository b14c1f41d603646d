package graft.llmdata

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("asMediaTable carries payloads as binary with ids") {
    val m = Multimodal.asMediaTable(docs(0L -> "hello", 1L -> "world!"))
    assert(m.schema("payload").dataType.typeName == "binary")
    val bytes = m.orderBy("media_id").collect()(0).getAs[Array[Byte]]("payload")
    assert(new String(bytes, "UTF-8") == "hello")
  }

  test("extractMeta batches decode per partition with the typed schema") {
    val m = Multimodal.asMediaTable(docs(0L -> "tiny", 1L -> ("x" * 100)))
      .repartition(2)
    val out = Multimodal.extractMeta(m).orderBy("media_id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("byte_len") == 4L)
    val meta = out(1).getStruct(out(1).fieldIndex("meta"))
    // deterministic stub: same input -> same fake dimensions
    val (w, h, c, fmt) = Multimodal.decodeStub(("x" * 100).getBytes("UTF-8"))
    assert(meta.getAs[Int]("width") == w && meta.getAs[Int]("height") == h)
    assert(meta.getAs[Int]("channels") == c && meta.getAs[String]("format") == fmt)
  }

  test("decodeStub and frameOffsetsStub are deterministic and bounded") {
    val p = Array.tabulate[Byte](1000)(_.toByte)
    assert(Multimodal.decodeStub(p) == Multimodal.decodeStub(p.clone()))
    val offs = Multimodal.frameOffsetsStub(p, 4)
    assert(offs == Seq(0L, 250L, 500L, 750L))
    assert(offs.forall(o => o >= 0 && o < 1000))
  }

  test("metaProjection matches the stub decode formulas") {
    val m = Multimodal.asMediaTable(docs(5L -> "abcdefghij"))
    val r = Multimodal.metaProjection(m).collect()(0)
    assert(r.getAs[Long]("byte_len") == 10L)
    assert(r.getAs[Long]("fake_width") == 64 + 10 % 512)
    assert(r.getAs[String]("head_hex") == "6162636465666768")
    assert(r.getAs[String]("payload_md5").length == 32)
  }
}
