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

  // --- real header-decode fixtures: bytes built in-test, formats per spec ---

  private def pngFixture(w: Int, h: Int, colorType: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(33).order(java.nio.ByteOrder.BIG_ENDIAN)
    b.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    b.putInt(13).put("IHDR".getBytes("US-ASCII"))
    b.putInt(w).putInt(h)
    b.put(8.toByte).put(colorType.toByte) // bit depth, color type
    b.put(0.toByte).put(0.toByte).put(0.toByte) // compression, filter, interlace
    b.array()
  }

  private def gifFixture(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(13).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("GIF89a".getBytes("US-ASCII"))
    b.putShort(w.toShort).putShort(h.toShort)
    b.put(0.toByte).put(0.toByte).put(0.toByte)
    b.array()
  }

  private def wavFixture(sampleRate: Int, bits: Int, channels: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36).put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1).putShort(channels.toShort).putInt(sampleRate)
    b.putInt(sampleRate * channels * bits / 8)
    b.putShort((channels * bits / 8).toShort).putShort(bits.toShort)
    b.put("data".getBytes("US-ASCII")).putInt(0)
    b.array()
  }

  test("decodeHeader parses real PNG/GIF/WAV headers") {
    assert(Multimodal.decodeHeader(pngFixture(640, 480, 6)) ==
      Some((640, 480, 4, "image/png")))
    assert(Multimodal.decodeHeader(pngFixture(1, 99999, 0)) ==
      Some((1, 99999, 1, "image/png")))
    assert(Multimodal.decodeHeader(gifFixture(320, 200)) ==
      Some((320, 200, 3, "image/gif")))
    assert(Multimodal.decodeHeader(wavFixture(44100, 16, 2)) ==
      Some((44100, 16, 2, "audio/wav")))
  }

  test("decodeHeader rejects non-media payloads and truncated headers") {
    assert(Multimodal.decodeHeader("plain text payload".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeHeader(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeHeader(pngFixture(10, 10, 2).take(20)).isEmpty)
    // decode() falls back to the labeled stub for unknown formats
    val txt = "plain text payload".getBytes("UTF-8")
    assert(Multimodal.decode(txt) == Multimodal.decodeStub(txt))
  }

  test("extractMeta uses the real header decode for recognized formats") {
    val rows = Seq(
      (0L, pngFixture(800, 600, 2)),
      (1L, wavFixture(16000, 8, 1)),
      (2L, "not media".getBytes("UTF-8")))
    val media = rows.toDF("media_id", "payload")
    val out = Multimodal.extractMeta(media).orderBy("media_id").collect()
    val png = out(0).getStruct(out(0).fieldIndex("meta"))
    assert(png.getAs[Int]("width") == 800 && png.getAs[Int]("height") == 600)
    assert(png.getAs[Int]("channels") == 3 && png.getAs[String]("format") == "image/png")
    val wav = out(1).getStruct(out(1).fieldIndex("meta"))
    assert(wav.getAs[Int]("width") == 16000 && wav.getAs[Int]("height") == 8)
    assert(wav.getAs[Int]("channels") == 1 && wav.getAs[String]("format") == "audio/wav")
    val other = out(2).getStruct(out(2).fieldIndex("meta"))
    assert(other.getAs[String]("format") == "fake/rgb8")
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
