package graft.llmdata

import graft.SparkSpec

/** Round-19 multimodal family: DCT pHash (noise-robust vs aHash,
  * spec-pinned), the production keep verdict, and the
  * corrupt/truncated payload audit. */
class Round19MultimodalSpec extends SparkSpec {
  import spark.implicits._

  /** Strong row-ramp frame with six bytes sitting exactly ON the
    * aHash mean — the regime the DCT hash exists for. */
  private val rampBase: Array[Byte] = {
    val b = Array.tabulate(64)(i => 40 + 30 * (i / 8))
    val idx = Seq(18, 19, 20, 21, 22, 23)
    var m = 0
    for (_ <- 0 until 5) { m = b.sum / 64; idx.foreach(b(_) = m) }
    b.map(_.toByte)
  }

  /** The same frame with those six mean-sitting bytes nudged +2 —
    * high-frequency noise of the kind a lossy re-encode injects. */
  private val rampNoisy: Array[Byte] = {
    val b = rampBase.map(x => (x & 0xff))
    Seq(18, 19, 20, 21, 22, 23).foreach(i => b(i) = b(i) + 2)
    b.map(_.toByte)
  }

  test("dctPhashDedup pairs the noisy re-encode that aHash misses") {
    val media = Seq((1L, rampBase), (2L, rampNoisy)).toDF("media_id", "payload")
    val ah = Multimodal.phashDedup(media).collect()
    assert(ah.isEmpty,
      "aHash must miss: the mean-adjacent bytes flipped 6 bits (> maxHamming)")
    val dct = Multimodal.dctPhashDedup(media).collect()
    assert(dct.length == 1 && dct.head.getLong(2) == 0L,
      "DCT low-frequency bits must be untouched by the perturbation")
  }

  test("dctPhashBands: global brightness shift leaves every AC bit unchanged") {
    // +4 keeps every byte in range (a wrap would be a CONTENT change,
    // not a brightness shift); the shift lands in the DC coefficient
    // up to basis-quantization crumbs far below any median margin
    val bright = rampBase.map(x => ((x & 0xff) + 4).toByte)
    val media = Seq((1L, rampBase), (2L, bright)).toDF("media_id", "payload")
    val bands = Multimodal.dctPhashBands(media).collect()
      .map(r => r.getLong(0) -> (1 until r.length).map(r.get)).toMap
    assert(bands(1L) == bands(2L),
      "a constant shift lives entirely in the (pinned-0) DC coefficient")
  }

  test("phashKeep: transitive cluster keeps only the min-id representative") {
    // alternating extremes: ~32 bits away from any smooth ramp
    val distinct = Array.tabulate(64)(i => (if (i % 2 == 0) 0 else 255).toByte)
    val media = Seq((3L, rampBase), (7L, rampBase), (11L, rampBase),
      (20L, distinct)).toDF("media_id", "payload")
    val out = Multimodal.phashKeep(media).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(out(3L) == ((3L, 3L, true)))
    assert(out(7L) == ((3L, 3L, false)))
    assert(out(11L) == ((3L, 3L, false)))
    assert(out(20L) == ((20L, 1L, true)))
  }

  test("phashDedup tight cap diverges from the default on a hot bucket") {
    // the padding-sweep pinned-divergence contract for
    // multimodal_phash_dedup vs _tight: the sf0.01 corpus never fills
    // a band bucket past 20, so the two entries coincide there — this
    // fixture (6 identical frames) crosses a cap of 3 and proves the
    // cap actually changes the output: star pairs only vs all pairs
    val media = (1L to 6L).map(i => (i, rampBase)).toDF("media_id", "payload")
    val wide = Multimodal.phashDedup(media, maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val tight = Multimodal.phashDedup(media, maxBucket = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wide == (1L to 6L).combinations(2).map(p => (p(0), p(1))).toSet)
    assert(tight == (2L to 6L).map(i => (1L, i)).toSet,
      "a hot bucket must star-expand to the min-id representative")
    assert(tight != wide)
  }

  test("payloadAudit: each container status from hand-built payloads") {
    def le32(n: Int): Array[Byte] = Array((n & 255).toByte,
      ((n >> 8) & 255).toByte, ((n >> 16) & 255).toByte,
      ((n >> 24) & 255).toByte)
    val body = "0123456789".getBytes("UTF-8")
    val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    val pngTrailer = Array(0, 0, 0, 0, 0x49, 0x45, 0x4e, 0x44,
      0xae, 0x42, 0x60, 0x82).map(_.toByte)
    val media = Seq(
      1L -> ("RIFF".getBytes ++ le32(4 + body.length) ++ "WAVE".getBytes ++ body),
      2L -> ("RIFF".getBytes ++ le32(4 + body.length + 5) ++ "WAVE".getBytes ++ body),
      3L -> ("BM".getBytes ++ le32(6 + body.length - 3) ++ body),
      4L -> (pngSig ++ body ++ pngTrailer),
      5L -> (pngSig ++ body),
      6L -> "hello world".getBytes("UTF-8")
    ).toDF("media_id", "payload")
    val out = Multimodal.payloadAudit(media).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getString(4))).toMap
    assert(out(1L) == (("riff/wave", 22L, 22L, "ok")))
    assert(out(2L) == (("riff/wave", 22L, 27L, "truncated")))
    assert(out(3L) == (("bmp", 16L, 13L, "trailing")))
    assert(out(4L) == (("png", 30L, -1L, "ok")))
    assert(out(5L) == (("png", 18L, -1L, "truncated")))
    assert(out(6L) == (("unknown", 11L, -1L, "unknown")))
  }
}
