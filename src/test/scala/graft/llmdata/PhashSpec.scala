package graft.llmdata

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Perceptual-hash (aHash) banded dedup. Fixtures use a bimodal byte
  * frame — 32 x '0' (0x30) and 32 x 'z' (0x7a) — so the mean sits far
  * from every byte and single-byte edits flip EXACTLY one hash bit. */
class PhashSpec extends SparkSpec {
  import spark.implicits._

  private val lo = "0"
  private val hi = "z"
  private def frame(flips: Set[Int]): String =
    (0 until 64).map { i =>
      val base = if (i < 32) lo else hi
      if (flips.contains(i)) (if (i < 32) hi else lo) else base
    }.mkString

  private def media(rows: (Long, String)*) =
    Multimodal.asMediaTable(rows.toDF("doc_id", "text"))

  test("identical payloads pair at hamming 0; payloads beyond byte 64 are invisible") {
    val out = Multimodal.phashDedup(media(
      1L -> frame(Set.empty),
      2L -> frame(Set.empty),
      3L -> (frame(Set.empty) + " trailing bytes the stub decode never reads")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // all three share the 64-byte frame: three pairs, all hamming 0
    assert(out == Map((1L, 2L) -> 0L, (1L, 3L) -> 0L, (2L, 3L) -> 0L))
  }

  test("k flipped bytes = hamming k, up to the threshold; beyond it, excluded") {
    val out = Multimodal.phashDedup(media(
      1L -> frame(Set.empty),
      2L -> frame(Set(5)),             // 1 flip
      3L -> frame(Set(5, 20, 40)),     // 3 flips vs doc 1
      4L -> frame(Set(1, 2, 3, 4, 20, 40, 50, 60)))) // 8 flips vs doc 1
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((1L, 2L)) == 1L)
    assert(out((1L, 3L)) == 3L)
    assert(out((2L, 3L)) == 2L) // flips {20, 40} differ
    // doc 4 is > 3 bits from everything
    assert(!out.keySet.exists { case (a, b) => a == 4L || b == 4L }, out)
  }

  test("pigeonhole: every <=3-bit pair is found even when flips span 3 bands") {
    // flips in bands 0, 1, 2 — only band 3 still matches; the pair
    // must still surface (the banding guarantee is exact, not
    // probabilistic)
    val out = Multimodal.phashDedup(media(
      1L -> frame(Set.empty),
      2L -> frame(Set(3, 19, 37))))
      .collect()
    assert(out.length == 1 && out.head.getLong(2) == 3L, out.mkString(", "))
  }

  test("hot band buckets star-expand above the cap") {
    val docs = (1L to 5L).map(i => i -> frame(Set.empty))
    val capped = Multimodal.phashDedup(media(docs: _*), maxBucket = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every bucket (all 4 bands identical) is size 5 > 3: star pairs only
    assert(capped == Set((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)))
  }

  test("phashBands64: short payloads zero-pad, empty payload is all-zero bands") {
    val out = Multimodal.phashBands64(media(
      1L -> "", 2L -> hi * 4)).collect()
      .map(r => r.getLong(0) -> (1 until r.length).map(r.getInt).toSeq).toMap
    assert(out(1L) == Seq(0, 0, 0, 0))
    // 4 'z' bytes, 60 zero-pad bytes: mean = 122*4/64 = 7, so exactly
    // the four real bytes exceed it -> low 4 bits of band 0
    assert(out(2L) == Seq(15, 0, 0, 0))
  }

  test("threshold >= band count is rejected (guarantee would silently break)") {
    val ex = intercept[IllegalArgumentException] {
      Multimodal.phashDedup(media(1L -> frame(Set.empty)), maxHamming = 4)
    }
    assert(ex.getMessage.contains("pigeonhole"))
  }
}
