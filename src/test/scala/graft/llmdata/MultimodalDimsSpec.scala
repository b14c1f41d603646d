package graft.llmdata

import graft.SparkSpec

/** Dims panel over the stub-decoded dimensions: tier/aspect class
  * rules and exact shares on hand byte lengths.
  */
class MultimodalDimsSpec extends SparkSpec {
  import spark.implicits._

  test("dimsStats classifies tiers and aspects from the stub dims") {
    // len 0    -> w 64,  h 64  -> square,    4096 px   -> small
    // len 100  -> w 164, h 78  -> landscape, 12792 px  -> small
    // len 400  -> w 464, h 121 -> landscape, 56144 px  -> medium
    // len 2900 -> w 404, h 478 -> portrait,  193112 px -> large
    val docs = Seq(
      (0L, ""), (1L, "x" * 100), (2L, "y" * 400), (3L, "z" * 2900))
      .toDF("doc_id", "text")
    val rows = Multimodal.dimsStats(Multimodal.asMediaTable(docs))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(rows(("small", "square")) === ((1L, 250000L, 64L, 64L)))
    assert(rows(("small", "landscape")) === ((1L, 250000L, 164L, 78L)))
    assert(rows(("medium", "landscape")) === ((1L, 250000L, 464L, 121L)))
    assert(rows(("large", "portrait")) === ((1L, 250000L, 404L, 478L)))
    assert(rows.size === 4)
  }
}
