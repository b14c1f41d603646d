package graft.enrich

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zKey interleaves bits exactly (hand-computed cases)") {
    val df = Seq((3L, 5L), (0L, 0L), (1023L, 0L), (0L, 1023L), (7L, 7L))
      .toDF("a", "b")
      .withColumn("z", Layout.zKey(col("a"), col("b")))
    val z = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // a=3 (011) -> odd positions 1,3; b=5 (101) -> even positions 0,4
    assert(z((3L, 5L)) == 2L + 8L + 1L + 16L)
    assert(z((0L, 0L)) == 0L)
    // a occupies only odd bit positions: sum of 2^(2i+1) for 10 bits
    assert(z((1023L, 0L)) == (0 until 10).map(i => 1L << (2 * i + 1)).sum)
    assert(z((0L, 1023L)) == (0 until 10).map(i => 1L << (2 * i)).sum)
    assert(z((7L, 7L)) == 63L)
  }

  test("z-order files stay tight on BOTH dimensions; linear layout does not") {
    // a dense 64x64 grid: every (a, b) pair once
    val grid = (for { a <- 0L until 64L; b <- 0L until 64L } yield (a, b))
      .toDF("a", "b")
    val z = Layout.zOrderFileAudit(grid, "a", "b", bits = 6, fileSpan = 256L)
      .collect()
    assert(z.map(_.getAs[Long]("n_rows")).sum == 4096L)
    // each 256-key z-range of a dense 6-bit grid is a 16x16 tile
    z.foreach { r =>
      assert(r.getAs[Long]("n_rows") == 256L)
      assert(r.getAs[Long]("n_a") == 16L, s"n_a ${r.getAs[Long]("n_a")}")
      assert(r.getAs[Long]("n_b") == 16L)
    }
    // the same file size under a LINEAR (a-major) layout spans all of b
    val linearSpanB = 256L / 64L // rows per a-value slice... full b range
    assert(linearSpanB == 4L) // 4 a-values x all 64 b-values per file
  }

  test("zOrderFileAudit is deterministic under repartitioning") {
    val grid = (for { a <- 0L until 32L; b <- 0L until 32L } yield (a, b))
      .toDF("a", "b")
    val one = Layout.zOrderFileAudit(grid, "a", "b", bits = 5).collect()
      .map(_.toSeq).toSet
    val two = Layout.zOrderFileAudit(grid.repartition(7), "a", "b", bits = 5)
      .collect().map(_.toSeq).toSet
    assert(one == two)
  }
}
