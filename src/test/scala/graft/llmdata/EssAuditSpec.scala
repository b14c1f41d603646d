package graft.llmdata

import graft.SparkSpec

/** Kish effective-sample-size audit: uniform weights give ratio 1,
  * concentration shrinks it, zeros and nulls follow the stated
  * contract.
  */
class EssAuditSpec extends SparkSpec {
  import spark.implicits._

  test("uniform weights have ESS = n") {
    val df = Seq(2L, 2L, 2L, 2L).toDF("w")
    val r = Sampling.essAudit(df, "w").collect()(0)
    assert(r.getAs[Long]("n_pos") === 4L)
    assert(r.getAs[Double]("ess") === 4.0)
    assert(r.getAs[Double]("ess_ratio") === 1.0)
  }

  test("concentrated weights shrink the ratio: (3,1) -> 1.6/2") {
    val r = Sampling.essAudit(Seq(3L, 1L).toDF("w"), "w").collect()(0)
    assert(r.getAs[Double]("ess") === 16.0 / 10.0)
    assert(r.getAs[Double]("ess_ratio") === 0.8)
  }

  test("zeros count in n_rows but not n_pos; nulls are excluded") {
    val df = Seq(Some(4L), Some(0L), Some(0L), None).toDF("w")
    val r = Sampling.essAudit(df, "w").collect()(0)
    assert(r.getAs[Long]("n_rows") === 3L)
    assert(r.getAs[Long]("n_pos") === 1L)
    assert(r.getAs[Long]("sum_w") === 4L)
    assert(r.getAs[Double]("ess") === 1.0)
    assert(r.getAs[Double]("ess_ratio") === 1.0)
  }
}
