package graft

import graft.SparkSpec

/** Pins the bench harness's zero-storage invariant (VERDICT r8
  * §next-8): a clean reset drains persisted RDD blocks and tracked
  * broadcasts, and a dirty block manager FAILS the run instead of
  * silently skewing the next timing.
  */
class BenchResetSpec extends SparkSpec {
  import spark.implicits._

  test("resetOrFail drains persisted RDDs and tracked broadcasts") {
    val tracker = BenchReset.install(spark)
    // a persisted frame + a broadcast join = both block families live
    val df = (1 to 1000).toDF("n").persist()
    assert(df.count() == 1000)
    val joined = df.join(
      org.apache.spark.sql.functions.broadcast((1 to 10).toDF("n")), "n")
    assert(joined.count() == 10)
    assert(spark.sparkContext.getRDDStorageInfo.nonEmpty)
    BenchReset.resetOrFail(spark, tracker)
    assert(spark.sparkContext.getRDDStorageInfo.isEmpty)
    assert(tracker.liveCount == 0)
  }

  test("a surviving RDD block fails the run; broadcast leftovers only warn") {
    val e = intercept[IllegalStateException](BenchReset.check(3, 0))
    assert(e.getMessage.contains("3 RDD storage entries"))
    BenchReset.check(0, 2) // warns on stderr, must not throw
    BenchReset.check(0, 0)
  }
}
