package graft.core

import graft.SparkSpec

/** Demonstrates the co-located-join scale path the engine prescribes
  * for repeated big-x-big equi-joins (builder brief: "bucketing for
  * co-located joins"): both sides bucketed + sorted on the join key at
  * write time join WITHOUT any shuffle exchange, while the same join
  * over plain tables shuffles both sides.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed+sorted tables join with zero shuffle exchanges") {
    import spark.implicits._
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val left = (0 until 1000).map(i => (i.toLong % 100, s"l$i")).toDF("key", "lv")
      val right = (0 until 1000).map(i => (i.toLong % 100, s"r$i")).toDF("key", "rv")

      left.write.mode("overwrite").bucketBy(8, "key").sortBy("key").saveAsTable("bk_left")
      right.write.mode("overwrite").bucketBy(8, "key").sortBy("key").saveAsTable("bk_right")
      left.write.mode("overwrite").saveAsTable("plain_left")
      right.write.mode("overwrite").saveAsTable("plain_right")

      val bucketed = spark.table("bk_left").join(spark.table("bk_right"), "key")
      val plain = spark.table("plain_left").join(spark.table("plain_right"), "key")

      val bucketedPlan = bucketed.queryExecution.executedPlan.toString
      val plainPlan = plain.queryExecution.executedPlan.toString
      // co-located: bucket layout satisfies the join distribution
      assert(!bucketedPlan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$bucketedPlan")
      // the same join without buckets shuffles both sides
      assert(plainPlan.contains("Exchange hashpartitioning"))
      // and the results agree
      assert(bucketed.count() == plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
