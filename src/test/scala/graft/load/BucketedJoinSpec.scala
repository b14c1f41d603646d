package graft.load

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucketed tables sort-merge join with no Exchange in the plan") {
    val a = (0L until 1000L).map(i => (i, s"a$i")).toDF("k", "va")
    val b = (0L until 1000L).map(i => (i % 500, i * 2)).toDF("k", "vb")
    Loader.writeBucketed(a, "bkt_a", Seq("k"), buckets = 8)
    Loader.writeBucketed(b, "bkt_b", Seq("k"), buckets = 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val j = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      val plan = j.queryExecution.sparkPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(j.count() == 1000L) // 500 keys x 2 fact rows
      // grouping on the bucket key is exchange-free too
      val g = spark.table("bkt_a").groupBy("k").agg(count(lit(1)))
      assert(!g.queryExecution.sparkPlan.toString.contains("Exchange hashpartitioning"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
