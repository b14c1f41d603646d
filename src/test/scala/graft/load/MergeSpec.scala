package graft.load

import graft.SparkSpec

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")

  private def merge(updates: org.apache.spark.sql.DataFrame) =
    Merge.latestWins(base, updates, "k", "ord", "del", "tie")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("latest update wins; untouched keys pass through") {
    val u = Seq(
      (1L, 11.0, 5L, false, 1L),
      (1L, 12.0, 9L, false, 2L), // newer -> wins
      (2L, 21.0, 3L, false, 3L))
      .toDF("k", "v", "ord", "del", "tie")
    assert(merge(u) == Map(1L -> 12.0, 2L -> 21.0, 3L -> 30.0))
  }

  test("tombstones drop keys unless a newer upsert revives them") {
    val u = Seq(
      (1L, 0.0, 5L, true, 1L),              // delete k=1
      (2L, 0.0, 5L, true, 2L), (2L, 25.0, 8L, false, 3L), // delete then revive
      (4L, 40.0, 1L, false, 4L))            // insert of an unseen key
      .toDF("k", "v", "ord", "del", "tie")
    assert(merge(u) == Map(2L -> 25.0, 3L -> 30.0, 4L -> 40.0))
  }

  test("order ties break on tieCol deterministically") {
    val u = Seq(
      (1L, 100.0, 7L, false, 1L),
      (1L, 200.0, 7L, false, 2L)) // same ord, higher tie -> wins
      .toDF("k", "v", "ord", "del", "tie")
    assert(merge(u)(1L) == 200.0)
  }

  private def scd2(rows: (Long, String, Long, Long)*) =
    Merge.scd2History(rows.toDF("k", "state", "ord", "tie"),
        "k", "ord", "tie")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
      .toSet

  test("scd2History compresses repeats into validity intervals") {
    val out = scd2(
      (1L, "a", 10L, 1L), (1L, "a", 20L, 2L), // repeat -> collapsed
      (1L, "b", 30L, 3L), (1L, "a", 40L, 4L), // back to a = NEW interval
      (2L, "x", 5L, 5L))
    assert(out == Set(
      (1L, "a", 10L, 30L, false),
      (1L, "b", 30L, 40L, false),
      (1L, "a", 40L, -1L, true),
      (2L, "x", 5L, -1L, true)))
  }

  test("scd2History breaks order ties on tieCol and keeps both states") {
    val out = scd2((1L, "a", 7L, 1L), (1L, "b", 7L, 2L))
    // same ord: tie orders a before b -> a's interval is empty [7, 7)
    assert(out == Set((1L, "a", 7L, 7L, false), (1L, "b", 7L, -1L, true)))
  }

  test("plan shape: scd2History is one key exchange shared by both windows") {
    val plan = Merge.scd2History(
        Seq((1L, "a", 1L, 1L)).toDF("k", "state", "ord", "tie"),
        "k", "ord", "tie")
      .queryExecution.executedPlan.toString
    // the change-compression lag and the lead window share ONE
    // exchange and ONE sort (the scaladoc's no-second-shuffle claim)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert("\\bSort \\[".r.findAllIn(plan).size <= 1, plan)
    assert(!plan.contains("Join"), plan)
  }

  test("scd2History null-safe compare collapses null payload repeats") {
    val rows = Seq[(Long, Option[String], Long, Long)](
      (1L, None, 1L, 1L), (1L, None, 2L, 2L), (1L, Some("s"), 3L, 3L))
      .toDF("k", "state", "ord", "tie")
    val out = Merge.scd2History(rows, "k", "ord", "tie").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2)))
    assert(out.toSet == Set((1L, None, 1L), (1L, Some("s"), 3L)))
  }
}
