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
}
