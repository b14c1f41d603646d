package graft.integrate

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private val quotes = Seq(
    // key, time, price
    (1L, 10L, 100.0),
    (1L, 20L, 110.0),
    (2L, 15L, 500.0)).toDF("q_key", "q_t", "price")

  private def asof(trades: org.apache.spark.sql.DataFrame) =
    AsOfJoin.asofBackward(trades, quotes,
      leftKey = "t_key", leftTime = "t_t",
      rightKey = "q_key", rightTime = "q_t",
      payloadCols = Seq("price"))

  test("backward join picks the latest right row at or before left time") {
    val trades = Seq(
      (1L, 5L),   // before any quote -> null
      (1L, 10L),  // equal time -> inclusive match 100.0
      (1L, 19L),  // between quotes -> 100.0
      (1L, 25L),  // after both -> 110.0
      (2L, 16L),  // other key -> 500.0
      (3L, 99L))  // unseen key -> null
      .toDF("t_key", "t_t")
    val got = asof(trades).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(got((1L, 5L)).isEmpty)
    assert(got((1L, 10L)).contains(100.0))
    assert(got((1L, 19L)).contains(100.0))
    assert(got((1L, 25L)).contains(110.0))
    assert(got((2L, 16L)).contains(500.0))
    assert(got((3L, 99L)).isEmpty)
  }

  test("forward join picks the earliest right row at or after left time") {
    val trades = Seq(
      (1L, 5L),  // before any quote -> next is 100.0 at t=10
      (1L, 10L), // equal time -> inclusive match 100.0
      (1L, 19L), // -> 110.0 at t=20
      (1L, 25L), // after every quote -> null
      (2L, 10L), // other key -> 500.0 at t=15
      (3L, 1L))  // unseen key -> null
      .toDF("t_key", "t_t")
    val got = AsOfJoin.asofForward(trades, quotes,
        leftKey = "t_key", leftTime = "t_t",
        rightKey = "q_key", rightTime = "q_t",
        payloadCols = Seq("price")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(got((1L, 5L)).contains(100.0))
    assert(got((1L, 10L)).contains(100.0))
    assert(got((1L, 19L)).contains(110.0))
    assert(got((1L, 25L)).isEmpty)
    assert(got((2L, 10L)).contains(500.0))
    assert(got((3L, 1L)).isEmpty)
  }

  test("null keys and times never match; left columns pass through") {
    val trades = Seq(
      (Some(1L), Some(25L), "a"),
      (None, Some(25L), "b"),       // null key -> null payload
      (Some(1L), None, "c"))        // null time -> sorts first, no match
      .toDF("t_key", "t_t", "tag")
    val got = asof(trades).collect()
      .map(r => r.getString(2) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(got("a").contains(110.0))
    assert(got("b").isEmpty)
    assert(got("c").isEmpty)
    // right rows with null key/time are dropped before the union
    val rightNulls = Seq((Option.empty[Long], 10L, 1.0)).toDF("q_key", "q_t", "price")
    val r2 = AsOfJoin.asofBackward(
      Seq((Option.empty[Long], 20L)).toDF("t_key", "t_t"), rightNulls,
      "t_key", "t_t", "q_key", "q_t", Seq("price")).collect()
    assert(r2.length == 1 && r2(0).isNullAt(2))
  }

  test("forward join: null key / null time left rows get null payload") {
    // ADVICE r12 #1: under plain asc a null-time left row sorted FIRST
    // and its forward frame spanned the partition, so it stole the
    // EARLIEST right payload. asc_nulls_last pins the null contract.
    val trades = Seq(
      (Some(1L), Some(5L), "a"),     // real match -> 100.0 at t=10
      (Some(1L), None, "nullt"),     // null time -> must be null, not 100.0
      (None, Some(5L), "nullk"))     // null key -> null payload
      .toDF("t_key", "t_t", "tag")
    val got = AsOfJoin.asofForward(trades, quotes,
        leftKey = "t_key", leftTime = "t_t",
        rightKey = "q_key", rightTime = "q_t",
        payloadCols = Seq("price")).collect()
      .map(r => r.getString(2) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(got("a").contains(100.0))
    assert(got("nullt").isEmpty)
    assert(got("nullk").isEmpty)
  }

  test("one shuffle: a single window exchange on the key") {
    val trades = Seq((1L, 12L)).toDF("t_key", "t_t")
    val plan = asof(trades).queryExecution.executedPlan.toString
    // exactly one hash-partitioned exchange (the window's), no join node
    assert("hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("Join"), plan)
  }
}
