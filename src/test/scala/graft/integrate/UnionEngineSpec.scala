package graft.integrate

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NameSimilaritySpec extends org.scalatest.funsuite.AnyFunSuite {
  test("ratio matches Python difflib.SequenceMatcher exactly") {
    // fixtures generated with CPython difflib
    val cases = Seq(
      ("order_id", "order_id", 1.0),
      ("price", "prices", 0.9090909090909091),
      ("status", "status_code", 0.7058823529411765),
      ("open", "close", 0.4444444444444444),
      ("total_price", "totalprice", 0.9523809523809523),
      ("o_orderkey", "order_key", 0.8421052631578947),
      ("abc", "", 0.0),
      ("", "", 1.0),
      ("volume", "vol", 0.6666666666666666),
      ("ts", "timestamp", 0.36363636363636365),
      ("high", "low", 0.0),
      ("close_price", "price_close", 0.45454545454545453))
    cases.foreach { case (a, b, want) =>
      assert(NameSimilarity.ratio(a, b) == want, s"ratio($a, $b)")
    }
  }
}

class UnionEngineSpec extends SparkSpec {

  private val engine = new UnionEngine(ValidatorConfig.balanced)

  test("hybrid score: identical names score 1.0; weights are 0.85/0.15") {
    assert(math.abs(engine.hybridScore("open", "OPEN") - 1.0) < 1e-12)
    val s = engine.hybridScore("price", "prices")
    // 0.85 * 0.9090909... + 0.15 * trigram_jaccard(price, prices)=3/4
    assert(math.abs(s - (0.85 * 0.9090909090909091 + 0.15 * 0.75)) < 1e-12)
  }

  test("column mapping picks best above 0.72; weak pairs unmapped") {
    val (mapping, avg) = engine.findColumnMapping(
      Seq("order_id", "price", "status"),
      Seq("Order_ID", "prices", "status_code"))
    assert(mapping == Map("Order_ID" -> "order_id", "prices" -> "price"))
    assert(avg > 0.72)
  }

  test("coverage is the harmonic mean of match ratios") {
    assert(engine.coverage(2, 3, 3) == 2.0 * (2.0 / 3) * (2.0 / 3) / ((2.0 / 3) + (2.0 / 3)))
    assert(engine.coverage(0, 3, 3) == 0.0)
  }

  test("union executes with rename + missing-column nulls + order; dedup after") {
    import spark.implicits._
    val df1 = Seq((1L, 10.0, "O"), (2L, 20.0, "F")).toDF("order_id", "price", "status")
    val df2 = Seq((3L, 30.0, "HIGH"), (3L, 30.0, "HIGH")).toDF("Order_ID", "prices", "status_code")
    val (groups, ops) = engine.process(Seq(df1, df2))
    assert(groups.size == 1 && ops.size == 1)
    val out = groups.head
    assert(out.columns.toSeq == Seq("order_id", "price", "status", "status_code"))
    assert(out.count() == 3) // duplicate df2 row removed by U7
    val r3 = out.filter($"order_id" === 3L).collect()(0)
    assert(r3.isNullAt(out.columns.indexOf("status")))
    assert(r3.getString(out.columns.indexOf("status_code")) == "HIGH")
  }

  test("incompatible frames stay separate") {
    import spark.implicits._
    val df1 = Seq((1L, 10.0)).toDF("alpha", "beta")
    val df2 = Seq(("x", true)).toDF("gamma", "delta")
    val (groups, ops) = engine.process(Seq(df1, df2))
    assert(groups.size == 2 && ops.isEmpty)
  }

  test("high_quality profile rejects what balanced accepts") {
    import spark.implicits._
    val df1 = Seq((1L, 10.0, "O")).toDF("order_id", "price", "status")
    val df2 = Seq((3L, 30.0, "HIGH")).toDF("Order_ID", "prices", "status_code")
    val hq = new UnionEngine(ValidatorConfig.highQuality)
    val (c1, cov1, _) = engine.checkCompatibility(df1, df2) // balanced: 0.6
    val (c2, cov2, _) = hq.checkCompatibility(df1, df2) // high_quality: 0.7
    assert(c1 && !c2 && cov1 == cov2)
  }

  test("sequential greedy grouping absorbs transitively") {
    import spark.implicits._
    val a = Seq((1L, 1.0)).toDF("key_col", "val_col")
    val b = Seq((2L, 2.0)).toDF("Key_Col", "Val_Col")
    val c = Seq((3L, 3.0)).toDF("key_cols", "val_cols")
    val (groups, ops) = engine.process(Seq(a, b, c))
    assert(groups.size == 1)
    assert(groups.head.count() == 3)
    assert(ops.size == 2)
  }
}
