package graft.enrich

import org.scalatest.funsuite.AnyFunSuite

/** Port of transform/tests/test_dsl_validator.py — identical
  * error-string contract (reference dsl_validator.py:5-125).
  */
class DslValidatorSpec extends AnyFunSuite {

  private def v(s: String) = DslValidator.validate(s)

  test("valid single feature with explicit params") {
    val (res, errors) = v("""{"features":[{"name":"sma","params":{"on":"close","window":20}}]}""")
    assert(errors.isEmpty)
    assert(res.get.head.name == "sma")
    assert(res.get.head.params("window") == 20)
  }

  test("multiple valid features") {
    val (res, errors) = v(
      """{"features":[
        |{"name":"sma","params":{"on":"close","window":20}},
        |{"name":"rsi","params":{"on":"close"}},
        |{"name":"session_flags","params":{}}]}""".stripMargin)
    assert(errors.isEmpty)
    assert(res.get.size == 3)
  }

  test("defaults injected for missing optional params") {
    val (res, errors) = v("""{"features":[{"name":"rsi","params":{"on":"close"}}]}""")
    assert(errors.isEmpty)
    assert(res.get.head.params("window") == 14)
  }

  test("user-provided value beats default") {
    val (res, errors) = v("""{"features":[{"name":"rsi","params":{"on":"close","window":21}}]}""")
    assert(errors.isEmpty)
    assert(res.get.head.params("window") == 21)
  }

  test("invalid JSON") {
    val (res, errors) = v("""{"features": [ not json """)
    assert(res.isEmpty)
    assert(errors == Seq("Validation Error: LLM output was not valid JSON."))
  }

  test("missing top-level features key") {
    val (res, errors) = v("""{"recipes": []}""")
    assert(res.isEmpty)
    assert(errors == Seq("Validation Error: JSON must have a top-level 'features' key."))
  }

  test("features not a list") {
    val (res, errors) = v("""{"features": {"name": "sma"}}""")
    assert(res.isEmpty)
    assert(errors.head.contains("top-level 'features' key"))
  }

  test("unknown feature name") {
    val (res, errors) = v("""{"features":[{"name":"hyperbolic_vortex","params":{}}]}""")
    assert(res.isEmpty)
    assert(errors == Seq("Feature 0 ('hyperbolic_vortex'): Not a supported feature."))
  }

  test("missing required parameter with no default") {
    val (res, errors) = v("""{"features":[{"name":"sma","params":{"on":"close"}}]}""")
    assert(res.isEmpty)
    assert(errors == Seq(
      "Feature 0 ('sma'): Required parameter 'window' is missing and has no default value."))
  }

  test("unsupported parameter") {
    val (res, errors) = v(
      """{"features":[{"name":"sma","params":{"on":"close","window":20,"bogus":1}}]}""")
    assert(res.isEmpty)
    assert(errors == Seq("Feature 0 ('sma'): Parameter 'bogus' is not supported for this feature."))
  }

  test("string type violation names the python type") {
    val (res, errors) = v("""{"features":[{"name":"sma","params":{"on":42,"window":20}}]}""")
    assert(res.isEmpty)
    assert(errors == Seq("Feature 0 ('sma'): Parameter 'on' must be a string, but got int."))
  }

  test("int type violation names the python type") {
    val (res, errors) = v("""{"features":[{"name":"sma","params":{"on":"close","window":"20"}}]}""")
    assert(res.isEmpty)
    assert(errors == Seq("Feature 0 ('sma'): Parameter 'window' must be an integer, but got str."))
  }

  test("bool passes the int check (python bool is an int)") {
    val (res, errors) = v("""{"features":[{"name":"sma","params":{"on":"close","window":true}}]}""")
    assert(errors.isEmpty)
    assert(res.isDefined)
  }

  test("allowed-values violation formats the python list") {
    val (res, errors) = v("""{"features":[{"name":"sma","params":{"on":"price","window":20}}]}""")
    assert(res.isEmpty)
    assert(errors == Seq("Feature 0 ('sma'): Parameter 'on' has value 'price', " +
      "but must be one of ['open', 'high', 'low', 'close', 'volume', 'vwap']."))
  }

  test("multiple errors accumulate with feature indices") {
    val (res, errors) = v(
      """{"features":[
        |{"name":"nope","params":{}},
        |{"name":"sma","params":{"on":"close"}}]}""".stripMargin)
    assert(res.isEmpty)
    assert(errors.size == 2)
    assert(errors(0).startsWith("Feature 0 ('nope')"))
    assert(errors(1).startsWith("Feature 1 ('sma')"))
  }

  test("custom feature requires code and as") {
    val (res, errors) = v("""{"features":[{"name":"custom_thing","params":{}}]}""")
    assert(res.isEmpty)
    assert(errors == Seq(
      "Feature 0 ('custom_thing'): Missing required 'code' parameter for custom feature.",
      "Feature 0 ('custom_thing'): Missing required 'as' parameter for output column name."))
  }

  test("custom feature with invalid expression syntax") {
    val (res, errors) = v(
      """{"features":[{"name":"custom_x","params":{"code":"close +* open","as":"x"}}]}""")
    assert(res.isEmpty)
    assert(errors.head.startsWith("Feature 0 ('custom_x'): Invalid expression in code:"))
  }

  test("custom feature happy path skips registry checks") {
    val (res, errors) = v(
      """{"features":[{"name":"custom_ratio","params":{"code":"close / open","as":"ratio"}}]}""")
    assert(errors.isEmpty)
    assert(res.get.head.params("as") == "ratio")
  }

  test("macd defaults all periods") {
    val (res, errors) = v("""{"features":[{"name":"macd","params":{}}]}""")
    assert(errors.isEmpty)
    val p = res.get.head.params
    assert(p("on") == "close" && p("fast_period") == 12 && p("slow_period") == 26
      && p("signal_period") == 9)
  }
}

/** Port of the sandbox security tests
  * (transform/tests/test_custom_features.py:191-326): the reference
  * blocks file access / imports / eval; the rebuild's expression DSL
  * rejects any non-whitelisted construct at validation time.
  */
class SafeExprDslSpec extends AnyFunSuite {

  test("arithmetic over columns is allowed") {
    assert(SafeExprDsl.validate("(close - open) / open").isRight)
    assert(SafeExprDsl.validate("log(close / lag_close) * 100.0").isLeft == false ||
      SafeExprDsl.validate("log(close / lag_close) * 100.0").isRight)
  }

  test("conditionals and null handling are allowed") {
    assert(SafeExprDsl.validate("CASE WHEN volume > 0 THEN close / volume ELSE NULL END").isRight)
    assert(SafeExprDsl.validate("coalesce(vwap, (high + low) / 2)").isRight)
    assert(SafeExprDsl.validate("if(close > open, 1, 0)").isRight)
  }

  test("file access functions are rejected") {
    assert(SafeExprDsl.validate("input_file_name()").isLeft)
  }

  test("reflection is rejected") {
    assert(SafeExprDsl.validate("reflect('java.lang.System', 'getenv')").isLeft)
    assert(SafeExprDsl.validate("java_method('java.lang.Runtime', 'getRuntime')").isLeft)
  }

  test("subqueries are rejected") {
    assert(SafeExprDsl.validate("(select max(x) from t)").isLeft)
  }

  test("star expansion is rejected") {
    assert(SafeExprDsl.validate("hash(*)").isLeft)
  }

  test("unknown functions are rejected with a named error") {
    val err = SafeExprDsl.validate("do_evil(close)").left.getOrElse("")
    assert(err.contains("do_evil"))
  }

  test("syntax errors surface as Left") {
    assert(SafeExprDsl.validate("close +* open").isLeft)
  }
}
