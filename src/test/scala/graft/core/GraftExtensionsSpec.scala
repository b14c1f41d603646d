package graft.core

import graft.SparkSpec

/** The shared test session is built with
  * `.withExtensions(new GraftExtensions)` (SparkSpec), so these
  * queries exercise the real injectFunction path end-to-end from SQL.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("graft_dot is callable from SQL") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .collect()(0).getDouble(0)
    assert(r == 32.0)
  }

  test("graft_minhash matches the HOF spelling from SQL") {
    val sql =
      """SELECT graft_minhash(array('a b c', 'b c d'), 2) AS sig,
        |       array(array_min(transform(array('a b c', 'b c d'), x -> md5(concat('mh0:', x)))),
        |             array_min(transform(array('a b c', 'b c d'), x -> md5(concat('mh1:', x))))) AS want
        |""".stripMargin
    val row = spark.sql(sql).collect()(0)
    assert(row.getSeq[String](0) == row.getSeq[String](1))
  }

  test("graft_pair_features exposes the 26-feature struct in SQL") {
    val row = spark.sql(
      """SELECT f.n_features, f.sign_agreement
        |FROM (SELECT graft_pair_features(array(1.0D, 2.0D), array(1.0D, 2.0D)) AS f)
        |""".stripMargin).collect()(0)
    assert(row.getDouble(0) == 2.0)
    assert(row.getDouble(1) == 1.0)
  }
}
