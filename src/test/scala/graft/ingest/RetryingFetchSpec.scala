package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** The retry/backoff contract of the ingest transport (reference:
  * polygon_client.py:61-74 — 3 attempts, 2 s delay). Pure driver-side,
  * no Spark session needed.
  */
class RetryingFetchSpec extends AnyFunSuite {

  private val req = ApiRequest("polygon", "get_aggs", Map("ticker" -> "RTY"))

  test("fails twice then succeeds: three attempts, two backoff sleeps") {
    var attempts = 0
    val slept = scala.collection.mutable.ArrayBuffer[Long]()
    val fetch = new RetryingFetch(
      transport = { _ =>
        attempts += 1
        if (attempts < 3) throw new java.io.IOException(s"boom $attempts")
        Some("""{"ok": true}""")
      },
      maxAttempts = 3, delayMillis = 2000L, sleep = slept += _)
    assert(fetch(req).contains("""{"ok": true}"""))
    assert(attempts == 3)
    assert(slept.toSeq == Seq(2000L, 2000L))
  }

  test("exhausted attempts rethrow the last error after maxAttempts-1 sleeps") {
    var attempts = 0
    val slept = scala.collection.mutable.ArrayBuffer[Long]()
    val fetch = new RetryingFetch(
      transport = { _ => attempts += 1; throw new java.io.IOException(s"down $attempts") },
      maxAttempts = 3, delayMillis = 2000L, sleep = slept += _)
    val e = intercept[java.io.IOException](fetch(req))
    assert(e.getMessage == "down 3")
    assert(attempts == 3)
    assert(slept.size == 2)
  }

  test("None (no recorded payload) passes through without retrying") {
    var attempts = 0
    val fetch = new RetryingFetch(
      transport = { _ => attempts += 1; None },
      maxAttempts = 3, delayMillis = 2000L, sleep = _ => fail("must not sleep"))
    assert(fetch(req).isEmpty)
    assert(attempts == 1)
  }

  test("first-try success never sleeps") {
    val fetch = new RetryingFetch(
      transport = _ => Some("payload"),
      sleep = _ => fail("must not sleep"))
    assert(fetch(req).contains("payload"))
  }
}
