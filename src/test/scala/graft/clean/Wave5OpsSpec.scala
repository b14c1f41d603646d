package graft.clean

import graft.SparkSpec
import graft.enrich.EventPaths

/** Semantic pins for the correlation-matrix / markov-stationary wave. */
class Wave5OpsSpec extends SparkSpec {
  import spark.implicits._

  test("correlationMatrix: perfect, inverse, and constant-column cases") {
    val rows = (1 to 20).map { i =>
      (i.toDouble, 2.0 * i + 3.0, 100.0 - i, 7.0)
    }
    val df = rows.toDF("x", "y", "z", "c")
    val out = Profiler.correlationMatrix(df,
        Seq(("x", 100L), ("y", 100L), ("z", 100L), ("c", 100L)))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(math.abs(out(("x", "y")) - 1.0) < 1e-9)   // y = 2x + 3
    assert(math.abs(out(("x", "z")) + 1.0) < 1e-9)   // z = 100 - x
    assert(out(("x", "c")) == 0.0)                   // zero variance guard
    assert(out(("y", "c")) == 0.0)
    assert(math.abs(out(("y", "z")) + 1.0) < 1e-9)
  }

  test("correlationMatrix: null rows excluded from every moment") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 2.0), (2.0, 4.0), (3.0, 6.0), (null, 100.0), (4.0, 8.0))
      .toDF("x", "y")
    val out = Profiler.correlationMatrix(df, Seq(("x", 100L), ("y", 100L)))
      .collect().head
    assert(out.getLong(2) == 4L)
    assert(math.abs(out.getDouble(3) - 1.0) < 1e-9)
  }

  test("markovStationary: symmetric 2-state chain stays exactly uniform") {
    // four 2-event users give transition counts a->a,a->b,b->a,b->b = 1
    // each (P = [[.5,.5],[.5,.5]]); uniform is exactly stationary in
    // integer micro-units: (500000*1) div 2 + (500000*1) div 2 = 500000
    val ev = Seq(
      (1L, "a", 1L, 10L), (1L, "a", 2L, 20L),
      (2L, "a", 3L, 10L), (2L, "b", 4L, 20L),
      (3L, "b", 5L, 10L), (3L, "a", 6L, 20L),
      (4L, "b", 7L, 10L), (4L, "b", 8L, 20L))
      .toDF("user_id", "event_type", "event_id", "t_us")
    val out = EventPaths.markovStationary(ev, "user_id", "t_us",
        "event_type", "event_id", iters = 8)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out("a") == (500000L, 1L))   // tie ranks break on state asc
    assert(out("b") == (500000L, 2L))
  }

  test("markovStationary: sink states are excluded and leak no mass") {
    // same chain plus one user ending in 'z' (z never transitions out):
    // z is not a state, the b->z transition is dropped, and b's row
    // total renormalizes over the kept columns -- pi unchanged
    val ev = Seq(
      (1L, "a", 1L, 10L), (1L, "a", 2L, 20L),
      (2L, "a", 3L, 10L), (2L, "b", 4L, 20L),
      (3L, "b", 5L, 10L), (3L, "a", 6L, 20L),
      (4L, "b", 7L, 10L), (4L, "b", 8L, 20L),
      (5L, "b", 9L, 10L), (5L, "z", 10L, 20L))
      .toDF("user_id", "event_type", "event_id", "t_us")
    val out = EventPaths.markovStationary(ev, "user_id", "t_us",
        "event_type", "event_id", iters = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set("a", "b"))
    assert(out("a") == 500000L && out("b") == 500000L)
  }

  test("markovStationary: biased chain converges to the 2:1 split") {
    // a->b always; b->a twice, b->b twice => P_b = (.5,.5), P_a=(0,1)
    // stationary: pi_a = pi_b/2 ... pi = (1/3, 2/3)
    val ev = Seq(
      (1L, "a", 1L, 10L), (1L, "b", 2L, 20L),
      (2L, "a", 3L, 10L), (2L, "b", 4L, 20L),
      (3L, "b", 5L, 10L), (3L, "a", 6L, 20L),
      (4L, "b", 7L, 10L), (4L, "a", 8L, 20L),
      (5L, "b", 9L, 10L), (5L, "b", 10L, 20L),
      (6L, "b", 11L, 10L), (6L, "b", 12L, 20L))
      .toDF("user_id", "event_type", "event_id", "t_us")
    val out = EventPaths.markovStationary(ev, "user_id", "t_us",
        "event_type", "event_id", iters = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 8 iterations of the quantized chain: within ~4000 micro of 1/3, 2/3
    assert(math.abs(out("a") - 333333L) < 4000L, s"pi: $out")
    assert(math.abs(out("b") - 666667L) < 4000L, s"pi: $out")
  }
}
