package graft.enrich

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** ScalaCheck properties over the window-feature compiler (SURVEY §5
  * test-strategy: property tests the reference lacks). Frames are
  * small random per-ticker series; each property pins an algebraic
  * invariant of the feature semantics.
  */
class FeaturePropertiesSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic ScalaCheck sampling (scalatestplus is not on the
    * offline classpath; plain Gen + fixed seeds gives reproducible
    * properties).
    */
  private def forSamples[A](g: Gen[A], n: Int = 8)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(g.pureApply(Gen.Parameters.default, Seed(42L + i)))
    }

  private val series: Gen[List[Double]] =
    Gen.chooseNum(5, 30).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1.0, 100.0).map(x => math.rint(x * 4) / 4)))

  private def frame(xs: Seq[Double]) =
    xs.zipWithIndex.map { case (x, i) => ("T", i.toLong, x) }.toDF("ticker", "ts", "value")

  private def applyOne(xs: Seq[Double], name: String, params: (String, Any)*): Seq[Option[Double]] = {
    val out = FeatureCompiler(frame(xs), Seq(FeatureRequest(name, params.toMap, as = Some("f"))))
      .orderBy("ts").select("f").collect()
    out.map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
  }

  test("sma over a constant series is that constant (after warmup)") {
    forSamples(Gen.zip(series, Gen.chooseNum(2, 5))) { case (xs, w) =>
      {
        val const = xs.map(_ => 42.0)
        val got = applyOne(const, "sma", "on" -> "value", "window" -> w)
        got.zipWithIndex.foreach { case (v, i) =>
          if (i < w - 1) assert(v.isEmpty)       // min_periods = window
          else assert(v.contains(42.0))
        }
      }
    }
  }

  test("rsi stays within [0, 100] where defined") {
    forSamples(series.suchThat(_.size >= 5)) { xs =>
      {
        val got = applyOne(xs, "rsi", "on" -> "value", "window" -> 4)
        got.flatten.foreach(v => assert(v >= 0.0 && v <= 100.0))
      }
    }
  }

  test("lag(k) reproduces the input shifted by k") {
    forSamples(Gen.zip(series.suchThat(_.size > 3), Gen.chooseNum(1, 3))) { case (xs, k) =>
      {
        val got = applyOne(xs, "lag", "on" -> "value", "periods" -> k)
        got.zipWithIndex.foreach { case (v, i) =>
          if (i < k) assert(v.isEmpty)
          else assert(v.contains(xs(i - k)))
        }
      }
    }
  }

  test("diff(1) telescopes: running sum of diffs recovers value - value0") {
    forSamples(series.suchThat(_.size >= 2)) { xs =>
      {
        val diffs = applyOne(xs, "diff", "on" -> "value", "periods" -> 1)
        val partial = diffs.drop(1).map(_.get).scanLeft(0.0)(_ + _).drop(1)
        partial.zipWithIndex.foreach { case (s, i) =>
          assert(math.abs(s - (xs(i + 1) - xs.head)) < 1e-9)
        }
      }
    }
  }

  test("rolling_max dominates rolling_min and both bracket the value") {
    forSamples(Gen.zip(series, Gen.chooseNum(2, 5))) { case (xs, w) =>
      {
        val mx = applyOne(xs, "rolling_max", "on" -> "value", "window" -> w)
        val mn = applyOne(xs, "rolling_min", "on" -> "value", "window" -> w)
        xs.indices.foreach { i =>
          if (i < w - 1) { // pandas default min_periods = window
            assert(mx(i).isEmpty && mn(i).isEmpty)
          } else {
            assert(mn(i).get <= xs(i) && xs(i) <= mx(i).get)
            assert(mn(i).get <= mx(i).get)
          }
        }
      }
    }
  }

  test("ema lies between the running min and max of the series") {
    forSamples(Gen.zip(series.suchThat(_.size >= 6), Gen.chooseNum(2, 6))) { case (xs, span) =>
      {
        val got = applyOne(xs, "ema", "on" -> "value", "window" -> span)
        got.zipWithIndex.foreach {
          case (Some(v), i) =>
            val seen = xs.take(i + 1)
            assert(v >= seen.min - 1e-9 && v <= seen.max + 1e-9)
          case _ => ()
        }
      }
    }
  }

  test("simple and log returns agree through exp for positive series") {
    forSamples(series.suchThat(_.size >= 2)) { xs =>
      {
        val simple = applyOne(xs, "ret", "on" -> "value", "periods" -> 1, "method" -> "simple")
        val logr = applyOne(xs, "ret", "on" -> "value", "periods" -> 1, "method" -> "log")
        simple.zip(logr).foreach {
          case (Some(s), Some(l)) => assert(math.abs(math.exp(l) - (1 + s)) < 1e-9)
          case (None, None) => ()
          case other => fail(s"null mismatch: $other")
        }
      }
    }
  }
}
