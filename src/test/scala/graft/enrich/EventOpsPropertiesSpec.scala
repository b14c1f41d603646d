package graft.enrich

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** ScalaCheck properties over the event-analytics operators (funnel,
  * cohort retention, SCD2 history): each pins an algebraic invariant
  * or an independent sequential replay rather than a golden value —
  * the complement of the DuckDB hash oracles, same discipline as
  * `LlmDataPropertiesSpec`.
  */
class EventOpsPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def forSamples[A](g: Gen[A], n: Int = 6)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(g.pureApply(Gen.Parameters.default, Seed(4242L + i)))
    }

  private val stages = Seq("view", "click", "purchase")
  private val types: Gen[String] =
    Gen.oneOf("view", "click", "purchase", "error", "signup")

  /** (key, time, type) events: few keys, clustered times, duplicates
    * and ties allowed.
    */
  private val events: Gen[List[(Long, Long, String)]] =
    Gen.chooseNum(5, 60).flatMap(n =>
      Gen.listOfN(n, for {
        k <- Gen.chooseNum(1L, 5L)
        t <- Gen.chooseNum(0L, 50L)
        ty <- types
      } yield (k, t, ty)))

  test("property: funnel reach times are a monotone in-order prefix") {
    forSamples(events) { evs =>
      val out = Funnel.funnelTimes(evs.toDF("k", "t", "ty"),
          "k", "t", "ty", stages).collect()
      out.foreach { r =>
        val ts = (1 to 3).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i)))
        // defined prefix: t_j defined => t_{j-1} defined and <= t_j
        ts.sliding(2).foreach {
          case Seq(a, b) =>
            if (b.isDefined) { assert(a.isDefined); assert(a.get <= b.get) }
          case _ => ()
        }
        val completed = r.getLong(4)
        assert(completed == ts.takeWhile(_.isDefined).size)
        assert(r.getBoolean(5) == ts.last.isDefined)
      }
    }
  }

  test("property: funnel equals the sequential per-key replay, input-order free") {
    forSamples(events) { evs =>
      val out = Funnel.funnelTimes(evs.reverse.toDF("k", "t", "ty"),
          "k", "t", "ty", stages).collect()
        .map(r => r.getLong(0) ->
          (1 to 3).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i))))
        .toMap
      evs.groupBy(_._1).foreach { case (k, rows) =>
        // sequential replay: earliest time of stage j at-or-after the
        // stage j-1 reach time
        var prev: Option[Long] = Some(Long.MinValue)
        val expected = stages.map { st =>
          val reach = prev.flatMap(p =>
            rows.filter(e => e._3 == st && e._2 >= p)
              .map(_._2).sorted.headOption)
          prev = reach
          reach
        }
        assert(out(k) == expected, s"key $k: ${out(k)} vs $expected")
      }
    }
  }

  test("property: retention cells are bounded by the cohort size, offset 0 is full") {
    forSamples(events) { evs =>
      val cells = Funnel.cohortRetention(evs.toDF("k", "t", "ty"),
          "k", "t", bucket = 10L).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4)))
        .toMap
      val cohorts = cells.keySet.map(_._1)
      cohorts.foreach { c =>
        val (n0, size, r0) = cells((c, 0L))
        assert(n0 == size) // every member is active at offset 0
        assert(r0 == 1000000L)
      }
      cells.foreach { case ((_, off), (n, size, micro)) =>
        assert(off >= 0L)
        assert(n >= 1L && n <= size)
        assert(micro == n * 1000000L / size)
      }
      // cohort sizes partition the key population
      val totalKeys = evs.map(_._1).distinct.size.toLong
      assert(cohorts.toSeq.map(c => cells((c, 0L))._2).sum == totalKeys)
    }
  }

  /** Changelogs with unique (key, ord) so interval point-lookups are
    * unambiguous (order ties are pinned separately in MergeSpec).
    */
  private val changelog: Gen[List[(Long, String, Long)]] =
    Gen.chooseNum(4, 40).flatMap(n =>
      Gen.listOfN(n, for {
        k <- Gen.chooseNum(1L, 4L)
        t <- Gen.chooseNum(0L, 60L)
        s <- Gen.oneOf("a", "b", "c")
      } yield (k, s, t)).map(_.distinctBy(e => (e._1, e._3))))

  test("property: SCD2 intervals are contiguous, change-compressed, and cover every event") {
    forSamples(changelog) { rows =>
      val hist = graft.load.Merge.scd2History(
          rows.zipWithIndex.map { case ((k, s, t), i) => (k, s, t, i.toLong) }
            .toDF("k", "state", "ord", "tie"),
          "k", "ord", "tie").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) Long.MaxValue else r.getLong(3), r.getBoolean(4)))
      hist.groupBy(_._1).foreach { case (k, iv) =>
        val sorted = iv.sortBy(_._3)
        // exactly one open (current) interval per key, and it is last
        assert(sorted.count(_._5) == 1)
        assert(sorted.last._5 && sorted.last._4 == Long.MaxValue)
        // contiguous: each interval ends where the next begins
        sorted.sliding(2).foreach {
          case Array(a, b) => assert(a._4 == b._3)
          case _ => ()
        }
        // change-compressed: no two consecutive intervals share a state
        sorted.sliding(2).foreach {
          case Array(a, b) => assert(a._2 != b._2)
          case _ => ()
        }
        // point lookup: every input event's state matches its interval
        rows.filter(_._1 == k).foreach { case (_, s, t) =>
          val containing = sorted.filter(x => x._3 <= t && t < x._4)
          assert(containing.size == 1)
          // new state -> its own interval starts here; collapsed
          // repeat -> the covering interval carries the same state
          assert(containing.head._2 == s)
        }
      }
    }
  }
}
