package graft.enrich

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.clean.Profiler

/** Focused pins for the round-19 optimization restructures: the
  * operators changed INTERNALS (grouped histogram-refine medians,
  * driver-side Markov power chain, spread-guarded profile) and these
  * tests hold their outputs to the old spellings bit-for-bit.
  */
class R19OptimizationSpec extends SparkSpec {
  import spark.implicits._

  test("madOutliers histogram-refine equals the rank-window spelling") {
    // adversarial fixture: skewed values, duplicates, a negative tail,
    // and group sizes that make (n*50+99) div 100 land on duplicates
    val rows = (1L to 997L).map { i =>
      (s"g${i % 4}", (i * i * 2654435761L) % 10007L - 5000L)
    }
    val df = rows.toDF("g", "v")
    val got = GroupStats.madOutliers(df, "g", "v").collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    // the pre-r19 window spelling, inlined
    def winMedian(in: org.apache.spark.sql.DataFrame, vc: String) = {
      val w = Window.partitionBy("g")
      in.withColumn("__rn",
          row_number().over(w.orderBy(col(vc).asc)).cast("long"))
        .withColumn("__n", count(lit(1)).over(w))
        .groupBy("g")
        .agg(max(when(col("__rn") === expr("(__n * 50 + 99) div 100"),
          col(vc))).as("p50"))
    }
    val med = winMedian(df, "v").withColumnRenamed("p50", "median")
    val dev = df.join(med, "g").withColumn("__d", abs(col("v") - col("median")))
    val mad = winMedian(dev.select(col("g"), col("__d")), "__d")
      .withColumnRenamed("p50", "mad")
    val want = dev.join(mad, "g")
      .groupBy("g", "median", "mad")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("__d") > col("mad") * 3, 1L).otherwise(0L))
          .as("n_outliers"))
      .withColumn("outlier_ppm", expr("n_outliers * 1000000 div n_rows"))
      .collect()
      .map(r => r.getString(0) -> Seq(r.getLong(3), r.getLong(1),
        r.getLong(2), r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (g, s) =>
      assert(s == want(g), s"group $g: got $s want ${want(g)}")
    }
  }

  test("madOutliers keeps non-string group keys exact") {
    val df = (1L to 200L).map(i => (i % 3, i * 7 % 97)).toDF("g", "v")
    val out = GroupStats.madOutliers(df, "g", "v").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // per-group medians computed by hand: values are i*7 % 97 over the
    // residue classes of i mod 3
    def med(vals: Seq[Long]): Long = {
      val s = vals.sorted
      s(((s.size * 50 + 99) / 100 - 1).toInt)
    }
    (0L to 2L).foreach { g =>
      val vals = (1L to 200L).filter(_ % 3 == g).map(i => i * 7 % 97)
      assert(out(g) == med(vals), s"group $g median")
    }
  }

  test("madOutliers degenerate single-value group reports MAD 0") {
    val df = (Seq.fill(9)(("a", 5L)) ++ Seq(("b", 1L), ("b", 2L), ("b", 9L)))
      .toDF("g", "v")
    val out = GroupStats.madOutliers(df, "g", "v").collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out("a") == (5L, 0L))
  }

  test("markovStationary driver chain replays the join-iteration arithmetic") {
    // 3-state chain with an asymmetric low-mass state (t9) and
    // repeated edges, replayed by hand below with the old spelling's
    // exact arithmetic (per-cell truncating division, inner-join
    // presence semantics, uniform integer start)
    val ev = Seq(
      // user 1: t9 -> a -> b -> a -> b
      (1L, "t9", 0L, 0L), (1L, "a", 1L, 1000L), (1L, "b", 2L, 2000L),
      (1L, "a", 3L, 3000L), (1L, "b", 4L, 4000L),
      // user 2: a -> b -> a -> t9 -> a  (t9 has one outgoing edge)
      (2L, "a", 5L, 0L), (2L, "b", 6L, 1000L), (2L, "a", 7L, 2000L),
      (2L, "t9", 8L, 3000L), (2L, "a", 9L, 4000L))
      .toDF("user_id", "event_type", "event_id", "t_us")
    val out = EventPaths.markovStationary(ev, "user_id", "t_us",
      "event_type", "event_id", iters = 8).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // replay: steps per user -> (src, dst) counts restricted to
    // src-set dsts, π0 uniform, 8 rounds of per-cell truncating
    // division with inner-join presence
    val steps = Seq("t9" -> "a", "a" -> "b", "b" -> "a", "a" -> "b",
      "a" -> "b", "b" -> "a", "a" -> "t9", "t9" -> "a")
    val counts = steps.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val srcs = counts.keys.map(_._1).toSet
    val cells = counts.filter { case ((_, d), _) => srcs(d) }
    val tots = cells.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    var pi: Map[String, Long] = srcs.toSeq.sorted
      .map(_ -> 1000000L / srcs.size).toMap
    (1 to 8).foreach { _ =>
      val next = scala.collection.mutable.HashMap.empty[String, Long]
      cells.foreach { case ((s, d), c) =>
        pi.get(s).foreach { r =>
          next(d) = next.getOrElse(d, 0L) + (r * c) / tots(s)
        }
      }
      pi = next.toMap
    }
    val want = srcs.toSeq.map(s => s -> pi.getOrElse(s, 0L))
      .sortBy { case (s, p) => (-p, s) }
      .zipWithIndex.map { case ((s, p), i) => (s, p, (i + 1).toLong) }
    assert(out.sortBy(_._3).toSeq == want, s"got ${out.toSeq} want $want")
  }

  test("tableProfile spread keeps the one-wide-aggregate output exact") {
    val df = (1L to 500L)
      .map(i => (i % 7, if (i % 11 == 0) null else s"v${i % 13}"))
      .toDF("k", "s")
    val out = Profiler.tableProfile(df, Seq("k", "s")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
          r.getString(5))).toMap
    assert(out("k") == ((500L, 0L, 7L, "0", "6")))
    // 45 nulls (multiples of 11 up to 500); distinct non-null v0..v12
    assert(out("s") == ((500L, 45L, 13L, "v0", "v9")))
  }
}
