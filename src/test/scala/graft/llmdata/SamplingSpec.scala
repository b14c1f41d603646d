package graft.llmdata

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hexThreshold maps fractions to the 32-bit hex axis") {
    assert(Sampling.hexThreshold(0.0) == "00000000")
    assert(Sampling.hexThreshold(0.5) == "80000000")
    assert(Sampling.hexThreshold(1.0) == "ffffffff")
  }

  test("clusterWeightedSample keeps anchors always, members at ~1/size") {
    val clusters = (
      Seq(1L -> 1L, 2L -> 1L, 3L -> 1L) ++ // 3-member cluster
        Seq(10L -> 10L) ++ // singleton
        (100L until 180L).map(_ -> 100L) // 80-member hot cluster
      ).toDF("doc_id", "root_id")
    val out = Sampling.clusterWeightedSample(clusters).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(out.size == 84)
    // anchors and singletons always survive
    assert(out(1L) == ((1L, 3L, true)))
    assert(out(10L) == ((10L, 1L, true)))
    assert(out(100L)._3)
    assert(out.values.forall { case (_, _, _) => true })
    // the hot cluster thins to ~1 + Binomial(79, 1/80): far below 80,
    // deterministic for this fixture
    val hotKept = out.filter { case (id, (root, _, keep)) => root == 100L && keep }
    assert(hotKept.size < 10, s"hot cluster kept ${hotKept.size}")
    assert(out.count { case (_, (root, _, _)) => root == 100L } == 80)
    // deterministic under repartitioning
    val again = Sampling.clusterWeightedSample(clusters.repartition(7)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(again == out)
  }

  test("stratified sample is deterministic and tracks the fractions") {
    val docs = (0 until 4000).map { i =>
      (i.toLong, if (i % 2 == 0) "en" else "de")
    }.toDF("doc_id", "lang")
    val fr = Map("en" -> 0.25)
    val once = Sampling.sampleStratified(docs, "doc_id", "lang", fr, 1.0)
    val again = Sampling.sampleStratified(
      docs.repartition(13), "doc_id", "lang", fr, 1.0)
    val a = once.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = again.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b) // partition layout cannot change the sample
    val en = once.filter($"lang" === "en").count().toDouble / 2000
    assert(en > 0.18 && en < 0.32, s"en keep-rate $en not ~0.25")
    assert(once.filter($"lang" === "de").count() == 2000) // default 1.0 keeps all
  }

  test("selectByTokenBudget keeps best-first docs within the budget") {
    // scores 10..1, 5 tokens each, budget 23 -> inclusive cum sums
    // 5,10,15,20 fit; the 5th doc would reach 25 > 23 and is cut
    val docs = (1 to 10).map(i => (i.toLong, (11 - i).toLong, 5))
      .toDF("doc_id", "score", "n_tokens") // n_tokens INT on purpose
    val got = Sampling.selectByTokenBudget(docs, "score", "n_tokens", "doc_id", 23L)
    assert(got.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L))
    assert(got.select("cum_tokens").collect().map(_.getLong(0)).max == 20L)
    // null tokens count as 0 and never break the running sum
    val withNull = Seq((1L, 2L, Some(5)), (2L, 1L, None))
      .toDF("doc_id", "score", "n_tokens")
    val kept = Sampling.selectByTokenBudget(withNull, "score", "n_tokens", "doc_id", 5L)
    assert(kept.count() == 2) // cum = 5, 5 — both within budget
  }

  test("packSequences assigns concat-and-chunk positions per shard") {
    val docs = Seq(
      // lang a: tokens 3,4,5 with budget 6 -> starts 0,3,7
      (1L, "a", 3L), (2L, "a", 4L), (3L, "a", 5L),
      // lang b independent: starts 0
      (4L, "b", 2L)).toDF("doc_id", "lang", "n_tokens")
    val got = Sampling.packSequences(docs, "lang", "doc_id", "n_tokens", 6L)
      .select("doc_id", "seq_id", "seq_offset").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((0L, 0L)))
    assert(got(2L) == ((0L, 3L))) // starts in chunk 0, straddles into 1
    assert(got(3L) == ((1L, 1L))) // starts at token 7 = chunk 1 offset 1
    assert(got(4L) == ((0L, 0L))) // shards pack independently
  }

  test("assignShards snakes the size rank into near-equal token shards") {
    import org.apache.spark.sql.functions._
    // 40 docs with linearly decreasing sizes: snake over 4 shards
    val d = (0L until 40L).map(i => (i, 100L - i)).toDF("doc_id", "n_tokens")
    val out = Sampling.assignShards(d, "doc_id", "n_tokens", nShards = 4).collect()
    assert(out.length == 40)
    // rank 0 (largest) -> shard 0; ranks 0..7 snake 0,1,2,3,3,2,1,0
    val byRank = out.sortBy(_.getAs[Long]("size_rank")).map(_.getAs[Int]("shard"))
    assert(byRank.take(8).toSeq == Seq(0, 1, 2, 3, 3, 2, 1, 0))
    // balance: totals within one doc's tokens of each other
    val totals = out.groupBy(_.getAs[Int]("shard")).view
      .mapValues(_.map(_.getAs[Long]("n_tokens")).sum).values.toSeq
    assert(totals.size == 4)
    assert(totals.max - totals.min <= 100L)
    // every shard holds exactly 10 docs here (40 = 5 full snakes)
    assert(out.groupBy(_.getAs[Int]("shard")).values.forall(_.length == 10))
  }

  // ------------------------------------------- temporalSplitEmbargo

  private def tsplit(trainPpm: Long, embargo: Long,
                     rows: (Long, Long, Long)*) =
    Sampling.temporalSplitEmbargo(rows.toDF("k", "t", "id"),
        "k", "t", "id", trainPpm, embargo)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getString(3))
      .toMap

  test("temporal split: integer cut, embargo horizon, then test") {
    // 10 events at t=1..10, 70% cut -> t 1..7 train; embargo 2 covers
    // t 8..9; t=10 is the only test row
    val rows = (1L to 10L).map(t => (1L, t, t))
    val out = tsplit(700000L, 2L, rows: _*)
    assert((1L to 7L).forall(t => out((1L, t)) == "train"))
    assert(out((1L, 8L)) == "embargo" && out((1L, 9L)) == "embargo")
    assert(out((1L, 10L)) == "test")
  }

  test("temporal split: every entity keeps at least one train row") {
    val out = tsplit(100000L, 0L, (1L, 5L, 1L), (2L, 9L, 2L))
    // n=1, 10% of 1 floors to 0 -> greatest(1, .) keeps the row train
    assert(out((1L, 1L)) == "train" && out((2L, 2L)) == "train")
  }

  test("temporal split: no test row inside the embargo horizon (leakage guard)") {
    val rng = new scala.util.Random(11)
    val rows = for (k <- 1L to 5L; i <- 1L to 30L)
      yield (k, rng.nextInt(1000).toLong, k * 100 + i)
    val df = rows.toDF("k", "t", "id")
    val out = Sampling.temporalSplitEmbargo(df, "k", "t", "id",
      trainPpm = 600000L, embargo = 50L).collect()
    val byKey = out.groupBy(_.getLong(0))
    byKey.values.foreach { ks =>
      val trainMax = ks.filter(_.getString(3) == "train").map(_.getLong(1)).max
      ks.filter(_.getString(3) == "test")
        .foreach(r => assert(r.getLong(1) > trainMax + 50L, r))
      // embargo rows sit strictly between the horizons
      ks.filter(_.getString(3) == "embargo")
        .foreach(r => assert(r.getLong(1) <= trainMax + 50L, r))
    }
  }
  // ------------------------------------------------------ kfoldAssign

  test("kfoldAssign: byte-identical duplicates always share a fold") {
    import org.apache.spark.sql.functions._
    val docs = (0 until 200).map(i => (i.toLong, s"content ${i % 40} body"))
      .toDF("doc_id", "text") // every text appears 5 times
    val out = Sampling.kfoldAssign(docs, k = 5).collect()
      .map(r => r.getString(1) -> r.getLong(2))
    val byText = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(byText.values.forall(_.size == 1),
      byText.filter(_._2.size > 1).take(3).toMap.toString)
    // all five folds actually used on 40 distinct contents
    assert(out.map(_._2).toSet == Set(0L, 1L, 2L, 3L, 4L))
    // deterministic under repartitioning
    val again = Sampling.kfoldAssign(docs.repartition(7), k = 5)
      .orderBy("doc_id").collect().map(_.getLong(2)).toSeq
    val base = Sampling.kfoldAssign(docs, k = 5)
      .orderBy("doc_id").collect().map(_.getLong(2)).toSeq
    assert(again == base)
    // k guard
    val ex = intercept[IllegalArgumentException] {
      Sampling.kfoldAssign(docs, k = 1)
    }
    assert(ex.getMessage.contains("folds"))
  }
}
