package graft.llmdata

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AnnSearchSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Double])*) =
    rows.toDF("vec_id", "embedding")

  test("bruteForceTopK returns exact neighbors ranked by cosine") {
    val d = emb(
      0L -> Seq(1.0, 0.0, 0.0),
      1L -> Seq(0.9, 0.1, 0.0),   // closest to 0
      2L -> Seq(0.0, 1.0, 0.0),   // orthogonal to 0
      3L -> Seq(-1.0, 0.0, 0.0))  // opposite to 0
    val v = AnnSearch.vectors(d)
    val res = AnnSearch.bruteForceTopK(v, v.filter(col("vec_id") === 0), 3)
      .orderBy("rnk").collect()
    assert(res.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 2L, 3L))
    assert(res(0).getAs[Double]("cos") > 0.99)
    assert(res(2).getAs[Double]("cos") < -0.99)
  }

  test("kmeansAssign separates two obvious clusters and is deterministic") {
    // two tight 4-dim clusters around (+0.4...) and (-0.4...)
    val rows = (0L until 20L).map { i =>
      val sign = if (i % 2 == 0) 1.0 else -1.0
      i -> (0 until 4).map(d => sign * (0.4 + 0.001 * (i + d)))
    }
    val d = emb(rows: _*)
    val out = AnnSearch.kmeansAssign(d, k = 2, iters = 3, dim = 4).collect()
    val byBucket = out.groupBy(_.getAs[Int]("bucket")).view.mapValues(
      _.map(_.getAs[Long]("vec_id")).toSet).toMap
    assert(byBucket.size == 2)
    // each cluster lands whole in one bucket
    val evens = (0L until 20L by 2).toSet
    val odds = (1L until 20L by 2).toSet
    assert(byBucket.values.toSet == Set(evens, odds))
    // deterministic under repartitioning
    val out2 = AnnSearch.kmeansAssign(d.repartition(7), k = 2, iters = 3, dim = 4)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("bucket")).toMap
    assert(out.map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("bucket")).toMap == out2)
  }

  test("kmeansAssign keeps an empty bucket's centroid and still assigns every vector") {
    // all vectors identical -> one bucket takes everything, others stay empty
    val d = emb((0L until 6L).map(i => i -> Seq.fill(4)(0.3)): _*)
    val out = AnnSearch.kmeansAssign(d, k = 3, iters = 2, dim = 4).collect()
    assert(out.length == 6)
    assert(out.map(_.getAs[Int]("bucket")).toSet.size == 1)
  }

  test("ivfKmeansTopK matches ivfTopK's contract over learned buckets") {
    val mk = (seed: Int) => (0 until 64).map(d => math.sin(seed * 64 + d).abs + 0.01)
    val d = emb((0L until 10L).map(i => i -> mk(i.toInt)): _*)
    val res = AnnSearch.ivfKmeansTopK(d, col("vec_id") < 2, 3).collect()
    val byQuery = res.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.nonEmpty)
    byQuery.foreach { case (q, rows) =>
      assert(rows.length <= 3)
      assert(!rows.exists(_.getAs[Long]("neighbor_id") == q))
      assert(rows.map(_.getAs[Int]("rnk")).sorted.toSeq == (1 to rows.length))
      // ranked by descending cosine
      val cs = rows.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("ivfTopK only probes two buckets and re-ranks exactly") {
    // 64-dim vectors so the lattice centroids apply
    val mk = (seed: Int) => (0 until 64).map(d => math.sin(seed * 64 + d).abs + 0.01)
    val d = emb((0L until 10L).map(i => i -> mk(i.toInt)): _*)
    val res = AnnSearch.ivfTopK(d, col("vec_id") < 2, 3).collect()
    // every query returns at most k candidates, none is itself
    val byQuery = res.groupBy(_.getAs[Long]("query_id"))
    byQuery.foreach { case (q, rows) =>
      assert(rows.length <= 3)
      assert(!rows.exists(_.getAs[Long]("neighbor_id") == q))
      assert(rows.map(_.getAs[Int]("rnk")).sorted.toSeq == (1 to rows.length))
    }
  }

  test("knnGraph equals ivfTopK with every vector as a query") {
    val rnd = new scala.util.Random(23)
    val d = (0L until 40L).map { i =>
      (i, Seq.fill(8)(rnd.nextDouble() * 2 - 1))
    }.toDF("vec_id", "embedding")
    val graph = AnnSearch.knnGraph(d, 3)
      .select("query_id", "neighbor_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val ref = AnnSearch.ivfTopK(d, lit(true), 3)
      .select("query_id", "neighbor_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(graph == ref)
    // contract: no self edges, at most k per query, ranks start at 1
    val byQ = graph.groupBy(_._1)
    assert(graph.forall { case (q, n, _) => q != n })
    assert(byQ.values.forall(_.size <= 3))
    assert(byQ.values.forall(_.map(_._3).min == 1))
  }

  test("knnGraphLearned recalls at least as much of the true top-k as the lattice graph") {
    // clustered corpus the fixed lattice planes don't fit: 4 tight
    // clusters at seeded random directions — learned centroids should
    // bucket each cluster whole, the lattice may split them.
    val rnd = new scala.util.Random(7)
    val centers = (0 until 4).map(_ => Seq.fill(8)(rnd.nextDouble() * 2 - 1))
    val d = (0L until 60L).map { i =>
      val c = centers((i % 4).toInt)
      (i, c.map(x => x + rnd.nextDouble() * 0.05))
    }.toDF("vec_id", "embedding")
    val k = 3
    val v = AnnSearch.vectors(d)
    val truth = AnnSearch.bruteForceTopK(v, v, k)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def hits(g: org.apache.spark.sql.DataFrame): Int =
      g.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).count(truth)
    val lattice = hits(AnnSearch.knnGraph(d, k))
    val learned = hits(AnnSearch.knnGraphLearned(d, k, iters = 3, dim = 8))
    assert(learned >= lattice,
      s"learned recall $learned < lattice $lattice (of ${truth.size} true edges)")
    // and the learned graph honors the shared graph contract
    val g = AnnSearch.knnGraphLearned(d, k, iters = 3, dim = 8).collect()
    val byQ = g.groupBy(_.getAs[Long]("query_id"))
    assert(g.forall(r => r.getAs[Long]("query_id") != r.getAs[Long]("neighbor_id")))
    assert(byQ.values.forall(_.length <= k))
    assert(byQ.values.forall(_.map(_.getAs[Int]("rnk")).min == 1))
  }

  test("pqAssignLearned never fits worse than the lattice codebooks and is deterministic") {
    val rnd = new scala.util.Random(13)
    val d = (0L until 80L).map { i =>
      (i, Seq.fill(64)(rnd.nextDouble() * 0.6 - 0.3))
    }.toDF("vec_id", "embedding")
    def totalErr(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum("sq_err")).collect()(0).getLong(0)
    val lattice = totalErr(AnnSearch.pqAssign(d))
    val learned = totalErr(AnnSearch.pqAssignLearned(d))
    // Lloyd monotonicity: recompute + reassign can only shrink the
    // total residual vs the iteration-0 (lattice) codebooks (exact up
    // to the 1-ulp truncating quantization of centroid cells)
    assert(learned <= lattice, s"learned $learned > lattice $lattice")
    // deterministic under repartitioning (exact integer pipeline)
    val a = AnnSearch.pqAssignLearned(d).orderBy("vec_id").collect().toSeq
    val b = AnnSearch.pqAssignLearned(d.repartition(7)).orderBy("vec_id")
      .collect().toSeq
    assert(a == b)
  }

  test("embeddingNearDups finds a duplicated vector pair via LSH buckets") {
    val a = (0 until 64).map(i => math.cos(i * 0.7) * 0.3)
    val b = (0 until 64).map(i => math.sin(i * 1.3) * 0.3)
    val d = emb(0L -> a, 1L -> a, 2L -> b) // 0 and 1 identical
    val res = AnnSearch.embeddingNearDups(d).as[(Long, Long, Double)].collect()
    assert(res.exists(r => r._1 == 0L && r._2 == 1L && r._3 > 0.999))
  }

  test("embeddingNearDupsCapped star-expands hot buckets, keeps small ones exact") {
    val a = (0 until 64).map(i => math.cos(i * 0.7) * 0.3)
    val b = (0 until 64).map(i => math.sin(i * 1.3) * 0.3)
    // ids 0-4: five copies of `a` -> same bucket in every table, over
    // the cap of 4; ids 10-11: two copies of `b` -> under the cap
    val d = emb(((0L to 4L).map(i => i -> a) ++ Seq(10L -> b, 11L -> b)): _*)
    val capped = AnnSearch.embeddingNearDupsCapped(d, maxBucket = 4).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    // hot bucket: every member pairs with the min-id representative...
    assert((1L to 4L).forall(i => capped.contains(0L -> i)))
    // ...and NO non-representative pair inside the hot bucket survives
    assert(!capped.exists(p => p._1 >= 1L && p._1 <= 4L && p._2 <= 4L))
    // the small bucket keeps its exact all-pairs edge
    assert(capped.contains(10L -> 11L))
    // with the cap above every bucket size, output equals the exact variant
    val exact = AnnSearch.embeddingNearDups(d).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    val wide = AnnSearch.embeddingNearDupsCapped(d, maxBucket = 1000).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(wide == exact)
  }

  test("pqAssign matches a plain-Scala argmin replay and is deterministic") {
    val subspaces = 8
    val codebook = 16
    val subDim = LlmDataParams.embDim / subspaces
    val mk = (seed: Int) => (0 until 64).map(d => math.sin(seed * 64 + d) * 0.5)
    val d = emb((0L until 12L).map(i => i -> mk(i.toInt)): _*)
    val out = AnnSearch.pqAssign(d).collect().sortBy(_.getAs[Long]("vec_id"))
    assert(out.length == 12)
    out.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      val vi = mk(id.toInt).map(x => math.floor(x * 1000000).toLong)
      var expectedErr = 0L
      (0 until subspaces).foreach { m =>
        val scores = (0 until codebook).map { j =>
          val cents = AnnSearch.pqCentroid(m, j, subDim)
          (0 until subDim).map { dd =>
            val diff = vi(m * subDim + dd) - cents(dd)
            diff * diff
          }.sum
        }
        val expectedCode = scores.indexOf(scores.min) + 1 // first-wins, 1-based
        assert(r.getAs[Int](s"code_${m + 1}") == expectedCode,
          s"vec $id subspace $m: got ${r.getAs[Int](s"code_${m + 1}")}, want $expectedCode")
        assert(r.getAs[Int](s"code_${m + 1}") >= 1 && r.getAs[Int](s"code_${m + 1}") <= codebook)
        expectedErr += scores.min
      }
      assert(r.getAs[Long]("sq_err") == expectedErr)
    }
    // deterministic under repartitioning (pure projection, no shuffle state)
    val out2 = AnnSearch.pqAssign(d.repartition(5)).collect().sortBy(_.getAs[Long]("vec_id"))
    assert(out.map(_.toSeq).toSeq == out2.map(_.toSeq).toSeq)
  }

  test("pqTopK ranks by the exact sum of code-table lookups") {
    val subspaces = 8
    val codebook = 16
    val subDim = LlmDataParams.embDim / subspaces
    val mk = (seed: Int) => (0 until 64).map(d => math.sin(seed * 64 + d) * 0.5)
    val n = 15
    val d = emb((0L until n.toLong).map(i => i -> mk(i.toInt)): _*)
    val res = AnnSearch.pqTopK(d, col("vec_id") < 2, 4).collect()
    // plain-Scala ADC replay: codes for every vector, tables for queries
    def vi(seed: Int) = mk(seed).map(x => math.floor(x * 1000000).toLong)
    def scoreArr(v: Seq[Long], m: Int): Seq[Long] =
      (0 until codebook).map { j =>
        val cents = AnnSearch.pqCentroid(m, j, subDim)
        (0 until subDim).map { dd =>
          val diff = v(m * subDim + dd) - cents(dd); diff * diff
        }.sum
      }
    val codes = (0 until n).map { i =>
      (0 until subspaces).map { m =>
        val a = scoreArr(vi(i), m); a.indexOf(a.min)
      }
    }
    (0L until 2L).foreach { q =>
      val tables = (0 until subspaces).map(m => scoreArr(vi(q.toInt), m))
      val expected = (0 until n).filter(_ != q)
        .map(i => i.toLong -> (0 until subspaces).map(m => tables(m)(codes(i)(m))).sum)
        .sortBy { case (id, dist) => (dist, id) }.take(4)
      val got = res.filter(_.getAs[Long]("query_id") == q).sortBy(_.getAs[Int]("rnk"))
        .map(r => r.getAs[Long]("neighbor_id") -> r.getAs[Long]("adc_dist")).toSeq
      assert(got == expected, s"query $q")
    }
  }

  test("ivfPqTopK ranks candidates from the probed buckets by exact ADC distance") {
    val subspaces = 8
    val codebook = 16
    val subDim = LlmDataParams.embDim / subspaces
    val mk = (seed: Int) => (0 until 64).map(d => math.sin(seed * 64 + d) * 0.5)
    val n = 15
    val d = emb((0L until n.toLong).map(i => i -> mk(i.toInt)): _*)
    val res = AnnSearch.ivfPqTopK(d, col("vec_id") < 2, 4).collect()
    def vi(seed: Int) = mk(seed).map(x => math.floor(x * 1000000).toLong)
    def scoreArr(v: Seq[Long], m: Int): Seq[Long] =
      (0 until codebook).map { j =>
        val cents = AnnSearch.pqCentroid(m, j, subDim)
        (0 until subDim).map { dd =>
          val diff = v(m * subDim + dd) - cents(dd); diff * diff
        }.sum
      }
    val codes = (0 until n).map { i =>
      (0 until subspaces).map { m =>
        val a = scoreArr(vi(i), m); a.indexOf(a.min)
      }
    }
    // buckets from the library's own assignment (the replay under test
    // is the ADC ranking on top of them)
    val bucketOf = AnnSearch.kmeansAssign(d).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("bucket")).toMap
    val byQuery = res.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.keySet == Set(0L, 1L))
    byQuery.foreach { case (q, rows) =>
      val tables = (0 until subspaces).map(m => scoreArr(vi(q.toInt), m))
      val probed = rows.map(r => bucketOf(r.getAs[Long]("neighbor_id"))).toSet
      assert(probed.size <= 2, s"query $q probed ${probed.size} buckets")
      val sorted = rows.sortBy(_.getAs[Int]("rnk"))
      assert(sorted.map(_.getAs[Int]("rnk")).toSeq == (1 to rows.length))
      sorted.foreach { r =>
        val nb = r.getAs[Long]("neighbor_id")
        assert(nb != q)
        val expected = (0 until subspaces).map(m => tables(m)(codes(nb.toInt)(m))).sum
        assert(r.getAs[Long]("adc_dist") == expected, s"query $q neighbor $nb")
      }
      val ds = sorted.map(_.getAs[Long]("adc_dist"))
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b })
    }
  }

  test("ivfPqRerankTopK re-ranks the ADC shortlist exactly and never loses recall vs plain ADC") {
    val mk = (seed: Int) => (0 until 64).map(d => math.sin(seed * 64 + d) * 0.5)
    val n = 30
    val k = 3
    val kPrime = 9
    val d = emb((0L until n.toLong).map(i => i -> mk(i.toInt)): _*)
    val qf = col("vec_id") < 4
    def pairs(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      df.orderBy("query_id", "rnk").collect()
        .groupBy(_.getAs[Long]("query_id"))
        .view.mapValues(_.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Long]("neighbor_id")).toSeq)
        .toMap
    val v = AnnSearch.vectors(d)
    val exact = pairs(AnnSearch.bruteForceTopK(v, v.filter(qf), k))
    val adc = pairs(AnnSearch.ivfPqTopK(d, qf, k))
    val shortlist = pairs(AnnSearch.ivfPqTopK(d, qf, kPrime))
    val rr = pairs(AnnSearch.ivfPqRerankTopK(d, qf, k, kPrime))
    // true cosines for the exactness check
    val vecs = (0 until n).map(i => mk(i).toArray)
    def cos(a: Int, b: Int): Double = {
      val (x, y) = (vecs(a), vecs(b))
      val dot = x.zip(y).map { case (p, q) => p * q }.sum
      dot / (math.sqrt(x.map(p => p * p).sum) * math.sqrt(y.map(p => p * p).sum))
    }
    rr.keySet.foreach { q =>
      // the re-rank output IS the best-k of the shortlist by true cosine
      val best = shortlist(q).sortBy(nb => (-cos(q.toInt, nb.toInt), nb)).take(k)
      assert(rr(q) == best, s"query $q: rerank != true-cosine top-k of shortlist")
      // guaranteed: rerank recall >= ADC recall per query
      val hitsRr = rr(q).toSet.intersect(exact(q).toSet).size
      val hitsAdc = adc(q).toSet.intersect(exact(q).toSet).size
      assert(hitsRr >= hitsAdc, s"query $q: rerank recall $hitsRr < adc $hitsAdc")
    }
    assert(rr.keySet == Set(0L, 1L, 2L, 3L))
  }

  test("semanticNearDups prunes the higher id of a near-identical pair, keeps distinct vectors") {
    // distinct full-sphere directions (pairwise cos ~0), plus vec 5 as
    // an exact duplicate of vec 1 — identical vectors get identical
    // k-means scores, so they share a bucket by construction, and the
    // only pair above a 0.999 threshold is (1, 5)
    val mk = (i: Int) => (0 until 64).map(d => math.sin(i * 64 + d))
    val d = emb(0L -> mk(0), 1L -> mk(1), 2L -> mk(2), 3L -> mk(3),
      5L -> mk(1))
    val r = AnnSearch.semanticNearDups(d, threshold = 0.999).collect()
      .map(x => x.getAs[Long]("vec_id") -> x.getAs[Boolean]("removed")).toMap
    assert(r.size == 5)
    assert(r(5L))        // duplicate with a lower-id twin -> removed
    assert(!r(1L))       // the lower id survives
    assert(!r(0L) && !r(2L) && !r(3L))
  }

  test("prototypePrune drops the top quarter of each cluster by centroid cosine") {
    // two tight clusters; within each, lower ids sit closer to the core
    val mkA = (i: Int) => (0 until 64).map(d => 0.4 + 0.002 * i * (d % 3))
    val mkB = (i: Int) => (0 until 64).map(d => -0.4 - 0.002 * i * (d % 5))
    val rows = (0L until 8L).map(i => i -> mkA(i.toInt)) ++
      (8L until 16L).map(i => i -> mkB(i.toInt))
    val d = emb(rows: _*)
    val out = AnnSearch.prototypePrune(d, kc = 2, iters = 3, dim = 64).collect()
    assert(out.length == 16)
    val byBucket = out.groupBy(_.getAs[Int]("bucket"))
    assert(byBucket.size == 2)
    byBucket.foreach { case (_, rs) =>
      val n = rs.length
      assert(rs.head.getAs[Long]("n_bucket") == n)
      val pruned = rs.filter(_.getAs[Boolean]("pruned"))
      assert(pruned.length == n / 4, s"pruned ${pruned.length} of $n")
      // pruned = exactly the lowest ranks (most prototypical)
      assert(pruned.map(_.getAs[Int]("rnk")).sorted.toSeq == (1 to n / 4))
      // ranks ordered by descending cosine
      val sorted = rs.sortBy(_.getAs[Int]("rnk"))
      val cs = sorted.map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
    // deterministic under repartitioning
    val out2 = AnnSearch.prototypePrune(d.repartition(7), kc = 2, iters = 3, dim = 64)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("pruned")).toMap
    assert(out.map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("pruned")).toMap == out2)
  }

  test("ivfRecall reports per-query overlap with the exact top-k") {
    val mk = (seed: Int) => (0 until 64).map(d => math.sin(seed * 64 + d).abs + 0.01)
    val d = emb((0L until 12L).map(i => i -> mk(i.toInt)): _*)
    val res = AnnSearch.ivfRecall(d, col("vec_id") < 3, 3).collect()
      .map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("n_hits"), r.getAs[Double]("recall"))).sortBy(_._1)
    assert(res.map(_._1).toSeq == Seq(0L, 1L, 2L)) // every query reported
    res.foreach { case (_, h, rec) =>
      assert(h >= 0L && h <= 3L)
      assert(math.abs(rec - h / 3.0) < 1e-12)
    }
    // sanity: replay recall directly from the two operators
    val v = AnnSearch.vectors(d)
    val exact = AnnSearch.bruteForceTopK(v, v.filter(col("vec_id") < 3), 3).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = AnnSearch.ivfTopK(d, col("vec_id") < 3, 3).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val expected = exact.intersect(approx).groupBy(_._1).view.mapValues(_.size.toLong).toMap
    res.foreach { case (q, h, _) => assert(h == expected.getOrElse(q, 0L), s"query $q") }
  }

  test("crossCorpusEmbeddingDups pairs new vectors with the reference only") {
    val a = (0 until 64).map(i => math.cos(i * 0.7) * 0.3)
    val b = (0 until 64).map(i => math.sin(i * 1.3) * 0.3)
    // new corpus: 0 (dup of ref 10), 1 (unique); ref: 10, 11, plus 12
    // duplicating 11 — the ref-internal pair must NOT appear
    val fresh = emb(0L -> a, 1L -> b.map(-_))
    val ref = emb(10L -> a, 11L -> b, 12L -> b)
    val res = AnnSearch.crossCorpusEmbeddingDups(fresh, ref).collect()
      .map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("ref_id"), r.getAs[Double]("cos")))
    assert(res.exists(p => p._1 == 0L && p._2 == 10L && p._3 > 0.999))
    // no ref-ref or new-new pairs
    assert(res.forall(p => Set(0L, 1L).contains(p._1) && Set(10L, 11L, 12L).contains(p._2)))
    // the ref-internal near-dup (11, 12) must not surface in either
    // orientation — the reference side is never self-paired
    assert(!res.exists(p => Set(p._1, p._2) == Set(11L, 12L)))
  }

  test("lshKeys emits one bucket per table per vector") {
    val d = emb(0L -> (0 until 64).map(_.toDouble / 64))
    val keys = AnnSearch.lshKeys(d).select("tbl", "bucket").collect()
    assert(keys.length == LlmDataParams.lshTables)
    keys.foreach { r =>
      val bucket = r.getAs[Int]("bucket")
      assert(bucket >= 0 && bucket < (1 << LlmDataParams.lshBits))
    }
  }

  test("PqCodesExpression matches the interpreted HOF spelling incl. null/short edges") {
    val (subspaces, codebook) = (8, 16)
    val subDim = LlmDataParams.embDim / subspaces
    val mk = (seed: Int) => (0 until 64).map(d =>
      java.lang.Long.valueOf(math.floor(math.sin(seed * 64 + d) * 500000).toLong))
    val rows: Seq[(Long, Seq[java.lang.Long])] = Seq(
      0L -> mk(0), 1L -> mk(1),
      2L -> mk(2).updated(3 * subDim + 2, null: java.lang.Long), // null poisons subspace 4
      3L -> mk(3).take(30),                                      // short: subspaces 4..8 poisoned
      4L -> Seq.empty[java.lang.Long])                           // all subspaces poisoned
    val d = rows.toDF("vec_id", "vi")
    // the pre-kernel spelling, verbatim
    def scoreArr(m: Int): String = {
      val cents = (0 until codebook)
        .map(j => s"array(${AnnSearch.pqCentroid(m, j, subDim).map(v => s"${v}L").mkString(", ")})")
        .mkString(", ")
      s"""transform(array($cents),
         | c -> aggregate(zip_with(slice(vi, ${m * subDim + 1}, $subDim), c,
         |   (x, y) -> (x - y) * (x - y)),
         |   cast(0 as bigint), (acc, x) -> acc + x))""".stripMargin.replace("\n", "")
    }
    val codebookM = (0 until subspaces).map(m =>
      (0 until codebook).map(j => AnnSearch.pqCentroid(m, j, subDim): Seq[Long]))
    val hofCols = (0 until subspaces).flatMap { m =>
      val arr = scoreArr(m)
      Seq(expr(s"cast(array_position($arr, array_min($arr)) as int)").as(s"hof_code_${m + 1}"),
        expr(arr).as(s"hof_table_${m + 1}"))
    } :+ (0 until subspaces).map(m => expr(s"array_min(${scoreArr(m)})"))
      .reduce(_ + _).cast("long").as("hof_sq_err")
    val out = d
      .withColumn("__pq", PqKernelExpressions.pqCodes(col("vi"), codebookM, withTables = true))
      .select(Seq(col("vec_id"), col("__pq.sq_err").as("k_sq_err")) ++
        (1 to subspaces).flatMap(m => Seq(
          element_at(col("__pq.codes"), m).as(s"k_code_$m"),
          element_at(col("__pq.tables"), m).as(s"k_table_$m"))) ++ hofCols: _*)
      .collect()
    assert(out.length == rows.length)
    out.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      assert(r.getAs[Any]("k_sq_err") == r.getAs[Any]("hof_sq_err"), s"vec $id sq_err")
      (1 to subspaces).foreach { m =>
        assert(r.getAs[Any](s"k_code_$m") == r.getAs[Any](s"hof_code_$m"), s"vec $id code_$m")
        assert(r.getAs[scala.collection.Seq[Any]](s"k_table_$m") == r.getAs[scala.collection.Seq[Any]](s"hof_table_$m"),
          s"vec $id table_$m")
      }
    }
    // the poisoned rows really do exercise the null paths
    val byId = out.map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(byId(2L).getAs[Any]("k_code_4") == null && byId(2L).getAs[Any]("k_code_3") != null)
    assert(byId(2L).getAs[Any]("k_sq_err") == null)
    assert(byId(3L).getAs[Any]("k_code_3") != null && byId(3L).getAs[Any]("k_code_5") == null)
    assert((1 to subspaces).forall(m => byId(4L).getAs[Any](s"k_code_$m") == null))
  }

  test("CentroidDotScoresExpression matches the HOF spelling bit-exactly incl. edges") {
    val dim = 16
    val mk = (seed: Int) => (0 until dim).map(d =>
      java.lang.Long.valueOf((math.sin(seed * dim + d) * 1000000).toLong))
    val rows: Seq[(Long, Seq[java.lang.Long])] = Seq(
      0L -> mk(0), 1L -> mk(1),
      2L -> mk(2).updated(5, null: java.lang.Long), // null element -> all scores null
      3L -> mk(3).take(10))                         // wrong length -> all scores null
    val d = rows.toDF("vec_id", "vi")
    val state: Seq[(Seq[Long], Long)] = (0 until 5).map(j =>
      ((0 until dim).map(dd => ((j + 1) * 1000L + dd * 37L) * (if (dd % 2 == 0) 1 else -1)),
        j * 3L + 2L))
    val hofTerms = state.map { case (s, c) =>
      s"""cast(aggregate(zip_with(vi, cast(array(${s.mkString(",")}) as array<bigint>),
         | (x, y) -> x * y), cast(0 as bigint), (a, x) -> a + x) as double)
         | / cast($c as double)""".stripMargin.replace("\n", "")
    }
    val out = d
      .select(col("vec_id"),
        PqKernelExpressions.centroidDotScores(col("vi"), state).as("k_scores"),
        expr(s"array(${hofTerms.mkString(", ")})").as("hof_scores"))
      .collect()
    out.foreach { r =>
      val ks = r.getAs[scala.collection.Seq[Any]]("k_scores")
      val hs = r.getAs[scala.collection.Seq[Any]]("hof_scores")
      // exact equality: the dot is integer, the cast+divide identical IEEE ops
      assert(ks == hs, s"vec ${r.getLong(0)}: $ks vs $hs")
    }
    val byId = out.map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(byId(2L).getAs[scala.collection.Seq[Any]]("k_scores").forall(_ == null))
    assert(byId(3L).getAs[scala.collection.Seq[Any]]("k_scores").forall(_ == null))
    assert(byId(0L).getAs[scala.collection.Seq[Any]]("k_scores").forall(_ != null))
  }

  test("rrfFuse rewards consensus, handles single-list candidates, caps topK") {
    import spark.implicits._
    // list A ranks 10,11,12; list B ranks 11,10,13 for query 0
    val a = Seq((0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3))
      .toDF("query_id", "neighbor_id", "rnk")
    val b = Seq((0L, 11L, 1), (0L, 10L, 2), (0L, 13L, 3))
      .toDF("query_id", "neighbor_id", "rnk")
    val out = AnnSearch.rrfFuse(Seq(a, b), kRrf = 60, topK = 3).collect()
      .sortBy(_.getAs[Int]("rnk"))
    assert(out.length == 3) // 4 candidates, capped at 3
    def micro(r: Int) = math.floor(1000000.0 / (60 + r) + 0.5).toLong
    val byN = out.map(r => r.getAs[Long]("neighbor_id") ->
      (r.getAs[Int]("rnk"), r.getAs[Long]("n_lists"), r.getAs[Long]("rrf_micro"))).toMap
    // both-list docs beat any single-list doc; 10 and 11 tie in score
    // ((1,2) vs (2,1)), tie broken to the smaller neighbor id
    assert(byN(10L) == ((1, 2L, micro(1) + micro(2))))
    assert(byN(11L) == ((2, 2L, micro(2) + micro(1))))
    // rank 3 is one of the single-list docs with the rank-3 score
    assert(byN(12L) == ((3, 1L, micro(3)))) // 12 < 13, same score
    assert(!byN.contains(13L))
  }

  test("knnPageRank concentrates rank on the hub of a star neighborhood") {
    // satellites perturbed along DISTINCT axes: cos(sat_i, sat_j) =
    // (1 +- eps_i*eps_j) / (N_i * N_j) < cos(sat_i, hub) = 1 / N_i for
    // every pair, so each satellite's NEAREST neighbor is provably the
    // hub; k = 2 so mass splits (k = 1 would make hub<->nearest-sat a
    // pure 2-cycle whose mass alternates with iteration parity) —
    // the hub draws half of every satellite's mass each round
    val d = emb(
      0L -> Seq(1.0, 0.0, 0.0, 0.0),
      1L -> Seq(1.0, 0.02, 0.0, 0.0), 2L -> Seq(1.0, -0.05, 0.0, 0.0),
      3L -> Seq(1.0, 0.0, 0.03, 0.0), 4L -> Seq(1.0, 0.0, -0.06, 0.0),
      5L -> Seq(1.0, 0.0, 0.0, 0.04), 6L -> Seq(1.0, 0.0, 0.0, -0.07))
    val ranks = AnnSearch.knnPageRank(d, k = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks.size == 7)
    // every node keeps at least the restart floor
    assert(ranks.values.forall(_ >= 150000L))
    (1L to 6L).foreach(i =>
      assert(ranks(0L) > ranks(i), s"hub ${ranks(0L)} vs $i=${ranks(i)}"))
    // deterministic under repartitioning
    val again = AnnSearch.knnPageRank(d.repartition(5), k = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == ranks)
  }

  test("knnPageRankResiduals: ranks match the plain variant, residual shrinks monotonically") {
    val d = emb(
      0L -> Seq(1.0, 0.0, 0.0, 0.0),
      1L -> Seq(1.0, 0.02, 0.0, 0.0), 2L -> Seq(1.0, -0.05, 0.0, 0.0),
      3L -> Seq(1.0, 0.0, 0.03, 0.0), 4L -> Seq(1.0, 0.0, -0.06, 0.0),
      5L -> Seq(1.0, 0.0, 0.0, 0.04), 6L -> Seq(1.0, 0.0, 0.0, -0.07))
    val (ranksDf, residuals) = AnnSearch.knnPageRankResiduals(d, k = 2, iters = 4)
    val ranks = ranksDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // bit-identical to the un-instrumented operator at the same iters
    val plain = AnnSearch.knnPageRank(d, k = 2, iters = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks == plain)
    // the evidence the fixed iteration count exists to produce: the
    // max per-node rank change shrinks every iteration on the star
    // fixture (damping 0.85 contracts the update map)
    assert(residuals.length == 4)
    assert(residuals.head > 0L)
    residuals.sliding(2).foreach { case Seq(a, b) =>
      assert(b < a, s"residuals not shrinking: $residuals")
    }
    // geometric contraction: with k = 2 and damping 0.85 each node
    // recirculates <= 0.425 of its mass, so 4 steps cut the residual
    // by >= ~5x (measured ~10x on this star)
    assert(residuals.last * 4 < residuals.head, s"residuals $residuals")
    // and the instrument answers "how many iterations DO stabilize
    // this graph": at 8 the max per-node movement is under 1% of the
    // unit mass — measured, not assumed
    val (_, r8) = AnnSearch.knnPageRankResiduals(d, k = 2, iters = 8)
    assert(r8.last < 10000L, s"residuals $r8")
  }

  test("topComponent finds the dominant axis of an anisotropic cloud") {
    // variance concentrated on axis 1 (scale 10x the noise axes)
    val d = emb((0L until 30L).map { i =>
      val a = if (i % 2 == 0) 1.0 else -1.0
      i -> Seq(0.9 * a + 0.01 * (i % 3), 0.05 * (i % 5 - 2), 0.04 * (i % 7 - 3), 0.03)
    }: _*)
    val w = AnnSearch.topComponent(d, iters = 8, dim = 4)
    assert(w.size == 4)
    // L-inf renorm: the dominant coordinate carries the 1000
    assert(math.abs(w(0)) == 1000L, s"direction $w")
    assert(w.drop(1).forall(c => math.abs(c) < 300L), s"direction $w")
  }

  test("projectionOutliers flags far-from-median vectors per label, exact MAD") {
    // label A: a tight cluster along axis 1 plus one far outlier;
    // label B: tight, no outlier. dim 4, projection ~ axis-1 coord.
    val rows = (0L until 9L).map(i =>
        (i, Seq(1.0 + 0.001 * i, 0.0, 0.0, 0.0), "A")) ++
      Seq((9L, Seq(-5.0, 0.0, 0.0, 0.0), "A")) ++
      (10L until 15L).map(i => (i, Seq(0.5 + 0.001 * (i - 10), 0.0, 0.0, 0.0), "B"))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val out = AnnSearch.projectionOutliers(emb, dim = 4).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[String]("label"), r.getAs[Boolean]("outlier")))).toMap
    assert(out.size == 15)
    assert(out(9L) == (("A", true)), s"far vector not flagged: $out")
    (0L until 9L).foreach(i => assert(!out(i)._2, s"tight vector $i flagged"))
    (10L until 15L).foreach(i => assert(!out(i)._2, s"label B vector $i flagged"))
    // deterministic under layout
    val again = AnnSearch.projectionOutliers(emb.repartition(5), dim = 4)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("outlier")).toMap
    assert(again == out.view.mapValues(_._2).toMap)
  }

  test("topComponentProjection is the exact integer dot with the learned direction") {
    val d = emb(
      0L -> Seq(1.0, 0.0, 0.0, 0.0),
      1L -> Seq(-1.0, 0.0, 0.0, 0.0),
      2L -> Seq(0.5, 0.2, 0.0, 0.0))
    val w = AnnSearch.topComponent(d, iters = 8, dim = 4)
    val proj = AnnSearch.topComponentProjection(d, iters = 8, dim = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def expected(v: Seq[Double]) =
      v.zip(w).map { case (x, wi) => math.floor(x * 1e6).toLong * wi }.sum
    assert(proj(0L) == expected(Seq(1.0, 0.0, 0.0, 0.0)))
    assert(proj(1L) == expected(Seq(-1.0, 0.0, 0.0, 0.0)))
    assert(proj(2L) == expected(Seq(0.5, 0.2, 0.0, 0.0)))
    // opposite vectors project to opposite values
    assert(proj(0L) == -proj(1L))
  }

  test("pca2: direction 1 is topComponent, direction 2 near-orthogonal on the second axis") {
    // variance on axis 1 (10x) and axis 2 (3x) over two noise axes
    val d = emb((0L until 40L).map { i =>
      val a = if (i % 2 == 0) 1.0 else -1.0
      val b = if (i % 4 < 2) 1.0 else -1.0
      i -> Seq(0.9 * a + 0.01 * (i % 3), 0.3 * b + 0.005 * (i % 5),
        0.02 * (i % 7 - 3), 0.01)
    }: _*)
    val (w1, w2) = AnnSearch.pca2Directions(d, iters = 8, dim = 4)
    assert(w1 == AnnSearch.topComponent(d, iters = 8, dim = 4))
    // second direction lands on axis 2, not re-finding axis 1
    assert(math.abs(w2(1)) == 1000L, s"w2 $w2")
    assert(math.abs(w2(0)) < 300L, s"w2 $w2")
    // near-orthogonality bounded by the truncation grain, not float drift
    val dot = w1.zip(w2).map { case (a, b) => a * b }.sum.toDouble
    val cos = dot / math.sqrt(w1.map(x => x * x).sum.toDouble *
      w2.map(x => x * x).sum.toDouble)
    assert(math.abs(cos) < 0.05, s"cos(w1, w2) = $cos")
    // projections are the exact integer dots with both directions
    val proj = AnnSearch.pca2Projection(d, iters = 8, dim = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val top = AnnSearch.topComponentProjection(d, iters = 8, dim = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    proj.foreach { case (id, (p1, _)) =>
      assert(p1 == top(id), s"vec $id: proj1 $p1 vs topComponent ${top(id)}")
    }
  }

  test("knnMutual keeps exactly the reciprocal pairs of the graph") {
    val rnd = new scala.util.Random(31)
    val d = (0L until 40L).map { i =>
      (i, Seq.fill(8)(rnd.nextDouble() * 2 - 1))
    }.toDF("vec_id", "embedding")
    val edges = AnnSearch.knnGraph(d, 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mutual = AnnSearch.knnMutual(d, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // definition check against the raw graph, pair by pair
    val expected = edges.filter { case (a, b) =>
      a < b && edges.contains((b, a))
    }
    assert(mutual.toSet == expected, s"got ${mutual.toSet}")
    assert(mutual.length == mutual.distinct.length)
    // fixture sanity: some one-directional edges must exist and be cut
    assert(expected.size < edges.count { case (a, b) => a < b },
      "fixture too weak: every edge is mutual")
    assert(expected.nonEmpty, "fixture too weak: no mutual pair")
  }

  test("ANN-backed hybrid fuses identically to the exact hybrid wherever index top-k == exact") {
    // VERDICT r13 §next-6: fusion consumes only RANKS, so swapping the
    // exact dense retriever for the IVF index must change nothing for
    // any query whose index top-k equals the exact top-k — and the
    // queries where that holds are exactly the recall-1.0 rows of the
    // existing ann_recall machinery.
    val rnd = new scala.util.Random(5)
    val d = (0L until 60L).map { i =>
      (i, Seq.fill(8)(rnd.nextDouble() * 2 - 1))
    }.toDF("vec_id", "embedding")
    val v = AnnSearch.vectors(d)
    val qf = col("vec_id") < 12
    val k = 5
    val brute = AnnSearch.bruteForceTopK(v, v.filter(qf), k)
      .select("query_id", "neighbor_id", "rnk")
    val ivf = AnnSearch.ivfTopK(d, qf, k)
      .select("query_id", "neighbor_id", "rnk")
    def ranking(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    val bm = ranking(brute)
    val im = ranking(ivf)
    val queries = bm.keys.map(_._1).toSet
    val matched = queries.filter(q =>
      (1 to k).forall(r => bm.get((q, r)) == im.get((q, r))))
    // matched == the recall-1.0 queries of ivfRecall (sets equal =>
    // same cosine-desc order => ranks equal)
    val rec = AnnSearch.ivfRecall(d, qf, k).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("recall")).toMap
    assert(matched == rec.filter(_._2 == 1.0).keySet, s"$matched vs $rec")
    // a synthetic-but-deterministic lexical list (fusion is agnostic
    // to where ranks come from)
    val lex = brute.withColumn("rnk", (lit(k + 1) - col("rnk")).cast("int"))
    val fuseExact = AnnSearch.rrfFuse(Seq(lex, brute), topK = k).collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> (r.getLong(1), r.getLong(4)))
      .toMap
    val fuseAnn = AnnSearch.rrfFuse(Seq(lex, ivf), topK = k).collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> (r.getLong(1), r.getLong(4)))
      .toMap
    matched.foreach { q =>
      (1 to k).foreach { r =>
        assert(fuseExact.get((q, r)) == fuseAnn.get((q, r)),
          s"fused rank $r of matched query $q diverged")
      }
    }
    // fixture sanity: parity must be claimed over a non-trivial split
    assert(matched.nonEmpty, "fixture too weak: index never exact")
    assert(matched != queries, "fixture too weak: index always exact")
  }
}
