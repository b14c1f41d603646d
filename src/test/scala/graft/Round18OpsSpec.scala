package graft

import org.apache.spark.sql.functions._

import graft.enrich.GroupStats
import graft.llmdata.{AnnSearch, EmbeddingOps, TextAnalysis}

/** Semantic pins for the round-18 operators (the catalog oracles
  * carry the exactness story; these pin the invariants). */
class Round18OpsSpec extends SparkSpec {
  import spark.implicits._

  test("queryLikelihoodTopK: hand-computed Dirichlet scores, absent terms count") {
    // corpus: d1 = "a a b", d2 = "b c c c", query = (a, c); |C| = 7
    val docs = Seq((1L, "a a b"), (2L, "b c c c")).toDF("doc_id", "text")
    val out = TextAnalysis.queryLikelihoodTopK(docs, Seq("a", "c"),
        k = 10, mu = 10)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    def contrib(tf: Long, cf: Long, dl: Long): Long =
      math.floor(math.log((tf + 10.0 * cf / 7.0) / (dl + 10.0))
        * 1e6 + 0.5).toLong
    // d1: a present (tf 2, cf 2), c absent (tf 0, cf 3); dl 3
    assert(out(1L) == ((1L, contrib(2, 2, 3) + contrib(0, 3, 3))))
    // d2: a absent, c present (tf 3); dl 4
    assert(out(2L) == ((1L, contrib(0, 2, 4) + contrib(3, 3, 4))))
  }

  test("queryLikelihoodTopK: zero-corpus-frequency query terms are dropped") {
    val docs = Seq((1L, "a b"), (2L, "b b")).toDF("doc_id", "text")
    val out = TextAnalysis.queryLikelihoodTopK(docs, Seq("a", "zzz"), k = 10)
      .collect()
    // only docs hitting 'a' are candidates; 'zzz' contributes nothing
    assert(out.map(_.getLong(1)).toSet == Set(1L))
    assert(out.head.getLong(2) == 1L) // n_hit_terms counts only real hits
  }

  test("sourceLexicalStats: exact hapax/dis/type counts per source") {
    val docs = Seq(
      (1L, "a a b c", "s1"), (2L, "c d", "s1"),
      (3L, "x x x x", "s2")).toDF("doc_id", "text", "source")
    val out = TextAnalysis.sourceLexicalStats(docs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    // s1: tokens 6, types {a:2, b:1, c:2, d:1} = 4, hapax {b, d} = 2,
    // dis {a, c} = 2
    assert(out("s1") == ((6L, 4L, 2L, 2L, 4L * 1000000L / 6L,
      2L * 1000000L / 4L)))
    // s2: one type, count 4 — no hapax, no dis
    assert(out("s2") == ((4L, 1L, 0L, 0L, 250000L, 0L)))
  }

  test("radiusSearch: threshold boundary is quantized-inclusive; counts match") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),       // query
      (1L, Array(1.0f, 0.0f)),       // cos 1
      (2L, Array(1.0f, 1.0f)),       // cos ~0.7071068 -> 707107 micro
      (3L, Array(0.0f, 1.0f)),       // cos 0
      (4L, Array(-1.0f, 0.0f)))      // cos -1
      .toDF("vec_id", "embedding")
    val v = AnnSearch.vectors(vecs)
    val at707107 = AnnSearch.radiusSearch(v,
        v.filter(col("vec_id") === 0L), 707107L)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
    // the quantized cosine 707107 passes theta 707107 (inclusive)
    assert(at707107.map(_._1).toSet == Set(1L, 2L))
    assert(at707107.forall(_._3 == 2L)) // n_matches on every row
    val above = AnnSearch.radiusSearch(v,
        v.filter(col("vec_id") === 0L), 707108L)
      .collect().map(_.getLong(1)).toSet
    assert(above == Set(1L)) // one micro-unit higher excludes it
  }

  test("radiusSearchIvf: EXACTLY equals the brute radius search (lossless pruning)") {
    // two tight clusters + a spread shell + a zero-norm vector: the
    // pruning must drop far buckets yet reproduce brute row-for-row,
    // including threshold-boundary rows
    val vecs = (0L until 120L).map { i =>
      val arr =
        if (i == 119L) Array.fill(8)(0.0f) // no direction
        else {
          val base = Array.tabulate(8)(d =>
            if (d == (i % 4).toInt) 1.0f else 0.05f * ((i % 7) + 1))
          base.map(_ + (i % 11).toFloat * 1e-3f)
        }
      (i, arr)
    }.toDF("vec_id", "embedding")
    for (theta <- Seq(250000L, 700000L, 999999L)) {
      val brute = AnnSearch.radiusSearch(AnnSearch.vectors(vecs),
          AnnSearch.vectors(vecs).filter(col("vec_id") < 10L), theta)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getLong(3))).toSet
      val pruned = AnnSearch.radiusSearchIvf(vecs,
          col("vec_id") < 10L, theta)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getLong(3))).toSet
      assert(pruned == brute, s"pruned != brute at theta=$theta: " +
        s"missing=${(brute -- pruned).take(3)} extra=${(pruned -- brute).take(3)}")
    }
    spark.sharedState.cacheManager.clearCache()
  }

  test("curationVerdictsV6: budget_keep is exactly the quality-ordered prefix of the gated set") {
    import graft.llmdata.{Curation, TextAnalysis}
    val docs = (0L until 60L).map { i =>
      val body = if (i % 4 == 0) "the the the the the"
      else s"alpha beta gamma tok$i delta epsilon zeta eta theta iota words"
      (i, body, if (i % 3 == 0) "en" else "de", s"s${i % 2}")
    }.toDF("doc_id", "text", "lang", "source")
    val ev = docs.filter(col("doc_id") % 7 === 0).select("doc_id", "text")
    val budget = 150L
    val rows = Curation.curationVerdictsV6(docs, ev,
        Map("s0" -> 600000L, "s1" -> 600000L),
        target = col("lang") === "en", tokenBudget = budget)
      .collect()
    val qm = TextAnalysis.qualityScore(docs).collect()
      .map(r => r.getLong(0) ->
        math.floor(r.getDouble(6) * 1e6 + 0.5).toLong).toMap
    def gates(r: org.apache.spark.sql.Row): Boolean =
      (1 to 8).forall(r.getBoolean)
    val toks = rows.map(r => r.getLong(0) -> r.getLong(9)).toMap
    val ordered = rows.filter(gates).map(_.getLong(0))
      .sortBy(id => (-qm(id), id))
    var cum = 0L
    val expected = ordered.takeWhile { id =>
      cum += toks(id); cum <= budget
    }.toSet
    val budgetKept = rows.filter(_.getBoolean(10)).map(_.getLong(0)).toSet
    assert(budgetKept == expected,
      s"budget prefix mismatch: got $budgetKept expected $expected")
    rows.foreach { r =>
      assert(r.getBoolean(11) == (gates(r) && r.getBoolean(10)))
    }
    assert(budgetKept.toSeq.map(toks).sum <= budget)
    spark.sharedState.cacheManager.clearCache()
  }

  test("labelCentroidMatrix: identical clouds have centroid cosine 1, orthogonal 0") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(2.0f, 0.0f), 1),             // same direction as label 0
      (3L, Array(0.0f, 1.0f), 2))             // orthogonal
      .toDF("vec_id", "embedding", "label")
    val out = EmbeddingOps.labelCentroidMatrix(vecs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(5))).toMap
    assert(out((0L, 0L))._3 == 1.0)
    assert(out((0L, 1L)) == ((2L, 1L, 1.0))) // scale-invariant
    assert(out((0L, 2L))._3 == 0.0)
    assert(out((1L, 2L))._3 == 0.0)
    assert(out.keySet.size == 6) // upper triangle incl. diagonal of 3 labels
  }

  test("bigramHoldoutSurprisal: hand-computed add-one scores, unseen counted") {
    // train (ids 1, 2): "a b", "a b c"; test (id 5): "a b x"
    // train bigrams: "a b"×2, "b c"×1; contexts: a×2, b×1; vocab {a,b,c} = 3
    val docs = Seq((1L, "a b"), (2L, "a b c"), (5L, "a b x"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.bigramHoldoutSurprisal(docs).collect()
    assert(r.length == 1)
    val row = r.head
    def s(c1: Long, c12: Long): Long =
      math.floor(math.log((c1 + 3.0) / (c12 + 1.0)) * 1e6 + 0.5).toLong
    // "a b": c1(a)=2, c12=2 -> ln(5/3); "b x": c1(b)=1, c12=0 -> ln(4/1)
    assert(row.getLong(1) == 2L)                    // n_bigrams
    assert(row.getLong(2) == 1L)                    // n_unseen ("b x")
    assert(row.getLong(3) == s(2, 2) + s(1, 0))     // exact munats
    assert(row.getLong(4) == (s(2, 2) + s(1, 0)) / 2L)
  }

  test("keyUniqueness: exact dup counts; composite key detected") {
    val df = Seq((1L, "a"), (1L, "b"), (2L, "a")).toDF("u", "t")
    val out = graft.clean.Profiler.keyUniqueness(
        df, Seq(Seq("u"), Seq("u", "t")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getBoolean(6))).toMap
    assert(out("u") == ((3L, 0L, 2L, 1L, 333333L, false)))
    assert(out("u,t") == ((3L, 0L, 3L, 0L, 0L, true)))
  }

  test("knnLabelPurity: separable clouds score 1, mixed score the base rate") {
    // two tight orthogonal clusters, labels 0 and 1; 2 queries per label
    val vecs = (0L until 8L).map { i =>
      val lab = (i % 2).toInt
      val base = if (lab == 0) Array(1.0f, 0.0f) else Array(0.0f, 1.0f)
      (i, base.map(_ + i.toFloat * 1e-4f), lab)
    }.toDF("vec_id", "embedding", "label")
    val out = AnnSearch.knnLabelPurity(vecs, col("vec_id") < 4L, k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    // each query's 3 nearest are its own cluster's other members
    assert(out(0L) == ((2L, 6L, 1000000L)))
    assert(out(1L) == ((2L, 6L, 1000000L)))
  }

  test("queryLikelihoodTopKBatch: per-query scores equal the single-query operator") {
    val docs = Seq((1L, "a a b"), (2L, "b c c c"), (3L, "a c"))
      .toDF("doc_id", "text")
    val q = Seq((10L, Seq("a", "c")), (20L, Seq("b")))
      .toDF("query_id", "query_terms")
    val batch = TextAnalysis.queryLikelihoodTopKBatch(docs, q, k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> (r.getInt(1), r.getLong(4)))
      .toMap
    for ((qid, terms) <- Seq(10L -> Seq("a", "c"), 20L -> Seq("b"))) {
      val single = TextAnalysis.queryLikelihoodTopK(docs, terms, k = 10)
        .collect().map(r => r.getLong(1) -> (r.getInt(0), r.getLong(3))).toMap
      single.foreach { case (doc, v) =>
        assert(batch((qid, doc)) == v,
          s"batch disagrees with single for query $qid doc $doc")
      }
    }
  }

  test("columnEntropy: uniform column hits ln k, constant column 0") {
    val df = Seq(("a", "z"), ("b", "z"), ("c", "z"), ("d", "z"))
      .toDF("u", "k")
    val out = graft.clean.Profiler.columnEntropy(df, Seq("u", "k"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(5))).toMap
    val lnQuarter = math.floor(0.25 * math.log(4.0) * 1e12 + 0.5).toLong * 4
    assert(out("u") == ((4L, 4L, lnQuarter, lnQuarter / 1e12 / math.log(4.0))))
    assert(out("k") == ((4L, 1L, 0L, 0.0)))
  }

  test("bigramHoldoutBySource: rollup sums equal the doc-grain frame") {
    val docs = Seq((1L, "a b", "s1"), (2L, "a b c", "s1"),
      (5L, "a b x", "s1"), (10L, "a b", "s2"))
      .toDF("doc_id", "text", "source")
    val doc = TextAnalysis.bigramHoldoutSurprisal(docs).collect()
      .map(r => (r.getLong(1), r.getLong(3))).toSeq
    val by = TextAnalysis.bigramHoldoutBySource(docs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    // held-out docs: 5 (s1) and 10 (s2)
    assert(by.keySet == Set("s1", "s2"))
    assert(by.values.map(_._2).sum == doc.map(_._1).sum)
    assert(by.values.map(_._3).sum == doc.map(_._2).sum)
  }

  test("decontaminateAnchored: one-hop flags are a subset of the cluster verdict; multi-hop is the documented divergence") {
    import graft.llmdata.{Curation, Dedup}
    // A chain of near-dups e ≈ t1 ≈ t2 where t2 shares no shingle with
    // e: anchored catches t1 (direct near-dup of eval), the cluster
    // spelling ALSO catches t2 (multi-hop). Shingle width is 3.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val t1 = base.replace("kappa", "kappa2") // high overlap with base
    val t2 = "unrelated words here entirely different content stream okay fine"
    val docs = Seq(
      (97L, base),                    // eval member (id % 97 == 0)
      (1L, t1), (2L, t2), (3L, "completely disjoint text with nothing shared"))
      .toDF("doc_id", "text")
    val ev = docs.filter(col("doc_id") % 97 === 0)
    val tr = docs.filter(col("doc_id") % 97 =!= 0)
    val anchored = Curation.decontaminateAnchored(tr, ev)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    val cluster = Curation.decontaminateClusters(tr, ev,
        Dedup.nearDupClusters(docs))
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    // subset relation: everything anchored flags, the cluster flags too
    anchored.foreach { case (id, f) =>
      if (f) assert(cluster(id), s"anchored flagged $id but cluster did not")
    }
    // t1 caught by both (direct gram overlap and/or one-hop near-dup)
    assert(anchored(1L) && cluster(1L))
    // the fully disjoint doc is flagged by neither
    assert(!anchored(3L) && !cluster(3L))
    spark.sharedState.cacheManager.clearCache()
  }

  test("growthAccounting: states hand-checked; the accounting identity holds") {
    import graft.enrich.Funnel
    // user 1: days 0,1,3 (new@0, retained@1, churn@2, resurrected@3, churn@4)
    // user 2: day 1 only (new@1, churn@2)
    val day = 86400000000L
    val events = Seq((1L, 0L), (1L, 1L), (1L, 3L), (2L, 1L))
      .map { case (u, d) => (u, d * day + 5L) }.toDF("u", "t")
    val out = Funnel.growthAccounting(events, "u", "t", day)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(out(0L) == ((1L, 0L, 0L, 1L, 0L)))
    assert(out(1L) == ((1L, 1L, 0L, 2L, 0L)))
    assert(out(2L) == ((0L, 0L, 0L, 0L, 2L)))
    assert(out(3L) == ((0L, 0L, 1L, 1L, 0L)))
    assert(out(4L) == ((0L, 0L, 0L, 0L, 1L)))
    // identity: active_w - active_{w-1} = new_w + resurrected_w - churned_w
    (1L to 4L).foreach { w =>
      val (nw, _, rs, a, ch) = out(w)
      assert(a - out(w - 1)._4 == nw + rs - ch, s"identity broken at $w")
    }
  }

  test("powerLawAlpha: hand moments; heavier tail -> smaller alpha") {
    import graft.enrich.GroupStats
    // counts: u1 x1, u2 x1, u3 x2 -> sum_ln = 2*ln(2) + ln(4) micro
    val ev = Seq(1L, 2L, 3L, 3L).map(u => Tuple1(u)).toDF("u")
    val r = GroupStats.powerLawAlpha(ev, "u").collect()(0)
    def lm(x: Long) = math.floor(math.log(2.0 * x) * 1e6 + 0.5).toLong
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 2 * lm(1) + lm(2))
    assert(r.getDouble(3) == 1.0 + 3.0 * 1e6 / (2 * lm(1) + lm(2)))
    // an extreme whale lowers alpha
    val whale = (Seq.fill(50)(9L) ++ Seq(1L, 2L, 3L)).map(Tuple1(_)).toDF("u")
    val a2 = GroupStats.powerLawAlpha(whale, "u").collect()(0).getDouble(3)
    assert(a2 < r.getDouble(3))
  }

  test("qualityBudgetCurve: monotone non-increasing; threshold 0 keeps everything") {
    import graft.llmdata.Curation
    val docs = (0L until 40L).map { i =>
      (i, if (i % 4 == 0) "the the the the"
          else s"alpha beta gamma tok$i delta epsilon zeta many words here")
    }.toDF("doc_id", "text")
    val rows = Curation.qualityBudgetCurve(docs,
        Seq(0L, 300000L, 600000L, 900000L))
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.head == ((0L, 40L, rows.head._3, 1000000L)))
    val docsKept = rows.map(_._2)
    assert(docsKept.zip(docsKept.tail).forall { case (a, b) => a >= b })
    val toksKept = rows.map(_._3)
    assert(toksKept.zip(toksKept.tail).forall { case (a, b) => a >= b })
  }

  test("audienceOverlap: exact intersections and Jaccard, no self-pairs") {
    val events = Seq(
      ("click", 1L), ("click", 2L), ("click", 2L), ("click", 3L),
      ("buy", 2L), ("buy", 3L), ("buy", 4L),
      ("churn", 9L)).toDF("event_type", "user_id")
    val out = GroupStats.audienceOverlap(events, "event_type", "user_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // click {1,2,3} vs buy {2,3,4}: both 2, union 4
    assert(out(("buy", "click")) == ((3L, 3L, 2L, 500000L)))
    // churn shares no user with anything -> absent (n_both >= 1 rows only)
    assert(out.keySet == Set(("buy", "click")))
  }
}
