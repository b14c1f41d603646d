package graft.llmdata

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit specs for the round-15 audit wave: bucket balance, nDCG,
  * shuffle audit, padding waste, l-diversity. */
class AuditOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bucketBalance: counts sum to the corpus, shares to ~1e6, kc bound holds") {
    val emb = (0L until 60L).map(i =>
      (i, Array.tabulate(LlmDataParams.embDim)(d =>
        math.sin(i * 0.7 + d).toFloat), "a"))
      .toDF("vec_id", "embedding", "label")
    val out = AnnSearch.bucketBalance(emb).collect()
    assert(out.map(_.getLong(1)).sum == 60L)
    assert(out.forall(r => r.getLong(0) >= 1 &&
      r.getLong(0) <= LlmDataParams.ivfCentroids))
    val shares = out.map(_.getLong(2)).sum
    assert(shares > 900000L && shares <= 1000000L) // floor-div slack
    // occupancy ratio is share * kc by construction
    out.foreach { r =>
      assert(r.getLong(3) ==
        r.getLong(1) * LlmDataParams.ivfCentroids * 1000000L / 60L)
    }
    assert(out.map(_.getLong(4)).distinct.toSeq == Seq(out.length.toLong))
  }

  test("ndcgAtK: perfect ranking scores 1e6, reversed scores less, zero-rel 0") {
    // one query, ranks 1..4 with gains already descending = ideal
    val perfect = Seq((1L, 1, 10L, 3L), (1L, 2, 11L, 1L), (1L, 3, 12L, 0L),
      (1L, 4, 13L, 0L)).toDF("query_id", "rank", "doc_id", "g")
    val p = TextAnalysis.ndcgAtK(perfect, gain = col("g"), k = 10).collect().head
    assert(p.getLong(3) == p.getLong(2)) // idcg == dcg
    assert(p.getLong(4) == 1000000L)
    // worst ranking: gains ascending
    val reversed = Seq((1L, 1, 10L, 0L), (1L, 2, 11L, 0L), (1L, 3, 12L, 1L),
      (1L, 4, 13L, 3L)).toDF("query_id", "rank", "doc_id", "g")
    val r = TextAnalysis.ndcgAtK(reversed, gain = col("g"), k = 10).collect().head
    assert(r.getLong(4) < 1000000L && r.getLong(4) > 0L)
    assert(r.getLong(3) == p.getLong(3)) // same ideal
    // no relevant docs: ndcg defined 0
    val none = Seq((1L, 1, 10L, 0L)).toDF("query_id", "rank", "doc_id", "g")
    assert(TextAnalysis.ndcgAtK(none, col("g")).collect().head.getLong(4) == 0L)
  }

  test("shuffleAudit: a clumped order shows excess adjacency; counts are exact") {
    // 20 docs of source A, 20 of B; the seeded shuffle breaks them up
    val docs = ((0L until 20L).map(i => (i, "A"))
      ++ (100L until 120L).map(i => (i, "B"))).toDF("doc_id", "source")
    val out = Curation.shuffleAudit(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out("A")._1 == 20L && out("B")._1 == 20L)
    // expectation: n_s(n_s-1)*1e6/n = 20*19*1e6/40 = 9_500_000 micro
    assert(out("A")._3 == 9500000L && out("B")._3 == 9500000L)
    // total adjacent-same is bounded by n-1 and deterministic
    val again = Curation.shuffleAudit(docs.repartition(5)).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(again("A") == out("A")._2 && again("B") == out("B")._2)
  }

  test("packPaddingWaste: packed never uses more sequences than padded") {
    val docs = Seq(("en", 30L), ("en", 30L), ("en", 50L), ("de", 5L),
      ("de", 5L), ("de", 5L)).toDF("lang", "n_tokens")
    val out = Sampling.packPaddingWaste(docs, "lang", "n_tokens", budget = 64L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // en: 110 tokens -> 2 packed seqs vs 3 padded (one per doc)
    assert(out("en")._1 == 2L && out("en")._2 == 3L)
    // de: 15 tokens -> 1 packed vs 3 padded
    assert(out("de")._1 == 1L && out("de")._2 == 3L)
    out.values.foreach { case (packed, padded, up, upad) =>
      assert(packed <= padded)
      assert(up >= upad) // packing never lowers utilization
    }
    // exact utilization: en packed = 110e6/(2*64)
    assert(out("en")._3 == 110L * 1000000L / 128L)
  }

  test("mapAtK: textbook AP values on hand-ranked runs") {
    // all-relevant prefix: AP = 1
    val perfect = Seq((1L, 1, true), (1L, 2, true), (1L, 3, false))
      .toDF("query_id", "rank", "rel")
    assert(TextAnalysis.mapAtK(perfect, col("rel")).collect()
      .head.getLong(2) == 1000000L)
    // single relevant at rank 2: AP = 1/2
    val mid = Seq((1L, 1, false), (1L, 2, true), (1L, 3, false))
      .toDF("query_id", "rank", "rel")
    assert(TextAnalysis.mapAtK(mid, col("rel")).collect()
      .head.getLong(2) == 500000L)
    // rel at ranks 1 and 3: AP = (1 + 2/3) / 2 = 5/6
    val two = Seq((1L, 1, true), (1L, 2, false), (1L, 3, true))
      .toDF("query_id", "rank", "rel")
    assert(TextAnalysis.mapAtK(two, col("rel")).collect()
      .head.getLong(2) == (1000000L + 666666L) / 2)
  }

  test("lshParamPlan: recall falls monotonically as rows-per-band grows") {
    // near-dup pairs: copies with small tail edits (true pairs exist)
    val docs = (0L until 30L).map { i =>
      val base = s"alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
      (i, if (i % 2 == 0) base else base + s" tail${i}")
    }.toDF("doc_id", "text")
    val out = Dedup.lshParamPlan(docs).collect()
      .map(r => (r.getLong(1), r.getLong(3))).sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 6L, 12L))
    // 1 - (1 - j^r)^b with b*r fixed: recall is non-increasing in r
    out.sliding(2).foreach { case Array((r1, rec1), (r2, rec2)) =>
      assert(rec1 >= rec2, s"recall must fall from r=$r1 to r=$r2")
    }
    out.foreach { case (_, rec) => assert(rec >= 0L && rec <= 1000000L) }
  }

  test("lshPlanSamplePpm: full under target, proportional above, floored at 1") {
    assert(Dedup.lshPlanSamplePpm(0L) == 1000000L)
    assert(Dedup.lshPlanSamplePpm(20000L) == 1000000L) // at target: full
    assert(Dedup.lshPlanSamplePpm(80000L) == 250000L)  // 4x target: 25%
    assert(Dedup.lshPlanSamplePpm(2000000L) == 10000L) // 100x: 1%
    // populations beyond target*1e6 floor at 1 ppm, never 0
    assert(Dedup.lshPlanSamplePpm(Long.MaxValue / 2000000L) == 1L)
    assertThrows[IllegalArgumentException](Dedup.lshPlanSamplePpm(-1L))
  }

  test("minhashWidthPlan: exact copies have zero error at every width") {
    val docs = (0L until 12L).map { i =>
      (i, "alpha bravo charlie delta echo foxtrot golf hotel")
    }.toDF("doc_id", "text")
    val out = Dedup.minhashWidthPlan(Dedup.sketch(docs)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(3L, 6L, 12L))
    // one pair population, every width measured on it
    assert(out.map(_._2).distinct.length == 1 && out.head._2 > 0)
    // exact copies: signature prefixes agree fully -> err 0 everywhere
    out.foreach { case (w, _, sae, me) =>
      assert(sae == 0L && me == 0L, s"width $w must be exact on copies")
    }
  }

  test("audit-family sampling cuts the pair population deterministically") {
    val docs = (0L until 40L).map { i =>
      (i, "alpha bravo charlie delta echo foxtrot golf hotel")
    }.toDF("doc_id", "text")
    val full = Dedup.minhashWidthPlan(Dedup.sketch(docs))
      .collect().map(r => r.getLong(1)).head
    val sampled = Dedup.minhashWidthPlan(Dedup.sketch(docs),
        samplePpm = 250000L)
      .collect().map(r => r.getLong(1)).head
    assert(sampled > 0L && sampled < full,
      s"sample must be a strict non-empty subset: $sampled of $full")
    // deterministic: same ppm -> same population
    val again = Dedup.minhashWidthPlan(Dedup.sketch(docs.repartition(7)),
        samplePpm = 250000L)
      .collect().map(r => r.getLong(1)).head
    assert(again == sampled)
  }

  test("methodAgreement: both gates are perfect on exact copies") {
    val docs = (0L until 10L).map { i =>
      (i, "alpha bravo charlie delta echo foxtrot golf hotel")
    }.toDF("doc_id", "text")
    val out = Dedup.methodAgreement(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(5), r.getLong(6), r.getLong(8))).toMap
    assert(out.keySet == Set("minhash_est", "simhash"))
    out.foreach { case (m, (tp, fp, fn, prec, rec, dis)) =>
      assert(tp > 0L && fp == 0L && fn == 0L, s"$m confusion")
      assert(prec == 1000000L && rec == 1000000L, s"$m metrics")
      assert(dis == 0L, s"$m gates must agree on copies")
    }
  }

  test("lDiversity: a uniform-sensitive group is flagged, a diverse one is not") {
    val docs = Seq(
      ("s1", 0L, "en"), ("s1", 0L, "en"), ("s1", 0L, "en"), // l = 1
      ("s2", 0L, "en"), ("s2", 0L, "de"), ("s2", 0L, "fr")) // l = 3
      .toDF("source", "len_bucket", "lang")
    val out = Curation.lDiversity(docs, Seq("source", "len_bucket"), "lang")
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(out("s1") == ((3L, 1L, true)))
    assert(out("s2") == ((3L, 3L, false)))
  }
}
