package graft.llmdata

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("decontaminate counts distinct shared grams against the eval set") {
    val eval = docs(100L -> "the secret benchmark answer is forty two exactly")
    val train = docs(
      0L -> "the secret benchmark answer is hidden here", // shares 3 grams
      1L -> "completely unrelated training text about weather patterns",
      2L -> "short doc") // < 3 tokens of overlap machinery, no grams shared
    val res = Curation.decontaminate(train, eval)
      .select("doc_id", "n_contaminated_grams", "contaminated")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // "the secret benchmark", "secret benchmark answer", "benchmark answer is"
    assert(res(0L) == ((3L, true)))
    assert(res(1L) == ((0L, false)))
    assert(res(2L) == ((0L, false)))
  }

  test("contaminationReport audits the eval side: leak fraction and sharer counts") {
    val eval = docs(
      100L -> "the secret benchmark answer is forty two exactly", // 6 grams
      101L -> "totally novel evaluation prompt nobody copied",     // 4 grams, unseen
      102L -> "tiny one")                                          // < width -> 0 grams
    val train = docs(
      0L -> "the secret benchmark answer is hidden here",  // shares 3 grams w/ 100
      1L -> "the secret benchmark answer is forty two exactly", // full copy: all 6
      2L -> "completely unrelated training text about weather patterns")
    val res = Curation.contaminationReport(train, eval).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_leaked"),
          r.getAs[Double]("leak_frac"), r.getAs[Long]("n_train_docs")))).toMap
    // eval 100: all 6 grams leak (doc 1 is a verbatim copy), 2 sharers
    assert(res(100L) == ((6L, 6L, 1.0, 2L)))
    // eval 101: nothing shared
    assert(res(101L) == ((4L, 0L, 0.0, 0L)))
    // eval 102: too short to shingle — all-zero row, no divide-by-zero
    assert(res(102L) == ((0L, 0L, 0.0, 0L)))
  }

  test("capPerStratum keeps top-cap per stratum with deterministic ties") {
    val d = Seq(
      (1L, "a", 10L), (2L, "a", 30L), (3L, "a", 20L), (4L, "a", 30L),
      (5L, "b", 5L)
    ).toDF("doc_id", "source", "n_chars")
    val kept = Curation.capPerStratum(d, "source", "n_chars", "doc_id", cap = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L, 5L)) // 30 (id 2), 30 (id 4) beat 20; b keeps its only row
  }

  test("temperatureFractions: alpha=1 is the natural mixture, alpha<1 flattens") {
    val d = (0 until 900).map(i => (i.toLong, if (i < 800) "en" else "de"))
      .toDF("doc_id", "lang")
    val nat = Curation.temperatureFractions(d, "lang", alpha = 1.0, targetFraction = 0.5)
    assert(math.abs(nat("en") - 0.5) < 1e-12 && math.abs(nat("de") - 0.5) < 1e-12)
    val flat = Curation.temperatureFractions(d, "lang", alpha = 0.5, targetFraction = 0.5)
    assert(flat("de") > flat("en")) // rare stratum upsampled
    // de's raw p exceeds 1 and is clamped — it can only keep all its
    // rows — so the realized keep rate lands BELOW target by exactly
    // the clamped surplus (documented shortfall), never above 1 per
    // stratum
    assert(flat("de") == 1.0)
    val exp = (flat("en") * 800 + flat("de") * 100) / 900.0
    assert(exp < 0.5 && exp > 0.4)
    // null strata are excluded from the fraction map (they fall to the
    // sampler's defaultFraction) and non-string keys are stringified
    val withNull = (0 until 100)
      .map(i => (i.toLong, if (i < 90) Some(7) else None))
      .toDF("doc_id", "bucket")
    val fr = Curation.temperatureFractions(withNull, "bucket", 1.0, 0.5)
    assert(fr.keySet == Set("7"))
  }

  test("curationVerdicts equals the four component operators joined") {
    val originals = (0L until 24L).map { i =>
      val n = 55 + (i % 4).toInt
      val body = (0 until n).map { k =>
        if (k % 5 != 0) "word12" else s"word${(i * 3 + k) % 23}"
      }.mkString(" ")
      (i, s"the of and $body tok${i % 5}",
        if (i % 3 == 0) "fr" else "en", if (i % 2 == 0) "a" else "b")
    }
    // normalized-dedup bait: case/punctuation variants of docs 1 and 2
    val variants = Seq(1L, 2L).map { i =>
      val (_, t, l, s) = originals(i.toInt)
      (100L + i, t.toUpperCase + " !!", l, s)
    }
    val df = (originals ++ variants).toDF("doc_id", "text", "lang", "source")
    val evalSet = df.filter($"doc_id" % 7 === 0).select("doc_id", "text")
    val targets = Map("a" -> 400000L, "b" -> 100000L)
    val out = Curation.curationVerdicts(df, evalSet, targets).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))
      .toMap
    assert(out.size == 26)
    // component replays
    val normKeep = {
      val g = Dedup.exactDedupNormalized(df).collect()
        .map(_.getAs[Long]("keep_id")).toSet
      (id: Long) => g.contains(id)
    }
    val ensKeep = TextAnalysis.qualityEnsemble(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    val decKeep = Curation.decontaminateClusters(df, evalSet,
        Dedup.nearDupClusters(df)).collect()
      .map(r => r.getLong(0) -> !r.getBoolean(4)).toMap
    val mixKeep = Curation.mixtureRates(df, targets).collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    out.foreach { case (id, (d, q, c, m, keep)) =>
      assert(d == normKeep(id), s"dedup $id")
      assert(q == ensKeep(id), s"quality $id")
      assert(c == decKeep(id), s"decontam $id")
      assert(m == mixKeep(id), s"mixture $id")
      assert(keep == (d && q && c && m), s"conjunction $id")
    }
    // the gate is non-trivial: the injected variants fail dedup, the
    // in-corpus eval docs fail decontamination
    assert(!out(101L)._1 && !out(102L)._1)
    assert(!out(0L)._3 && !out(7L)._3)
    assert(out.values.exists(!_._5))
  }

  test("curationVerdictsV3 adds the span conjunct, equal to dupSpanCoverage") {
    // doc 0 and 1 share a long boilerplate run (span coverage high in
    // both); doc 2 is clean; doc 3 shares only a short phrase
    val boiler = (0 until 40).map(k => s"b$k").mkString(" ")
    val df = Seq(
      (0L, s"$boiler unique zero tail words here now", "en", "a"),
      (1L, s"other opening words $boiler and more trailing", "en", "a"),
      (2L, (0 until 50).map(k => s"c$k").mkString(" "), "en", "b"),
      (3L, "alpha beta gamma " + (0 until 47).map(k => s"d$k").mkString(" "), "en", "b"),
      (4L, "alpha beta gamma " + (0 until 47).map(k => s"e$k").mkString(" "), "en", "b"))
      .toDF("doc_id", "text", "lang", "source")
    val evalSet = df.filter($"doc_id" === 99L).select("doc_id", "text")
    val targets = Map("a" -> 400000L, "b" -> 400000L)
    val out = Curation.curationVerdictsV3(df, evalSet, targets).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5), r.getBoolean(6)))
      .toMap
    // span conjunct == the standalone coverage operator's verdict
    val covKeep = Dedup.dupSpanCoverage(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("coverage_micro") <= 500000L)).toMap
    // every v2 column == the v2 operator's output
    val v2 = Curation.curationVerdicts(df, evalSet, targets).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4))).toMap
    out.foreach { case (id, (d, q, c, m, sp, keep)) =>
      assert((d, q, c, m) == v2(id), s"v2 columns $id")
      assert(sp == covKeep(id), s"span $id")
      assert(keep == (d && q && c && m && sp), s"conjunction $id")
    }
    // the fixture is non-trivial: the boilerplate pair fails the span
    // gate, the clean docs pass it
    assert(!out(0L)._5 && !out(1L)._5, out.toString)
    assert(out(2L)._5 && out(3L)._5 && out(4L)._5, out.toString)
  }

  test("curationVerdictsV4 adds DSIR + novelty conjuncts, equal to the components") {
    import org.apache.spark.sql.functions.col
    val boiler = (0 until 40).map(k => s"b$k").mkString(" ")
    val df = Seq(
      (0L, s"$boiler unique zero tail words here now", "en", "a"),
      (1L, s"other opening words $boiler and more trailing", "en", "a"),
      (2L, (0 until 50).map(k => s"c$k").mkString(" "), "en", "b"),
      (3L, "alpha beta gamma " + (0 until 47).map(k => s"d$k").mkString(" "), "de", "b"),
      (4L, "alpha beta gamma " + (0 until 47).map(k => s"e$k").mkString(" "), "en", "b"))
      .toDF("doc_id", "text", "lang", "source")
    val evalSet = df.filter($"doc_id" === 99L).select("doc_id", "text")
    val targets = Map("a" -> 400000L, "b" -> 400000L)
    val target = col("lang") === "en"
    val out = Curation.curationVerdictsV4(df, evalSet, targets, target)
      .collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5), r.getBoolean(6),
        r.getBoolean(7), r.getBoolean(8)))
      .toMap
    val v3 = Curation.curationVerdictsV3(df, evalSet, targets).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5))).toMap
    val dsirKeep = Dsir.dsirWeights(df, target).collect()
      .map(r => r.getLong(0) -> (r.getLong(2) >= 0L)).toMap
    val novKeep = Dedup.ngramNovelty(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("novelty_micro") >= LlmDataParams.noveltyGateMicro))
      .toMap
    out.foreach { case (id, (d, q, c, m, sp, ds, nv, keep)) =>
      assert((d, q, c, m, sp) == v3(id), s"v3 columns $id")
      assert(ds == dsirKeep(id), s"dsir $id")
      assert(nv == novKeep.getOrElse(id, true), s"novelty $id")
      assert(keep == (d && q && c && m && sp && ds && nv), s"conj $id")
    }
    assert(out.size == 5)
  }

  test("curationVerdictsV5 adds the self-trained classifier conjunct") {
    import org.apache.spark.sql.functions.col
    val boiler = (0 until 40).map(k => s"b$k").mkString(" ")
    val df = Seq(
      (0L, s"$boiler unique zero tail words here now", "en", "a"),
      (1L, s"other opening words $boiler and more trailing", "en", "a"),
      (2L, (0 until 50).map(k => s"c$k").mkString(" "), "en", "b"),
      (3L, "alpha beta gamma " + (0 until 47).map(k => s"d$k").mkString(" "), "de", "b"),
      (4L, "alpha beta gamma " + (0 until 47).map(k => s"e$k").mkString(" "), "en", "b"))
      .toDF("doc_id", "text", "lang", "source")
    val evalSet = df.filter($"doc_id" === 99L).select("doc_id", "text")
    val targets = Map("a" -> 400000L, "b" -> 400000L)
    val target = col("lang") === "en"
    val out = Curation.curationVerdictsV5(df, evalSet, targets, target)
      .collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5), r.getBoolean(6),
        r.getBoolean(7), r.getBoolean(8), r.getBoolean(9)))
      .toMap
    // v4 columns carry over bit-for-bit
    val v4 = Curation.curationVerdictsV4(df, evalSet, targets, target)
      .collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5), r.getBoolean(6),
        r.getBoolean(7))).toMap
    // the standalone replay of the self-trained gate: ensemble keep
    // as the weak label, same epochs, margin sign
    val labeled = df.select(col("doc_id"), col("text"))
      .join(TextAnalysis.qualityEnsemble(df)
        .select(col("doc_id"), col("keep").as("__y")), "doc_id")
    val clfKeep = Classifier.trainScores(labeled, col("__y"))
      .collect().map(r => r.getLong(0) -> (r.getLong(2) >= 0L)).toMap
    out.foreach { case (id, (d, q, c, m, sp, ds, nv, clf, keep)) =>
      assert((d, q, c, m, sp, ds, nv) == v4(id), s"v4 columns $id")
      assert(clf == clfKeep(id), s"clf $id")
      assert(keep == (d && q && c && m && sp && ds && nv && clf), s"conj $id")
    }
    assert(out.size == 5)
  }

  test("decontaminateClusters flags the clean near-copy of a contaminated doc") {
    val base = (1 to 17).map(i => s"tok$i").mkString(" ")
    val train = docs(
      0L -> s"$base alpha beta gamma", // shares 'alpha beta gamma' with eval
      1L -> s"$base delta eps zeta", // near-dup of 0, NO eval shingle
      2L -> "something else entirely different words here now ok")
    val evalSet = docs(100L -> "xx yy alpha beta gamma zz ww")
    val clusters = Dedup.nearDupClusters(train)
    // preflight: 0 and 1 really cluster together, 2 alone
    val roots = clusters.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(roots(0L) == roots(1L) && roots(2L) != roots(0L))
    val out = Curation.decontaminateClusters(train, evalSet, clusters)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3), r.getBoolean(4)))
      .toMap
    assert(out(0L)._2 && out(0L)._3) // directly contaminated
    // the near-copy shares NO eval shingle yet is cluster-flagged —
    // the leak path this operator exists to close
    assert(out(1L)._1 == 0L && !out(1L)._2 && out(1L)._3)
    assert(!out(2L)._2 && !out(2L)._3)
  }

  test("decontaminateClusters: eval MEMBERSHIP seeds the cluster verdict on a disjoint split") {
    // ADVICE r12 #3: the train doc below clusters directly with an
    // eval doc but shares no exact eval shingle (the perturbation is
    // inside every width-3 window that also touches eval-only tokens),
    // so before the membership seed it escaped the verdict.
    val base = (1 to 17).map(i => s"tok$i").mkString(" ")
    val train = docs(
      0L -> s"$base qq ww ee",  // near-dup of the eval doc, NO shared shingle with it? shares base grams
      1L -> "unrelated content entirely different words here now ok")
    val evalSet = docs(100L -> s"$base rr tt yy")
    // cluster over train ∪ eval so the labeling covers the eval member
    val all = docs(
      0L -> s"$base qq ww ee",
      1L -> "unrelated content entirely different words here now ok",
      100L -> s"$base rr tt yy")
    val clusters = Dedup.nearDupClusters(all)
    val roots = clusters.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(roots(0L) == roots(100L) && roots(1L) != roots(0L))
    val out = Curation.decontaminateClusters(train, evalSet, clusters)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3), r.getBoolean(4)))
      .toMap
    // doc 0 DOES share base-window shingles with eval here — so also
    // verify the pure-membership path with a gram-free variant below
    assert(out(0L)._3)
    assert(!out(1L)._2 && !out(1L)._3)
    // pure membership: train doc shares zero shingles with eval but an
    // eval doc sits in its cluster (hand-labeled clustering)
    import spark.implicits._
    val handClusters = Seq((0L, 0L), (100L, 0L), (1L, 1L))
      .toDF("doc_id", "root_id")
    val train2 = docs(
      0L -> "aa bb cc dd ee ff gg hh",
      1L -> "unrelated content entirely different words here now ok")
    val eval2 = docs(100L -> "zz yy xx wv uu ts rq po")
    val out2 = Curation.decontaminateClusters(train2, eval2, handClusters)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3), r.getBoolean(4)))
      .toMap
    assert(out2(0L)._1 == 0L && !out2(0L)._2 && out2(0L)._3,
      "membership seed must flag the cluster with zero gram overlap")
    assert(!out2(1L)._3)
  }

  test("mixtureRates thins over-target sources, clamps under-target ones at keep-all") {
    // a: 10 docs x 10 tokens = 100 of 120 tokens (5/6 of the corpus);
    // b: 2 docs x 10 tokens = 1/6
    val rows = (0L until 10L).map(i => (i, "a", Seq.fill(10)("w").mkString(" "))) ++
      Seq((100L, "b", Seq.fill(10)("x").mkString(" ")),
        (101L, "b", Seq.fill(10)("x").mkString(" ")))
    val df = rows.toDF("doc_id", "source", "text")
    // target: a at 50% of tokens (under its 5/6 share -> thins to
    // 500000 * 120/100 = 600000), b at 50% (over its 1/6 -> clamps)
    val out = Curation.mixtureRates(df,
        Map("a" -> 500000L, "b" -> 500000L)).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
      .toMap
    assert(out.size == 12)
    assert(out(0L)._3 == 600000L)
    assert(out(100L)._3 == 1000000L && out(100L)._4) // clamp = keep-all
    assert(out(101L)._4)
    // untargeted sources get rate 0 and never survive
    val out2 = Curation.mixtureRates(df, Map("a" -> 500000L)).collect()
      .filter(_.getString(1) == "b")
    assert(out2.forall(r => r.getLong(3) == 0L && !r.getBoolean(4)))
    // deterministic under repartitioning
    val again = Curation.mixtureRates(df.repartition(5),
        Map("a" -> 500000L, "b" -> 500000L)).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
      .toMap
    assert(again == out)
  }

  test("epochsReport: exact allocation, repetition knee flagged, untargeted zeroed") {
    // a: 100 tokens, b: 20 tokens, c: 50 tokens (untargeted)
    val rows = (0L until 10L).map(i => (i, "a", Seq.fill(10)("w").mkString(" "))) ++
      Seq((100L, "b", Seq.fill(20)("x").mkString(" "))) ++
      (200L until 205L).map(i => (i, "c", Seq.fill(10)("y").mkString(" ")))
    val df = rows.toDF("doc_id", "source", "text")
    // budget 1000 tokens: a at 30% -> 300 alloc = 3 epochs (under knee);
    // b at 10% -> 100 alloc over 20 tokens = 5 epochs (OVER the knee)
    val out = Curation.epochsReport(df, budgetTokens = 1000L,
        targetsMicro = Map("a" -> 300000L, "b" -> 100000L))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))).toMap
    assert(out("a") == ((100L, 300000L, 300L, 3000000L, false)))
    assert(out("b") == ((20L, 100000L, 100L, 5000000L, true)))
    assert(out("c") == ((50L, 0L, 0L, 0L, false)))
  }

  test("deterministicShuffle is a seeded permutation, stable across layouts") {
    val d = (0L until 100L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val once = Curation.deterministicShuffle(d, "doc_id", "s1")
      .select("doc_id", "shuffle_pos").as[(Long, Long)].collect().toMap
    assert(once.values.toSeq.sorted == (0L until 100L)) // a permutation
    val again = Curation.deterministicShuffle(d.repartition(7), "doc_id", "s1")
      .select("doc_id", "shuffle_pos").as[(Long, Long)].collect().toMap
    assert(once == again) // layout-independent
    val other = Curation.deterministicShuffle(d, "doc_id", "s2")
      .select("doc_id", "shuffle_pos").as[(Long, Long)].collect().toMap
    assert(once != other) // seed changes the permutation
  }
}
