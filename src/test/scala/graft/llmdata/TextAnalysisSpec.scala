package graft.llmdata

import org.apache.spark.sql.functions.floor

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("qualityScore computes token stats and bounded composite") {
    val d = docs(0L -> "the cat sat on the mat")
    val r = TextAnalysis.qualityScore(d).collect()(0)
    assert(r.getAs[Long]("n_tokens") == 6L)
    assert(r.getAs[Long]("n_distinct") == 5L) // 'the' twice
    assert(math.abs(r.getAs[Double]("stop_ratio") - 2.0 / 6) < 1e-9)
    val q = r.getAs[Double]("quality")
    assert(q > 0 && q <= 1.0)
  }

  test("qualityEnsemble equals the component operators joined") {
    // the fused projection must be VALUE-IDENTICAL to the four
    // standalone operators composed by join — same kernels, same
    // arithmetic (the scaladoc's by-construction claim, pinned here)
    val rows = (0L until 40L).map { i =>
      // half the docs are LONG (>= 50 words, gopher-eligible, keep
      // decided by classifier sign / bucket / quality), half short
      // (gopher rule 1 fails -> keep = false)
      val n = if (i % 2 == 0) 60 + (i % 5).toInt else 5 + (i % 7).toInt
      val body = (0 until n).map { k =>
        // long docs lean on a token whose hashed classifier weight is
        // positive (word12: +9 unigram, +10 self-bigram) so the
        // cls_score >= 0 conjunct genuinely fires for some docs
        if (i % 2 == 0 && k % 5 != 0) "word12"
        else s"word${(i * 3 + k) % 23}"
      }.mkString(" ")
      (i, s"the of and $body token${i % 5}", if (i % 3 == 0) "fr" else "en")
    }
    val df = rows.toDF("doc_id", "text", "lang")
    val qm = floor($"quality" * 1e6 + 0.5).cast("long")
    val joined = TextAnalysis.gopherRules(df)
      .select($"doc_id", $"n_failed", $"keep".as("gk"))
      .join(TextAnalysis.qualityScore(df).select($"doc_id", $"quality"), "doc_id")
      .join(TextAnalysis.hashClassifier(df).select($"doc_id", $"score"), "doc_id")
      .join(TextAnalysis.surprisalBucketsSampled(df).select($"doc_id", $"bucket"), "doc_id")
      .select($"doc_id", qm.as("quality_micro"), $"n_failed", $"gk",
        $"score", $"bucket",
        ($"gk" === 1L && $"score" >= 0L && $"bucket" =!= "tail" &&
          qm >= 300000L).as("keep"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5), r.getBoolean(6))
    val ens = TextAnalysis.qualityEnsemble(df).collect().map(key).toSet
    val exp = joined.collect().map(key).toSet
    assert(ens == exp)
    assert(ens.size == 40)
    // the gate is non-trivial on this fixture: both verdicts occur
    assert(ens.exists(_._7) && ens.exists(!_._7))
  }

  test("languageId picks marker-dominant language, und when none") {
    val d = docs(
      0L -> "the house of cards and the dog",
      1L -> "der hund und die katze ist nicht da",
      2L -> "xyzzy plugh qwerty")
    val r = TextAnalysis.languageId(d).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("predicted_lang")).toMap
    assert(r(0L) == "en")
    assert(r(1L) == "de")
    assert(r(2L) == "und")
  }

  test("fingerprint is stable and order-sensitive at the gram level") {
    val d = docs(
      0L -> "abcdefghijklmnopqrstuvwxyz",
      1L -> "abcdefghijklmnopqrstuvwxyz",
      2L -> "zyxwvutsrqponmlkjihgfedcba")
    val r = TextAnalysis.fingerprint(d).collect()
      .map(x => x.getLong(0) -> x.getAs[String]("fingerprint")).toMap
    assert(r(0L) == r(1L))
    assert(r(0L) != r(2L))
    assert(r(0L).length == 32)
  }

  test("repetitionSignals flags repeated-gram and repeated-word docs") {
    val d = docs(
      0L -> "spam spam spam spam spam spam spam spam spam spam", // 10 tokens, 1 distinct
      1L -> "one two three four five six seven eight nine ten",  // all distinct
      2L -> "x")                                                 // 1 token: no grams
    val r = TextAnalysis.repetitionSignals(d).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(math.abs(r(0L).getAs[Double]("dup_word_frac") - 0.9) < 1e-9)
    // 9 occurrences of "spam spam" covering 2 tokens each over 10 tokens
    assert(math.abs(r(0L).getAs[Double]("top_2gram_frac") - 1.8) < 1e-9)
    assert(r(0L).getAs[Boolean]("rep_flagged"))
    assert(r(1L).getAs[Double]("dup_word_frac") == 0.0)
    assert(math.abs(r(1L).getAs[Double]("top_2gram_frac") - 0.2) < 1e-9)
    assert(r(2L).getAs[Double]("top_2gram_frac") == 0.0) // empty gram list
    assert(math.abs(r(2L).getAs[Double]("top_3gram_frac")) < 1e-9)
  }

  test("redactPii counts and redacts emails and phones, leaves clean text") {
    val d = docs(
      0L -> "write to jo.doe-1@ex-ample.com or bob@site.org today",
      1L -> "call 555-123-4567 then 111-222-3333",
      2L -> "nothing sensitive here")
    val r = TextAnalysis.redactPii(d).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(0L).getAs[Long]("n_emails") == 2L)
    assert(r(0L).getAs[String]("redacted") == "write to <EMAIL> or <EMAIL> today")
    assert(r(1L).getAs[Long]("n_phones") == 2L)
    assert(r(1L).getAs[String]("redacted") == "call <PHONE> then <PHONE>")
    assert(r(2L).getAs[Long]("n_emails") == 0L)
    assert(r(2L).getAs[String]("redacted") == "nothing sensitive here")
  }

  test("tokenFrequency returns global counts ordered desc") {
    val d = docs(0L -> "a b a c a b", 1L -> "b c")
    val r = TextAnalysis.tokenFrequency(d).as[(String, Long)].collect().toSeq
    assert(r == Seq("a" -> 3L, "b" -> 3L, "c" -> 2L))
  }

  test("vocabCoverage reports OOV counts against the top-N vocabulary") {
    // corpus counts: a=3, b=3, c=2, z=1 -> vocab(2) = {a, b}
    val d = docs(0L -> "a b a c a b", 1L -> "b c z")
    val r = TextAnalysis.vocabCoverage(d, vocabSize = 2).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_tokens"), x.getAs[Long]("n_oov")))).toMap
    assert(r(0L) == ((6L, 1L))) // one 'c' out of vocab
    assert(r(1L) == ((3L, 2L))) // 'c' and 'z'
  }

  test("tfidfTopTerms ranks corpus-rare terms above ubiquitous ones") {
    // 'common' appears in all 3 docs (idf = ln(1) = 0); each doc also
    // has a private term, and doc 0 repeats its private term twice
    val d = docs(
      0L -> "common alpha alpha",
      1L -> "common beta",
      2L -> "common gamma")
    val r = TextAnalysis.tfidfTopTerms(d, 2).collect()
    val byDoc = r.groupBy(_.getAs[Long]("doc_id"))
    val top0 = byDoc(0L).minBy(_.getAs[Int]("rnk"))
    assert(top0.getAs[String]("term") == "alpha")
    assert(top0.getAs[Long]("tf") == 2L && top0.getAs[Long]("df") == 1L)
    assert(math.abs(top0.getAs[Double]("tfidf") - 2.0 * math.log(3.0)) < 1e-12)
    // 'common' scores exactly 0 everywhere; still ranked (ties by term)
    byDoc.values.flatten.filter(_.getAs[String]("term") == "common")
      .foreach(x => assert(x.getAs[Double]("tfidf") == 0.0))
  }

  test("unigramSurprisal: rare tokens raise the per-doc average, sums are exact integers") {
    val d = docs(
      0L -> "a a a a",  // only common tokens
      1L -> "a a a rare")
    val r = TextAnalysis.unigramSurprisal(d).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    // corpus: a x7, rare x1, total 8
    val sA = math.floor(math.log(8.0 / 7.0) * 1e6 + 0.5).toLong
    val sRare = math.floor(math.log(8.0 / 1.0) * 1e6 + 0.5).toLong
    assert(r(0L).getAs[Long]("n_tokens") == 4L)
    assert(r(0L).getAs[Long]("surprisal_unats") == 4 * sA)
    assert(r(1L).getAs[Long]("surprisal_unats") == 3 * sA + sRare)
    assert(r(1L).getAs[Double]("avg_nats") > r(0L).getAs[Double]("avg_nats"))
    val bits = r(1L).getAs[Double]("bits_per_token")
    val nats = r(1L).getAs[Double]("avg_nats")
    assert(math.abs(bits - nats / math.log(2.0)) < 1e-12)
  }

  test("surprisalBuckets splits each language into rank thirds, head = most fluent") {
    // 6 'en' docs with increasingly rare vocabulary, 3 'de' docs
    val rows = Seq(
      (0L, "en", "a a a a"), (1L, "en", "a a a b"), (2L, "en", "a a b b"),
      (3L, "en", "a b b c"), (4L, "en", "b c c d"), (5L, "en", "c d d e"),
      (10L, "de", "x x x"), (11L, "de", "x x y"), (12L, "de", "x y z"))
    val d = rows.toDF("doc_id", "lang", "text")
    val out = TextAnalysis.surprisalBuckets(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.size == 9)
    val en = (0L to 5L).map(i => out(i))
    assert(en.forall(_.getAs[Long]("n_lang") == 6L))
    // ranks are a permutation of 1..6 within the language
    assert(en.map(_.getAs[Int]("rnk")).sorted == (1 to 6))
    // thirds: 2 head, 2 middle, 2 tail
    val buckets = en.groupBy(_.getAs[String]("bucket")).view.mapValues(_.size).toMap
    assert(buckets == Map("head" -> 2, "middle" -> 2, "tail" -> 2))
    // doc 0 (only the most common token) is head; doc 5 (rarest mix) is tail
    assert(out(0L).getAs[String]("bucket") == "head")
    assert(out(5L).getAs[String]("bucket") == "tail")
    // de: 3 docs -> one per bucket
    val de = (10L to 12L).map(i => out(i).getAs[String]("bucket"))
    assert(de.toSet == Set("head", "middle", "tail"))
  }

  test("surprisalBucketsApprox agrees with the exact thirds up to adjacent-bucket slack") {
    // a corpus whose per-doc surprisal strictly varies (doc i dilutes
    // one singleton token with i+1 common ones, so munats_per_token
    // decreases in i with essentially no ties): 90 'en' docs, 30 'de'.
    // Tie-free matters: on fully-tied values the EXACT rank thirds are
    // doc_id-arbitrary while the sketch is value-deterministic, and
    // comparing the two would measure the exact side's tie-break, not
    // the sketch error.
    val rows =
      (0 until 90).map { i =>
        (i.toLong, "en", (Seq.fill(i + 1)("base") :+ s"u$i").mkString(" "))
      } ++ (0 until 30).map { i =>
        (100L + i, "de", (Seq.fill(i + 1)("grund") :+ s"v$i").mkString(" "))
      }
    val d = rows.toDF("doc_id", "lang", "text")
    val exact = TextAnalysis.surprisalBuckets(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket")).toMap
    val approx = TextAnalysis.surprisalBucketsApprox(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket")).toMap
    assert(approx.keySet == exact.keySet)
    val rankOf = Map("head" -> 0, "middle" -> 1, "tail" -> 2)
    // every disagreement is an ADJACENT bucket (threshold-tie slack);
    // head<->tail flips would mean the sketch broke, not wobbled
    approx.foreach { case (id, b) =>
      assert(math.abs(rankOf(b) - rankOf(exact(id))) <= 1,
        s"doc $id: approx $b vs exact ${exact(id)}")
    }
    // tolerance: >= 80% identical labels at default accuracy (the
    // disagreement budget is ties sitting exactly on a threshold)
    val agree = approx.count { case (id, b) => exact(id) == b }
    assert(agree >= (exact.size * 0.8).toInt,
      s"only $agree/${exact.size} labels agree with the exact thirds")
  }

  test("surprisalBucketsSampled agrees with the exact thirds up to adjacent-bucket slack") {
    // same tie-free corpus construction as the approx spec: the
    // sampled thresholds (doc_id % 4) are exact values from a 1/4
    // sample, so disagreements sit only near the two thresholds
    val rows =
      (0 until 90).map { i =>
        (i.toLong, "en", (Seq.fill(i + 1)("base") :+ s"u$i").mkString(" "))
      } ++ (0 until 30).map { i =>
        (100L + i, "de", (Seq.fill(i + 1)("grund") :+ s"v$i").mkString(" "))
      }
    val d = rows.toDF("doc_id", "lang", "text")
    val exact = TextAnalysis.surprisalBuckets(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket")).toMap
    val sampled = TextAnalysis.surprisalBucketsSampled(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket")).toMap
    assert(sampled.keySet == exact.keySet)
    val rankOf = Map("head" -> 0, "middle" -> 1, "tail" -> 2)
    sampled.foreach { case (id, b) =>
      assert(math.abs(rankOf(b) - rankOf(exact(id))) <= 1,
        s"doc $id: sampled $b vs exact ${exact(id)}")
    }
    // a 25% sample of a monotone corpus puts its rank-third thresholds
    // within ~2 sample steps of the true thirds -> >= 80% identical
    val agree = sampled.count { case (id, b) => exact(id) == b }
    assert(agree >= (exact.size * 0.8).toInt,
      s"only $agree/${exact.size} labels agree with the exact thirds")
    // a language absent from the sample defaults every doc to 'head'
    val lone = Seq((7L, "fr", "seul mot unique ici")).toDF("doc_id", "lang", "text")
    val fr = TextAnalysis.surprisalBucketsSampled(lone).collect()
    assert(fr.forall(_.getAs[String]("bucket") == "head"))
  }

  test("bigramSurprisal is the exact MLE conditional, short docs drop out") {
    // corpus bigrams: "a b" x2 (docs 0, 1), "a c" x1 (doc 1), so
    // prefix 'a' appears 3x: s(a b) = ln(3/2), s(a c) = ln(3/1)
    val d = Seq(
      (0L, "a b"),
      (1L, "a b q a c"),  // bigrams: "a b", "b q", "q a", "a c"
      (2L, "single"),     // no bigrams -> no row
      (3L, null: String)).toDF("doc_id", "text")
    val out = TextAnalysis.bigramSurprisal(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet == Set(0L, 1L))
    def micro(x: Double) = math.floor(math.log(x) * 1e6 + 0.5).toLong
    assert(out(0L).getAs[Long]("n_bigrams") == 1L)
    assert(out(0L).getAs[Long]("surprisal_unats") == micro(3.0 / 2))
    // doc 1: "a b" ln(3/2) + "b q" ln(1) + "q a" ln(1) + "a c" ln(3)
    assert(out(1L).getAs[Long]("n_bigrams") == 4L)
    assert(out(1L).getAs[Long]("surprisal_unats") ==
      micro(3.0 / 2) + micro(1.0) + micro(1.0) + micro(3.0))
  }

  test("sourceKlDrift computes exact quantized KL, zero for an undrifted source") {
    val d = Seq(
      (0L, "A", "x x y"),
      (1L, "B", "x y y y")).toDF("doc_id", "source", "text")
    val out = TextAnalysis.sourceKlDrift(d).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    // corpus: x=3, y=4, tot=7
    def cell(cnt: Long, totS: Long, cntT: Long, tot: Long) =
      math.floor((cnt.toDouble / totS.toDouble)
        * math.log((cnt.toDouble * tot.toDouble) / (totS.toDouble * cntT.toDouble))
        * 1.0e12 + 0.5).toLong
    assert(out("A").getAs[Long]("kl_pnats") ==
      cell(2, 3, 3, 7) + cell(1, 3, 4, 7))
    assert(out("B").getAs[Long]("kl_pnats") ==
      cell(1, 4, 3, 7) + cell(3, 4, 4, 7))
    assert(out("A").getAs[Long]("n_terms") == 2L)
    assert(out("A").getAs[Long]("tot_tokens") == 3L)
    // KL is non-negative up to the per-cell half-ulp of quantization
    assert(out.values.forall(_.getAs[Long]("kl_pnats") >= -1L))
    // two sources with the SAME distribution as the corpus: KL exactly 0
    val same = Seq((0L, "A", "x y"), (1L, "B", "x y"))
      .toDF("doc_id", "source", "text")
    TextAnalysis.sourceKlDrift(same).collect()
      .foreach(r => assert(r.getAs[Long]("kl_pnats") == 0L))
  }

  test("bm25TopK ranks by term rarity and coverage, caps at k") {
    // 'rare' appears in one doc, 'common' in all four; classic BM25:
    // the rare-term doc must outrank any common-only doc, and a doc
    // hitting both query terms outranks one hitting only 'common'
    val d = Seq(
      (0L, "common filler filler filler"),
      (1L, "common rare filler filler"),
      (2L, "common common filler filler"),
      (3L, "common filler filler filler filler filler filler filler"),
      (4L, "nothing relevant here")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(d, Seq("rare", "common"), k = 3).collect()
    assert(out.length == 3) // k caps, and doc 4 (no hits) never appears
    val ranks = out.map(r => r.getAs[Int]("rank") -> r.getAs[Long]("doc_id")).toMap
    assert(ranks(1) == 1L, s"rare-term doc must rank first: ${out.toSeq}")
    assert(out.map(_.getAs[Long]("doc_id")).toSet.subsetOf(Set(0L, 1L, 2L, 3L)))
    // scores strictly ordered with rank, ties impossible here
    val scores = out.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("bm25_micro"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // doc 1 hits both terms, docs 0/2/3 hit one
    val hits = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hit_terms")).toMap
    assert(hits(1L) == 2L)
    // longer doc with same tf scores lower than the short one (dl norm)
    val s03 = TextAnalysis.bm25TopK(d, Seq("common"), k = 5).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bm25_micro")).toMap
    assert(s03(0L) > s03(3L), s"length normalization missing: $s03")
  }

  test("bm25TopKBatch scores every query exactly like the single-query operator") {
    val d = Seq(
      (0L, "common filler filler filler"),
      (1L, "common rare filler filler"),
      (2L, "common common filler filler"),
      (3L, "common filler filler filler filler filler filler filler"),
      (4L, "nothing relevant here")).toDF("doc_id", "text")
    val queries = Seq(
      (100L, Seq("rare", "common")),
      (101L, Seq("common")),
      (102L, Seq("nothing", "relevant")),
      (103L, Seq("absent", "terms", "only"))).toDF("query_id", "query_terms")
    val batch = TextAnalysis.bm25TopKBatch(d, queries, k = 3).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_hit_terms"), r.getAs[Long]("bm25_micro"))).sorted.toSeq)
      .toMap
    // per-query parity with the broadcast-per-query operator
    val singles = Map(
      100L -> Seq("rare", "common"), 101L -> Seq("common"),
      102L -> Seq("nothing", "relevant"))
    singles.foreach { case (qid, terms) =>
      val single = TextAnalysis.bm25TopK(d, terms, k = 3).collect()
        .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
          r.getAs[Long]("n_hit_terms"), r.getAs[Long]("bm25_micro"))).sorted.toSeq
      assert(batch(qid) == single, s"query $qid: ${batch(qid)} vs $single")
    }
    // a query hitting nothing yields zero rows, not null rows
    assert(!batch.contains(103L))
    // duplicate terms inside one query count once (array_distinct)
    val dup = Seq((200L, Seq("rare", "rare", "common")))
      .toDF("query_id", "query_terms")
    val dedup = TextAnalysis.bm25TopKBatch(d, dup, k = 3).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_hit_terms"), r.getAs[Long]("bm25_micro"))).sorted.toSeq
    val dedupSingle = TextAnalysis.bm25TopK(d, Seq("rare", "common"), k = 3).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_hit_terms"), r.getAs[Long]("bm25_micro"))).sorted.toSeq
    assert(dedup == dedupSingle)
  }

  test("bm25PrfExpand: feedback terms retrieve a doc sharing NO original term") {
    val d = Seq(
      (0L, "alpha beta gamma delta"),           // the direct hit
      (1L, "gamma delta epsilon zeta"),         // reachable ONLY via feedback
      (2L, "filler junk noise words"),
      (3L, "other unrelated content here"),
      (4L, "more filler junk padding")).toDF("doc_id", "text")
    val q = Seq((100L, Seq("alpha", "beta"))).toDF("query_id", "query_terms")
    val plain = TextAnalysis.bm25TopKBatch(d, q, k = 5).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(plain == Set(0L), s"fixture broken: plain run found $plain")
    val prf = TextAnalysis.bm25PrfExpand(d, q, k = 5, fbDocs = 1, fbTerms = 3)
      .collect()
    val prfDocs = prf.map(_.getAs[Long]("doc_id")).toSet
    assert(prfDocs.contains(1L),
      s"expansion should reach the feedback-term doc: $prfDocs")
    // the direct hit still ranks first (it matches original AND
    // expansion terms)
    assert(prf.find(_.getAs[Int]("rank") == 1).get.getAs[Long]("doc_id") == 0L)
    // expansion count is bounded and reported per row
    assert(prf.forall(r => r.getAs[Long]("n_expansion_terms") <= 3L))
    assert(prf.forall(r => r.getAs[Long]("n_expansion_terms") > 0L))
  }

  test("bm25PrfExpand with fbTerms = 0 degenerates to plain batch BM25") {
    val d = Seq(
      (0L, "common filler filler filler"),
      (1L, "common rare filler filler"),
      (2L, "common common filler filler"),
      (3L, "nothing relevant here")).toDF("doc_id", "text")
    val q = Seq((100L, Seq("rare", "common")), (101L, Seq("common")))
      .toDF("query_id", "query_terms")
    val plain = TextAnalysis.bm25TopKBatch(d, q, k = 3).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("n_hit_terms"),
        r.getAs[Long]("bm25_micro"))).sorted.toSeq
    val prf = TextAnalysis.bm25PrfExpand(d, q, k = 3, fbTerms = 0).collect()
    assert(prf.forall(_.getAs[Long]("n_expansion_terms") == 0L))
    val prfRows = prf.map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
      r.getAs[Long]("doc_id"), r.getAs[Long]("n_hit_terms"),
      r.getAs[Long]("bm25_micro"))).sorted.toSeq
    assert(prfRows == plain)
  }

  test("bm25PrfExpand never selects an original query term as expansion") {
    // every feedback-doc term IS a query term -> zero expansions
    val d = Seq(
      (0L, "alpha beta alpha beta"),
      (1L, "junk filler noise words")).toDF("doc_id", "text")
    val q = Seq((9L, Seq("alpha", "beta"))).toDF("query_id", "query_terms")
    val out = TextAnalysis.bm25PrfExpand(d, q, k = 2, fbDocs = 1, fbTerms = 5)
      .collect()
    assert(out.forall(_.getAs[Long]("n_expansion_terms") == 0L), out.mkString(", "))
  }

  test("plan shape: bm25 batch tokenizes the corpus once, top-k is a WindowGroupLimit") {
    val d = Seq((0L, "a b c"), (1L, "b c d")).toDF("doc_id", "text")
    val q = Seq((9L, Seq("a", "b"))).toDF("query_id", "query_terms")
    val plan = TextAnalysis.bm25TopKBatch(d, q, k = 3)
      .queryExecution.executedPlan.toString
    // the per-query rank<=k filter pushes into map-side heaps
    assert(plan.contains("WindowGroupLimit"), plan)
    // one corpus tokenization, shared by stats / df / tf via the
    // persisted frame (>= 2 in-memory consumers)
    assert("InMemoryTableScan".r.findAllIn(plan).size >= 2, plan)
    // the only nested-loop is the broadcast 1-row corpus-stats attach
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("winnowContainment: a quoted document is contained, containment is asymmetric") {
    val quoted = (1 to 30).map(i => s"alpha$i").mkString(" ")
    val d = Seq(
      (0L, quoted),                                          // the short original
      (1L, quoted + " " + (1 to 40).map(i => s"extra$i").mkString(" ")), // quotes it wholesale
      (2L, (1 to 30).map(i => s"other$i").mkString(" ")))    // unrelated
      .toDF("doc_id", "text")
    val out = TextAnalysis.winnowContainment(d).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        ((r.getAs[Long]("n_shared"), r.getAs[Long]("n_fp_a"),
          r.getAs[Long]("n_fp_b"), r.getAs[Long]("containment_a_micro"),
          r.getAs[Long]("containment_b_micro")))).toMap
    assert(out.keySet == Set((0L, 1L)), s"unexpected pairs: ${out.keySet}")
    val (shared, na, nb, ca, cb) = out((0L, 1L))
    // the short doc's fingerprints land almost entirely inside the
    // long one (only junction windows can diverge); the long side's
    // fraction is visibly smaller — the asymmetry Jaccard hides
    assert(ca >= 800000L, s"containment_a $ca")
    assert(ca > cb, s"not asymmetric: $ca vs $cb")
    assert(shared <= math.min(na, nb))
    // identical docs are mutually contained at exactly 1e6
    val dup = Seq((0L, quoted), (1L, quoted)).toDF("doc_id", "text")
    val both = TextAnalysis.winnowContainment(dup).collect()(0)
    assert(both.getAs[Long]("containment_a_micro") == 1000000L)
    assert(both.getAs[Long]("containment_b_micro") == 1000000L)
  }

  test("zipfFit recovers the exponent of a constructed power-law corpus") {
    // counts exactly 840/r for r = 1..8: a Zipf(1) head, so the
    // fitted alpha must land at 1 within quantization error
    val toks = (1 to 8).flatMap(r => Seq.fill(840 / r)(s"t$r"))
    val d = Seq((0L, toks.mkString(" "))).toDF("doc_id", "text")
    val row = TextAnalysis.zipfFit(d, topN = 1000).collect()(0)
    assert(row.getAs[Long]("n_types_fit") == 8L)
    assert(row.getAs[Long]("n_types_total") == 8L)
    assert(row.getAs[Long]("n_tokens") == toks.size.toLong)
    val alpha = row.getAs[Double]("alpha")
    assert(math.abs(alpha - 1.0) < 0.005, s"alpha $alpha")
    // a flatter distribution fits a smaller exponent
    val flat = Seq((0L, (1 to 8).flatMap(r =>
      Seq.fill(100 + r)(s"t$r")).mkString(" "))).toDF("doc_id", "text")
    val aFlat = TextAnalysis.zipfFit(flat).collect()(0).getAs[Double]("alpha")
    assert(math.abs(aFlat) < 0.2, s"flat corpus alpha $aFlat")
    // deterministic under layout
    val again = TextAnalysis.zipfFit(d.repartition(7), topN = 1000)
      .collect()(0).getAs[Double]("alpha")
    assert(again == alpha)
    // topN caps the fit set but not the totals
    val capped = TextAnalysis.zipfFit(d, topN = 4).collect()(0)
    assert(capped.getAs[Long]("n_types_fit") == 4L)
    assert(capped.getAs[Long]("n_types_total") == 8L)
  }

  test("retrievalEval scores found/missed relevance exactly; macro is exact integer division") {
    val results = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 2),
      (3L, 30L, 1)).toDF("query_id", "doc_id", "rank")
    val relevance = Seq(
      (1L, 11L), (1L, 99L), // one found at rank 2, one missed
      (2L, 22L),            // all relevant docs missed
      (3L, 30L))            // perfect hit
      .toDF("query_id", "doc_id")
    val per = TextAnalysis.retrievalEval(results, relevance, k = 2).collect()
      .map(r => r.getAs[Long]("query_id") ->
        ((r.getAs[Long]("n_relevant"), r.getAs[Long]("n_found"),
          Option(r.getAs[Any]("first_rank")).map(_.asInstanceOf[Long]),
          r.getAs[Long]("rr_micro"), r.getAs[Boolean]("hit1"),
          r.getAs[Boolean]("hit_at_k")))).toMap
    assert(per(1L) == ((2L, 1L, Some(2L), 500000L, false, true)))
    // a fully-missed query is a ROW with rr 0, not an absent row
    assert(per(2L) == ((1L, 0L, None, 0L, false, false)))
    assert(per(3L) == ((1L, 1L, Some(1L), 1000000L, true, true)))
    val macroRow = TextAnalysis.retrievalEvalMacro(
      TextAnalysis.retrievalEval(results, relevance, k = 2)).collect()(0)
    assert(macroRow.getAs[Long]("n_queries") == 3L)
    assert(macroRow.getAs[Long]("mrr_micro") == 500000L)   // 1.5e6 div 3
    assert(macroRow.getAs[Long]("hit1_micro") == 333333L)
    assert(macroRow.getAs[Long]("hit_at_k_micro") == 666666L)
    assert(macroRow.getAs[Long]("found_micro") == 666666L)
  }

  test("chunkTokens windows overlap by size - stride and cover every token") {
    val d = Seq(
      (0L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (1L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokens(d, size = 4, stride = 3).collect()
    val c0 = out.filter(_.getAs[Long]("doc_id") == 0L)
      .sortBy(_.getAs[Long]("chunk_idx"))
    // starts 0,3,6,9: three full windows + one short tail
    assert(c0.map(_.getAs[Long]("start_token")).toSeq == Seq(0L, 3L, 6L, 9L))
    assert(c0.map(_.getAs[Long]("n_chunk_tokens")).toSeq == Seq(4L, 4L, 4L, 1L))
    assert(c0(0).getAs[String]("chunk_text") == "t1 t2 t3 t4")
    assert(c0(1).getAs[String]("chunk_text") == "t4 t5 t6 t7") // overlap of 1
    assert(c0(3).getAs[String]("chunk_text") == "t10")
    // every token index is covered by at least one window
    val covered = c0.flatMap { r =>
      val s = r.getAs[Long]("start_token")
      s until (s + r.getAs[Long]("n_chunk_tokens"))
    }.toSet
    assert(covered == (0L until 10L).toSet)
    // empty text: exactly one chunk, empty
    val c1 = out.filter(_.getAs[Long]("doc_id") == 1L)
    assert(c1.length == 1 && c1(0).getAs[String]("chunk_text") == "")
    // null text: no chunks at all
    val withNull = Seq((2L, null: String)).toDF("doc_id", "text")
    assert(TextAnalysis.chunkTokens(withNull).collect().isEmpty)
  }

  test("gopherRules flags each rule on targeted fixtures") {
    val keepText = (Seq.fill(48)("the") ++ Seq("be", "word")).mkString(" ") // 50 words, 2 stops
    val rows = Seq(
      (0L, keepText),                                   // passes all 7
      (1L, "the be short"),                             // fails r1 (3 words)
      (2L, (Seq.fill(50)("xy") ++ Seq("the", "be")).mkString(" ")), // r2: mean len < 3
      (3L, (Seq.fill(30)("the") ++ Seq.fill(20)("#") :+ "be").mkString(" ")), // r3 + r6
      (4L, (0 until 50).map(i => s"- the be item$i").mkString("\n")), // r4: all bullet lines
      (5L, (0 until 50).map(i => s"the be line$i...").mkString("\n")), // r5 (+r3: 50 ellipses vs 53 words)
      (6L, (Seq.fill(45)("1234") ++ Seq.fill(5)("the") :+ "be").mkString(" ")), // r6: 88% numeric
      (7L, Seq.fill(50)("word").mkString(" ")))          // r7: no stop words
    val out = TextAnalysis.gopherRules(rows.toDF("doc_id", "text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    def failedRules(id: Long): Set[String] =
      Seq("r1_word_count", "r2_mean_word_len", "r3_symbol_ratio", "r4_bullet_lines",
        "r5_ellipsis_lines", "r6_alpha_words", "r7_stop_words")
        .filter(r => out(id).getAs[Long](r) == 0L).toSet
    assert(out(0L).getAs[Long]("keep") == 1L, s"doc0 failed: ${failedRules(0L)}")
    assert(failedRules(1L) == Set("r1_word_count"))
    assert(failedRules(2L).contains("r2_mean_word_len"))
    assert(failedRules(3L).contains("r3_symbol_ratio"))
    assert(failedRules(3L).contains("r6_alpha_words")) // '#' words have no alpha
    assert(failedRules(4L) == Set("r4_bullet_lines"))
    assert(failedRules(5L).contains("r5_ellipsis_lines"))
    assert(failedRules(6L) == Set("r6_alpha_words"))
    assert(failedRules(7L) == Set("r7_stop_words"))
    assert(out(1L).getAs[Long]("n_failed") == 1L)
    assert(out(0L).getAs[Long]("n_failed") == 0L)
  }

  test("GopherSignalsExpression matches the HOF spelling on every counter incl. edges") {
    import org.apache.spark.sql.functions.{col, expr, length, lit, replace, size, split}
    val stops = TextAnalysis.gopherStops
    val texts = Seq(
      "",                                         // empty: 1 word, 1 line
      "the be to of and that have with",          // all 8 stops
      "the the the be",                           // repeats: 2 distinct stops
      "- bullet line\n* starred\n• unicode bullet\nplain", // bullet variants
      "   - spaced bullet\nend with dots...\ntrail...   ", // ltrim/rtrim edges
      "a#b## c...d.....e......",                  // hashes + dot runs (1+2 runs)
      "müller Straße ünïcode 文字 1234",            // multi-byte, mixed alpha
      "tab\tseparated stays one\ttoken",           // tabs are not delimiters
      "...\n...leading dots\ndots... mid",         // dots at line edges
      "x " * 30 + "y")                            // trailing-space words
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val stopsIn = stops.map(s => s"'$s'").mkString(", ")
    val hof = d
      .withColumn("__w", split(col("text"), " "))
      .withColumn("__l", split(col("text"), "\n"))
      .select(col("doc_id"),
        size(col("__w")).cast("long").as("n_words"),
        expr("aggregate(__w, 0L, (a, x) -> a + length(x))").as("tot_len"),
        expr("size(filter(__w, x -> x rlike '[A-Za-z]'))").cast("long").as("alpha"),
        (length(col("text")) - length(replace(col("text"), lit("#"), lit("")))).cast("long").as("hash"),
        ((length(col("text")) - length(replace(col("text"), lit("..."), lit("")))) / 3).cast("long").as("ell"),
        size(col("__l")).cast("long").as("nl"),
        expr("size(filter(__l, x -> startswith(ltrim(x), '-') OR startswith(ltrim(x), '*') OR startswith(ltrim(x), '•')))").cast("long").as("bul"),
        expr("size(filter(__l, x -> endswith(rtrim(x), '...')))").cast("long").as("elll"),
        expr(s"size(array_intersect(array_distinct(__w), array($stopsIn)))").cast("long").as("stop"))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val kernel = d
      .withColumn("_g", GopherSignalsExpression.signals(col("text"), stops))
      .select(col("doc_id") +: (0 until 9).map(i => col("_g").getItem(i)): _*)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    texts.indices.foreach { i =>
      assert(kernel(i.toLong) == hof(i.toLong),
        s"doc $i (${texts(i).take(40)}): kernel ${kernel(i.toLong)} != hof ${hof(i.toLong)}")
    }
  }

  test("MaxGramFreqExpression matches the interpreted sort-and-run HOF spelling") {
    import org.apache.spark.sql.functions.{col, expr, split}
    val texts = Seq(
      "", "solo", "two words", "a b a b a b a b",      // top 2-gram 'a b' x4
      "x x x x x x",                                    // 'x x' x5 overlapping
      "the cat sat on the cat sat again the cat sat",
      "no repeats here at all whatsoever truly none",
      ("spam ham " * 30).trim)
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    def topCount(gramCol: String): String =
      s"""aggregate(array_sort($gramCol),
         |  named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'best', 0),
         |  (a, x) -> named_struct(
         |    'prev', x,
         |    'run',  CASE WHEN x = a.prev THEN a.run + 1 ELSE 1 END,
         |    'best', greatest(a.best,
         |                     CASE WHEN x = a.prev THEN a.run + 1 ELSE 1 END)),
         |  a -> a.best)""".stripMargin
    Seq(2, 3).foreach { k =>
      val parts = (0 until k).map(i => s"element_at(__w, i + $i)").mkString(", ")
      val hof = d.withColumn("__w", split(col("text"), " "))
        .withColumn("__g", expr(
          s"""CASE WHEN size(__w) >= $k
             | THEN transform(sequence(1, size(__w) - ${k - 1}),
             |                i -> concat_ws(' ', $parts))
             | ELSE array() END""".stripMargin))
        .select(col("doc_id"), expr(topCount("__g")).as("best_hof"),
          MaxGramFreqExpression.maxFreq(col("__w"), k).as("best_fast"))
      hof.collect().foreach { r =>
        assert(r.getAs[Int]("best_hof") == r.getAs[Int]("best_fast"),
          s"doc ${r.getLong(0)} k=$k")
      }
    }
  }

  test("MinKGramHashExpression matches the interpreted HOF spelling exactly") {
    import org.apache.spark.sql.functions.{col, expr}
    val (g, st, k) = (LlmDataParams.fingerprintGram,
      LlmDataParams.fingerprintStride, LlmDataParams.fingerprintK)
    val texts = Seq(
      "",                                   // no grams -> null
      "short",                              // < gram chars -> null
      "exactly8",                           // one gram, < k distinct -> null
      "abcdabcdabcdabcdabcd",               // stride-aligned duplicate grams
      "the quick brown fox jumps over the lazy dog and keeps going for a while longer",
      ("rep " * 40).trim,                   // heavy duplication
      "Ünïcödé tøkens ☃ mixed with ascii padding to exceed the gram width",
      (0 until 200).map(i => ('a' + i % 26).toChar).mkString)
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    // the pre-r9 HOF spelling, verbatim
    val pick = (1 to k).map(i => s"element_at(__h, $i)").mkString(", ")
    val hof = d
      .withColumn("__g", expr(
        s"""CASE WHEN length(text) >= $g
           | THEN transform(sequence(1, length(text) - ${g - 1}, $st),
           |                i -> substring(text, i, $g))
           | ELSE array() END""".stripMargin))
      .withColumn("ng_hof", org.apache.spark.sql.functions.size(col("__g")).cast("long"))
      .withColumn("__h", expr("array_sort(array_distinct(transform(__g, x -> md5(x))))"))
      .withColumn("fp_hof", expr(s"md5(concat($pick))"))
      .select("doc_id", "ng_hof", "fp_hof")
    val fast = TextAnalysis.fingerprint(d).select("doc_id", "n_grams", "fingerprint")
    hof.join(fast, "doc_id").collect().foreach { r =>
      assert(r.getAs[Long]("ng_hof") == r.getAs[Long]("n_grams"), s"doc ${r.getLong(0)} n_grams")
      assert(r.getAs[String]("fp_hof") == r.getAs[String]("fingerprint"), s"doc ${r.getLong(0)} fingerprint")
    }
  }

  test("HashedNgramScoreExpression matches the interpreted HOF spelling exactly") {
    import org.apache.spark.sql.functions.{col, expr, split}
    val (mod, shift) = (21, 10)
    val texts = Seq(
      "", "solo", "two words",
      "the quick brown fox jumps over the lazy dog",
      "rep rep rep rep", "Ünïcödé tøkens WITH 123",
      "double  space trailing ")
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    // the pre-r9 three-lambda spelling, verbatim
    val hof = d.withColumn("__w", split(col("text"), " "))
      .withColumn("__f", expr(
        """concat(__w, CASE WHEN size(__w) >= 2
          | THEN transform(sequence(1, size(__w) - 1),
          |                i -> concat(element_at(__w, i), ' ', element_at(__w, i + 1)))
          | ELSE array() END)""".stripMargin))
      .select(col("doc_id"), org.apache.spark.sql.functions.size(col("__f")).cast("long").as("nf_hof"),
        expr(s"""aggregate(transform(transform(__f, t -> md5(t)),
                |  h -> cast((${LlmDataParams.hexDecode4("h")}) % $mod - $shift as bigint)),
                |  cast(0 as bigint), (acc, x) -> acc + x)""".stripMargin).as("score_hof"))
    val fast = TextAnalysis.hashClassifier(d, mod = mod, shift = shift)
      .select(col("doc_id"), col("n_feats"), col("score"))
    hof.join(fast, "doc_id").collect().foreach { r =>
      assert(r.getAs[Long]("nf_hof") == r.getAs[Long]("n_feats"), s"doc ${r.getLong(0)} n_feats")
      assert(r.getAs[Long]("score_hof") == r.getAs[Long]("score"), s"doc ${r.getLong(0)} score")
    }
  }

  test("WinnowSelectExpression matches the interpreted HOF spelling bit for bit") {
    import org.apache.spark.sql.functions.{col, expr, split}
    val gram = 3; val window = 4
    val texts = Seq(
      "", "solo", "just two", "one two three",
      "a b c d e f g h i j k l m n o p q r s t u v w x y z",
      "rep rep rep rep rep rep rep rep",
      "Ünïcödé tøkens mixed WITH case and 123 numbers here today",
      "double  space trailing ") // split yields empty tokens
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    // the pre-r9 nested-HOF spelling, verbatim
    val decode = LlmDataParams.hexDecode4("h")
    val parts = (0 until gram).map(j => s"element_at(__w, i + $j)").mkString(", ")
    val hof = d.withColumn("__w", split(col("text"), " "))
      .withColumn("__hashes", expr(
        s"""CASE WHEN size(__w) >= $gram
           | THEN transform(transform(sequence(1, size(__w) - ${gram - 1}),
           |                          i -> md5(concat_ws(' ', $parts))),
           |                h -> cast(($decode) as bigint))
           | ELSE array() END""".stripMargin))
      .withColumn("sel_hof", expr(
        s"""array_sort(array_distinct(transform(
           |  sequence(1, greatest(size(__hashes) - ${window - 1}, 1)),
           |  i -> array_min(slice(__hashes, i, $window)))))""".stripMargin))
      .select(col("doc_id"), col("sel_hof"))
    val fast = TextAnalysis.winnowSelected(d)
      .select(col("doc_id"), col("__sel").as("sel_fast"))
    hof.join(fast, "doc_id").collect().foreach { r =>
      assert(r.getSeq[Any](1) == r.getSeq[Any](2), s"doc ${r.getLong(0)}")
    }
  }

  test("winnowFingerprint: shared token runs share fingerprints, density bounded") {
    val common = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    val d = docs(
      0L -> ("one two " + common + " end marker"),
      1L -> ("different lead " + common + " other tail"), // shares a 12-token run with 0
      2L -> "completely unrelated short text here now with many extra unmatched tokens",
      3L -> "just two") // shorter than one shingle
    val out = TextAnalysis.winnowFingerprint(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // plain-Scala replay (16-bit md5-prefix over word trigrams)
    def hash16(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 4), 16)
    }
    def selected(text: String): Seq[Long] = {
      val w = text.split(" ").toSeq
      val hashes = w.sliding(3).filter(_.size == 3).map(s => hash16(s.mkString(" "))).toSeq
      val n = math.max(hashes.length - 3, 1)
      (0 until n).map(i => hashes.slice(i, math.min(i + 4, hashes.length)).min)
        .distinct.sorted
    }
    val t0 = "one two " + common + " end marker"
    assert(out(0L).getAs[Long]("n_grams") == t0.split(" ").length - 2)
    assert(out(0L).getAs[Long]("n_selected") == selected(t0).length)
    // density: winnowing selects fewer than all shingles
    assert(out(0L).getAs[Long]("n_selected") < out(0L).getAs[Long]("n_grams"))
    // the 12-token shared run guarantees common fingerprints
    val s0 = selected(t0).toSet
    val s1 = selected("different lead " + common + " other tail").toSet
    assert(s0.intersect(s1).nonEmpty)
    // short doc: no shingles, null digest
    assert(out(3L).getAs[Long]("n_grams") == 0L)
    assert(out(3L).getAs[Long]("n_selected") == 0L)
    assert(out(3L).isNullAt(out(3L).fieldIndex("winnow_digest")))
  }

  test("sourceReport: counts, dup fraction, and exact language entropy per source") {
    val d = Seq(
      (0L, "srcA", "en", "one two three"),
      (1L, "srcA", "en", "one two three"),        // exact dup of 0
      (2L, "srcA", "de", "vier funf"),
      (3L, "srcA", "de", "sechs sieben acht"),
      (4L, "srcB", "en", "only doc here"))
      .toDF("doc_id", "source", "lang", "text")
    val out = TextAnalysis.sourceReport(d).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val a = out("srcA")
    assert(a.getAs[Long]("n_docs") == 4L)
    assert(a.getAs[Long]("n_tokens") == 3 + 3 + 2 + 3)
    assert(a.getAs[Long]("n_distinct_texts") == 3L)
    assert(math.abs(a.getAs[Double]("dup_frac") - 0.25) < 1e-9)
    // entropy of {en: 1/2, de: 1/2} = ln 2; quantization is per cell
    val cell = math.floor(0.5 * math.log(0.5) * 1e6 + 0.5).toLong
    assert(a.getAs[Long]("entropy_unats") == -2 * cell)
    assert(math.abs(a.getAs[Double]("lang_entropy") - math.log(2.0)) < 1e-5)
    val b = out("srcB")
    assert(b.getAs[Long]("n_docs") == 1L)
    assert(b.getAs[Long]("entropy_unats") == 0L)
  }

  test("winnowCandidates pairs docs sharing fingerprints, caps hot values") {
    val common = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    val d = docs(
      0L -> ("one two " + common + " end marker"),
      1L -> ("different lead " + common + " other tail"),
      2L -> "completely unrelated text here now with many extra unmatched tokens today")
    val res = TextAnalysis.winnowCandidates(d).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("n_shared")))
    assert(res.length == 1)
    assert(res(0)._1 == 0L && res(0)._2 == 1L && res(0)._3 >= 2L)
    // cap: with maxBucket = 0 every fingerprint is "hot" -> no pairs
    assert(TextAnalysis.winnowCandidates(d, maxBucket = 0).count() == 0L)
  }

  test("hashClassifier scores match a plain-Scala md5-bucket replay") {
    val texts = Map(
      0L -> "the cat sat on the mat",
      1L -> "one",
      2L -> "alpha beta alpha beta")
    val d = docs(texts.toSeq: _*)
    val out = TextAnalysis.hashClassifier(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    def weight(t: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(md.substring(0, 4), 16) % 21) - 10
    }
    texts.foreach { case (id, text) =>
      val w = text.split(" ").toSeq
      val feats = w ++ w.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      val expected = feats.map(weight).sum
      val r = out(id)
      assert(r.getAs[Long]("n_feats") == feats.length.toLong, s"doc $id n_feats")
      assert(r.getAs[Long]("score") == expected, s"doc $id score")
      assert(r.getAs[Boolean]("keep") == (expected >= 0))
      assert(math.abs(r.getAs[Double]("avg_weight") -
        expected.toDouble / feats.length) < 1e-12)
    }
  }

  test("TokenStatsExpression matches the split/regex spellings exactly") {
    import org.apache.spark.sql.functions.{col, expr, size, split}
    val texts = Seq(
      "",                                    // split('') -> [''] (1 field), 0 bpe matches
      " ",                                   // two empty fields
      "   leading and   trailing   ",        // empty fields kept (limit -1)
      "plain lowercase words only",
      "MIXED Case Letters",                  // uppercase = 1 match per char
      "abc123def 456 ghi-789!",              // run transitions and punctuation
      "tabs\tand\nnewlines are not spaces",
      "Ünïcödé tøkens ☃ mixed with ascii",   // 2- and 3-byte sequences
      "astral 😀😀 pair", // 4-byte code points, 1 match each
      ("a1 b2! " * 50).trim)
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val both = d.select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("ws_ref"),
      size(expr(s"regexp_extract_all(text, '${TextAnalysis.bpePattern}', 0)"))
        .cast("long").as("bpe_ref"),
      TokenStatsExpression.tokenStats(col("text")).as("tc"))
    both.collect().foreach { r =>
      val tc = r.getAs[scala.collection.Seq[Long]]("tc")
      assert(tc(0) == r.getAs[Long]("ws_ref"), s"doc ${r.getLong(0)} ws")
      assert(tc(1) == r.getAs[Long]("bpe_ref"), s"doc ${r.getLong(0)} bpe")
    }
    // null text -> null stats, matching the nullIntolerant regex spelling
    val withNull = Seq((0L, null: String)).toDF("doc_id", "text")
      .select(TokenStatsExpression.tokenStats(col("text")).as("tc"))
    assert(withNull.collect()(0).isNullAt(0))
  }

  test("PiiScanExpression matches the nested regex spelling exactly") {
    import org.apache.spark.sql.functions.{col, lit, regexp_extract_all, regexp_replace, size}
    import LlmDataParams.{emailPattern, phonePattern}
    val texts = Seq(
      "",
      "no pii here at all",
      "mail bob.smith_1@ex-corp.com today",
      "a@b.c",                                  // minimal email
      "a@b@c.d",                                // retry after failed domain -> a@<EMAIL>
      "a@b_c@d.e",                              // '_' breaks the domain, succeeds from 'b'
      "a@.b.c",                                 // empty domain, no match anywhere
      "a@b.1c.de",                              // tld fails, local rescan finds no '@'
      "x.y@z.co.uk stops at first tld",         // match is x.y@z.co
      "a@b.cx@d.ef",                            // adjacent: second '@' has no later '@'
      "123-456-7890@x.com",                     // phone counted, but redacted as <EMAIL>
      "call 555-867-5309 or 555-867-5309x",     // trailing extra digit on 2nd? no: 'x'
      "1234-567-8901 shifted match",            // match starts at '2'
      "123-456-78901 long tail",                // 12-byte prefix matches, '1' remains
      "123-456-7890123-456-7890",               // adjacent phones, both replaced
      "12-34-5678 and 123-45-6789 misses",
      "Ünïcödé ré@dacted.com ☃ 999-888-7777",   // multi-byte bytes never match classes
      "UPPER@CASE.COM stays, lower@case.com goes",
      ("u" + "a.b-c_d@host-1.org x 111-222-3333 " * 20).trim)
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val both = d.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(emailPattern), lit(0)))
        .cast("long").as("ne_ref"),
      size(regexp_extract_all(col("text"), lit(phonePattern), lit(0)))
        .cast("long").as("np_ref"),
      regexp_replace(regexp_replace(col("text"), emailPattern, "<EMAIL>"),
        phonePattern, "<PHONE>").as("red_ref"),
      PiiScanExpression.piiScan(col("text")).as("pii"))
    both.collect().foreach { r =>
      val p = r.getAs[org.apache.spark.sql.Row]("pii")
      assert(p.getAs[Long]("n_emails") == r.getAs[Long]("ne_ref"),
        s"doc ${r.getLong(0)} n_emails")
      assert(p.getAs[Long]("n_phones") == r.getAs[Long]("np_ref"),
        s"doc ${r.getLong(0)} n_phones")
      assert(p.getAs[String]("redacted") == r.getAs[String]("red_ref"),
        s"doc ${r.getLong(0)} redacted")
    }
    // Randomized sweep over fragments chosen so concatenation builds
    // real matches, near-misses, and boundary collisions often.
    val frags = Array("123", "456-7890", "-", "@", "ex.com", "a", ".",
      "_", " ", "555-867-5309", "bob@x.co", "12", "9", "b.c", "@@")
    val rnd = new scala.util.Random(42)
    val fuzz = (0 until 400).map { i =>
      (i.toLong, (0 until (1 + rnd.nextInt(12)))
        .map(_ => frags(rnd.nextInt(frags.length))).mkString)
    }.toDF("doc_id", "text")
    val fz = fuzz.select(
      size(regexp_extract_all(col("text"), lit(emailPattern), lit(0)))
        .cast("long").as("ne_ref"),
      size(regexp_extract_all(col("text"), lit(phonePattern), lit(0)))
        .cast("long").as("np_ref"),
      regexp_replace(regexp_replace(col("text"), emailPattern, "<EMAIL>"),
        phonePattern, "<PHONE>").as("red_ref"),
      col("text"),
      PiiScanExpression.piiScan(col("text")).as("pii"))
    fz.collect().foreach { r =>
      val p = r.getAs[org.apache.spark.sql.Row]("pii")
      assert(p.getAs[Long]("n_emails") == r.getAs[Long]("ne_ref"),
        s"fuzz '${r.getAs[String]("text")}' n_emails")
      assert(p.getAs[Long]("n_phones") == r.getAs[Long]("np_ref"),
        s"fuzz '${r.getAs[String]("text")}' n_phones")
      assert(p.getAs[String]("redacted") == r.getAs[String]("red_ref"),
        s"fuzz '${r.getAs[String]("text")}' redacted")
    }
    // null text -> null struct, matching the nullIntolerant spelling
    val withNull = Seq((0L, null: String)).toDF("doc_id", "text")
      .select(PiiScanExpression.piiScan(col("text")).as("pii"))
    assert(withNull.collect()(0).isNullAt(0))
  }

  test("TokenProfileExpression rejects more than 30 marker sets loudly") {
    // memberships pack into one Int bitmask; past 31 sets the shift
    // would wrap silently and corrupt counts — fail at construction.
    import org.apache.spark.sql.functions.col
    val tooMany = (0 until 31).map(i => Seq(s"marker$i"))
    val ex = intercept[IllegalArgumentException] {
      TokenProfileExpression.tokenProfile(col("text"), Seq("the"), tooMany)
    }
    assert(ex.getMessage.contains("at most 30 marker sets"))
    // 30 sets is still fine
    TokenProfileExpression.tokenProfile(
      col("text"), Seq("the"), (0 until 30).map(i => Seq(s"m$i")))
  }

  test("TokenProfileExpression matches the split/distinct/filter spellings exactly") {
    import org.apache.spark.sql.functions.{array_distinct, col, expr, size, split}
    import LlmDataParams.{langMarkers, stopwords}
    def inList(items: Seq[String]) = items.map(s => s"'$s'").mkString("(", ",", ")")
    val texts = Seq(
      "",                                    // one empty token
      " ",                                   // two empty tokens, 1 distinct
      "the the the",                         // stopword repeats
      "  double  spaces  keep  empties  ",
      "der hund und die katze ist nicht da", // de markers
      "的 是 了 在 我 mixed with the english", // zh multi-byte markers + en stopword
      "el la que de y no et le la les",      // es + fr marker overlap ('la', 'de')
      "Ünïcödé tøkens ☃ count code points not bytes",
      "astral 😀 token",                     // 4-byte code point, length 1
      ("the a of and to in is " * 30).trim)  // all-stopword long doc
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val markerCols = langMarkers.zipWithIndex.map { case ((lang, markers), i) =>
      (expr(s"size(filter(__w, t -> t IN ${inList(markers)}))").cast("long").as(s"ref_$lang"), i)
    }
    val refs = d.withColumn("__w", split(col("text"), " "))
    val both = refs.select(
      Seq(col("doc_id"),
        size(col("__w")).cast("long").as("nt_ref"),
        size(array_distinct(col("__w"))).cast("long").as("nd_ref"),
        expr("aggregate(__w, 0, (acc, t) -> acc + length(t))").cast("long").as("tl_ref"),
        expr(s"size(filter(__w, t -> t IN ${inList(stopwords)}))").cast("long").as("ns_ref"),
        TokenProfileExpression.tokenProfile(
          col("text"), stopwords, langMarkers.map(_._2)).as("tp")) ++
        markerCols.map(_._1): _*)
    both.collect().foreach { r =>
      val tp = r.getAs[scala.collection.Seq[Long]]("tp")
      val id = r.getLong(0)
      assert(tp(0) == r.getAs[Long]("nt_ref"), s"doc $id n_tokens")
      assert(tp(1) == r.getAs[Long]("nd_ref"), s"doc $id n_distinct")
      assert(tp(2) == r.getAs[Long]("tl_ref"), s"doc $id tot_len")
      assert(tp(3) == r.getAs[Long]("ns_ref"), s"doc $id n_stop")
      langMarkers.zipWithIndex.foreach { case ((lang, _), i) =>
        assert(tp(4 + i) == r.getAs[Long](s"ref_$lang"), s"doc $id s_$lang")
      }
    }
    // Randomized sweep: fragments drawn from every marker set plus
    // noise, so membership, duplication, and empty fields collide.
    val frags = (stopwords ++ langMarkers.flatMap(_._2) ++
      Seq("", " ", "  ", "xyzzy", "Ünï", "的", "😀", "der der")).toArray
    val rnd = new scala.util.Random(7)
    val fuzz = (0 until 400).map { i =>
      (i.toLong, (0 until (1 + rnd.nextInt(15)))
        .map(_ => frags(rnd.nextInt(frags.length))).mkString(" "))
    }.toDF("doc_id", "text")
    val fz = fuzz.withColumn("__w", split(col("text"), " ")).select(
      Seq(col("text"),
        size(col("__w")).cast("long").as("nt_ref"),
        size(array_distinct(col("__w"))).cast("long").as("nd_ref"),
        expr("aggregate(__w, 0, (acc, t) -> acc + length(t))").cast("long").as("tl_ref"),
        expr(s"size(filter(__w, t -> t IN ${inList(stopwords)}))").cast("long").as("ns_ref"),
        TokenProfileExpression.tokenProfile(
          col("text"), stopwords, langMarkers.map(_._2)).as("tp")) ++
        markerCols.map(_._1): _*)
    fz.collect().foreach { r =>
      val tp = r.getAs[scala.collection.Seq[Long]]("tp")
      val t = r.getAs[String]("text")
      assert(tp(0) == r.getAs[Long]("nt_ref"), s"fuzz '$t' n_tokens")
      assert(tp(1) == r.getAs[Long]("nd_ref"), s"fuzz '$t' n_distinct")
      assert(tp(2) == r.getAs[Long]("tl_ref"), s"fuzz '$t' tot_len")
      assert(tp(3) == r.getAs[Long]("ns_ref"), s"fuzz '$t' n_stop")
      langMarkers.zipWithIndex.foreach { case ((lang, _), i) =>
        assert(tp(4 + i) == r.getAs[Long](s"ref_$lang"), s"fuzz '$t' s_$lang")
      }
    }
    // null text -> null profile, matching the nullIntolerant spellings
    val withNull = Seq((0L, null: String)).toDF("doc_id", "text")
      .select(TokenProfileExpression.tokenProfile(
        col("text"), stopwords, langMarkers.map(_._2)).as("tp"))
    assert(withNull.collect()(0).isNullAt(0))
  }

  test("ReadabilityStatsExpression matches the HOF spelling exactly") {
    import org.apache.spark.sql.functions.{col, expr, greatest, length, lit, size, split, translate}
    // the spelling the kernel replaced (and the DuckDB oracle mirrors)
    val vowels = "('a','e','i','o','u')"
    val frags = Seq("the", "cat.", "bee", "easy", "", " ", "  ", "a!?",
      "Ünïcödé", "日本語テキスト", "😀", "queueing", "rhythm", "co-op",
      "AEIOU", "x.y!z?", "...", "ae", "ea", "a e i o u")
    val rnd = new scala.util.Random(41)
    val fuzz = (0 until 300).map { i =>
      (i.toLong, (0 until rnd.nextInt(12))
        .map(_ => frags(rnd.nextInt(frags.length))).mkString(" "))
    } :+ (9999L, "")
    val df = fuzz.toDF("doc_id", "text")
      .withColumn("__w", split(col("text"), " "))
      .select(col("text"),
        ReadabilityStatsExpression.stats(col("text")).as("k"),
        size(col("__w")).cast("long").as("nt_ref"),
        greatest(lit(1L), (length(col("text")) -
          length(translate(col("text"), ".!?", ""))).cast("long")).as("ns_ref"),
        expr("aggregate(transform(__w, w -> size(filter(sequence(1, " +
          "greatest(length(w), 1)), i -> substring(w, i, 1) IN " +
          s"$vowels AND (i = 1 OR NOT substring(w, i - 1, 1) IN $vowels)))), " +
          "cast(0 as bigint), (a, x) -> a + x)").as("sy_ref"))
    df.collect().foreach { r =>
      val k = r.getAs[scala.collection.Seq[Long]]("k")
      val t = r.getAs[String]("text")
      assert(k(0) == r.getAs[Long]("nt_ref"), s"'$t' n_tokens")
      assert(k(1) == r.getAs[Long]("ns_ref"), s"'$t' n_sentences")
      assert(k(2) == r.getAs[Long]("sy_ref"), s"'$t' n_syllables")
    }
    // null text -> null stats (nullIntolerant)
    val withNull = Seq((0L, null: String)).toDF("doc_id", "text")
      .select(ReadabilityStatsExpression.stats(col("text")).as("k"))
    assert(withNull.collect()(0).isNullAt(0))
  }

  test("heapsFit recovers a planted power law and is partition-exact") {
    import org.apache.spark.sql.functions.col
    // plant V = 3 * n^0.6 exactly: docs of n tokens with round(3*n^0.6)
    // distinct types (type i repeated to fill) — the fit must recover
    // beta ~ 0.6, K ~ 3 through the micro quantization
    val rows = (1 to 60).map { i =>
      val n = 20 + i * 7
      val v = math.max(1, math.round(3.0 * math.pow(n, 0.6)).toInt)
      val toks = (0 until n).map(j => s"t${j % v}")
      (i.toLong, toks.mkString(" "))
    }
    val d = rows.toDF("doc_id", "text")
    val r = TextAnalysis.heapsFit(d).head()
    assert(r.getAs[Long]("n_docs_fit") == 60L)
    assert(math.abs(r.getAs[Double]("beta") - 0.6) < 0.02,
      s"beta ${r.getAs[Double]("beta")}")
    assert(math.abs(r.getAs[Double]("k") - 3.0) < 0.25,
      s"k ${r.getAs[Double]("k")}")
    // partition-exact: integer sums commute
    val again = TextAnalysis.heapsFit(d.repartition(9)).head()
    assert(again.getAs[Double]("beta") == r.getAs[Double]("beta"))
    assert(again.getAs[Double]("k") == r.getAs[Double]("k"))
    // an empty-text doc is a legitimate (n=1, V=1) point, not a drop
    val withEmpty = TextAnalysis.heapsFit(
      d.union(Seq((999L, "")).toDF("doc_id", "text"))).head()
    assert(withEmpty.getAs[Long]("n_docs_fit") == 61L)
  }

  test("bootstrapMeans: rep 0 exact, weights replay an independent md5, Poisson shape") {
    import org.apache.spark.sql.functions.{col, lit}
    val n = 4000
    val d = (0 until n).map(i => (i.toLong, (i % 50) + 1L))
      .toDF("doc_id", "n_tokens")
    val out = TextAnalysis.bootstrapMeans(d).orderBy("rep").collect()
    assert(out.length == LlmDataParams.bootstrapReps + 1)
    // rep 0 = the unweighted point estimate, exact
    val exactSum = (0 until n).map(i => (i % 50) + 1L).sum
    assert(out(0).getAs[Long]("sum_w") == n.toLong)
    assert(out(0).getAs[Long]("sum_wx") == exactSum)
    assert(out(0).getAs[Long]("mean_micro") == exactSum * 1000000L / n)
    // every replicate mean lands near the point estimate (weighted
    // means of the same bounded metric; Poisson noise at n=4000 is
    // well under 5%)
    val pe = out(0).getAs[Long]("mean_micro")
    out.drop(1).foreach { r =>
      val m = r.getAs[Long]("mean_micro")
      assert(math.abs(m - pe) < pe / 20, s"rep ${r.getLong(0)}: $m vs $pe")
      // sum_w concentrates around n (sd = sqrt(n) ~ 63; allow 6 sigma)
      assert(math.abs(r.getAs[Long]("sum_w") - n) < 400)
    }
    // the draw replays on an independent JVM md5: recompute replicate
    // 1's total weight directly and compare with sum_w
    val mdW = (0 until n).map { id =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"boot1:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val u = java.lang.Long.parseLong(hex.substring(0, 8), 16) * 1000000L / 4294967296L
      LlmDataParams.poissonCumMicro.count(u >= _).toLong
    }.sum
    assert(out(1).getAs[Long]("sum_w") == mdW,
      s"spark ${out(1).getAs[Long]("sum_w")} vs jvm $mdW")
    // partition-invariant
    val out8 = TextAnalysis.bootstrapMeans(d.repartition(8))
      .orderBy("rep").collect().map(_.toSeq).toSeq
    assert(out8 == out.map(_.toSeq).toSeq)
  }

  test("bootstrapMeansByGroup: each group is the exact restriction of the corpus pass") {
    import org.apache.spark.sql.functions.{col, lit}
    val d = (0 until 900).map(i =>
      (i.toLong, (i % 40) + 1L, if (i % 3 == 0) "a" else "b"))
      .toDF("doc_id", "n_tokens", "src")
    val grouped = TextAnalysis.bootstrapMeansByGroup(d, "src")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getAs[Long]("sum_w"), r.getAs[Long]("sum_wx")))).toMap
    // shared draws: group sums must equal the corpus-wide pass run on
    // the group's slice alone (sub-corpus composition)
    Seq("a", "b").foreach { g =>
      val solo = TextAnalysis.bootstrapMeans(d.filter(col("src") === g))
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getAs[Long]("sum_w"), r.getAs[Long]("sum_wx")))).toMap
      solo.foreach { case (rep, sums) =>
        assert(grouped((g, rep)) == sums, s"group $g rep $rep")
      }
    }
    // and the two groups' sums add up to the corpus-wide pass
    val whole = TextAnalysis.bootstrapMeans(d).collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Long]("sum_w"), r.getAs[Long]("sum_wx")))).toMap
    whole.foreach { case (rep, (sw, sx)) =>
      assert(grouped(("a", rep))._1 + grouped(("b", rep))._1 == sw)
      assert(grouped(("a", rep))._2 + grouped(("b", rep))._2 == sx)
    }
  }

  test("readability computes hand-checked Flesch components") {
    val d = docs(0L -> "the cat sat. it ran!", 1L -> "bee easy")
    val rows = TextAnalysis.readability(d).orderBy("doc_id").collect()
    // doc 0: 5 tokens, 2 terminators, 1 vowel group per word
    val r0 = rows(0)
    assert(r0.getAs[Long]("n_tokens") == 5L)
    assert(r0.getAs[Long]("n_sentences") == 2L)
    assert(r0.getAs[Long]("n_syllables") == 5L)
    assert(math.abs(r0.getAs[Double]("words_per_sentence") - 2.5) < 1e-9)
    assert(math.abs(r0.getAs[Double]("syllables_per_word") - 1.0) < 1e-9)
    assert(math.abs(r0.getAs[Double]("flesch") -
      (206.835 - 1.015 * 2.5 - 84.6 * 1.0)) < 1e-9)
    // doc 1: no terminator -> sentence floor of 1; "bee" and "easy"
    // each collapse their consecutive vowels into ONE group
    val r1 = rows(1)
    assert(r1.getAs[Long]("n_sentences") == 1L)
    assert(r1.getAs[Long]("n_syllables") == 2L)
  }
}
