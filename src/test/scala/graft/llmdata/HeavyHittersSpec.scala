package graft.llmdata

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(tokens: Seq[String], perDoc: Int = 5) =
    tokens.grouped(perDoc).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")

  test("eviction-forcing capacity still returns the EXACT top-k") {
    // 50 a's, 30 b's, 20 distinct singletons: capacity 4 forces
    // constant Misra-Gries eviction, but a and b must survive
    val toks = new scala.util.Random(7).shuffle(
      Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ (0 until 20).map(i => s"s$i"))
    val out = TextAnalysis.heavyHittersExact(
        corpus(toks).repartition(4), k = 2, capacity = 4)
      .orderBy("rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", 50L, 1L), ("b", 30L, 2L)))
  }

  test("unprovable top-k fails loudly instead of answering approximately") {
    // all-distinct tokens: the k-th count (1) can never beat N/capacity
    val toks = (0 until 40).map(i => s"t$i")
    val ex = intercept[IllegalStateException] {
      TextAnalysis.heavyHittersExact(corpus(toks), k = 2, capacity = 4)
        .collect()
    }
    assert(ex.getMessage.contains("not provable"))
  }

  test("fewer candidates than k + uncovered vocabulary fails loudly (ADVICE r13 #1)") {
    // the advice scenario, constructed deterministically: "a" x100,
    // then 7 singletons fill the capacity-8 summary, then an 8th
    // singleton triggers the decrement-all eviction RIGHT at stream
    // end — the final summary is {a: 99} alone, so the candidate
    // union (1 token) is smaller than k = 5 while the true vocabulary
    // is 9. The OLD guard read only the last returned row's count
    // (100 > N/capacity = 13) and would have declared a silently
    // 1-rank "top-5" provable; the new guard sees the candidates
    // cover only 100 of 108 occurrences and fails.
    val toks = Seq.fill(100)("a") ++ (1 to 8).map(i => s"s$i")
    val ex = intercept[IllegalStateException] {
      TextAnalysis.heavyHittersExact(
        corpus(toks).coalesce(1), k = 5, capacity = 8).collect()
    }
    assert(ex.getMessage.contains("not provable"), ex.getMessage)
    assert(ex.getMessage.contains("vocabulary exceeds"), ex.getMessage)
  }

  test("vocabulary smaller than k returns ALL tokens exactly, no throw") {
    // candidates == the whole vocabulary, proven by occurrence-sum
    // coverage: a short answer here IS the exact top-k
    val toks = Seq.fill(5)("x") ++ Seq.fill(3)("y")
    val out = TextAnalysis.heavyHittersExact(
        corpus(toks).repartition(3), k = 5, capacity = 16)
      .orderBy("rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("x", 5L, 1L), ("y", 3L, 2L)))
  }

  test("result is partitioning-independent") {
    val toks = Seq.fill(9)("x") ++ Seq.fill(6)("y") ++ Seq.fill(3)("z") ++
      (0 until 6).map(i => s"r$i")
    val one = TextAnalysis.heavyHittersExact(
      corpus(toks).repartition(1), k = 3, capacity = 16).collect().toSeq
    val many = TextAnalysis.heavyHittersExact(
      corpus(toks).repartition(7), k = 3, capacity = 16).collect().toSeq
    assert(one == many)
    assert(one.map(_.getString(0)) == Seq("x", "y", "z"))
  }

  // ---------------------------------------------------- lineDedup

  test("lineDedup drops corpus-repeated lines from EVERY doc, keeps order") {
    val docs = Seq(
      (1L, "unique alpha\nCOOKIE BANNER\nunique beta"),
      (2L, "COOKIE BANNER\nother text here"),
      (3L, "only original content"))
      .toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    // the banner occurs twice corpus-wide: dropped from BOTH docs (no
    // first-occurrence protection at line grain)
    assert(out(1L) == ((3L, 1L, "unique alpha\nunique beta")))
    assert(out(2L) == ((2L, 1L, "other text here")))
    assert(out(3L) == ((1L, 0L, "only original content")))
  }

  test("lineDedup: maxOcc raises the survival threshold; all-dropped doc empties") {
    val docs = Seq(
      (1L, "dup\ndup"), (2L, "dup"))
      .toDF("doc_id", "text")
    // "dup" occurs 3 times > maxOcc 2 -> all dropped
    val strict = Dedup.lineDedup(docs, maxOcc = 2).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(strict(1L) == "" && strict(2L) == "")
    // maxOcc 3 keeps everything
    val loose = Dedup.lineDedup(docs, maxOcc = 3).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(loose(1L) == "dup\ndup" && loose(2L) == "dup")
  }

  // --------------------------------------------------- vocabHllAudit

  test("vocabHllAudit: estimate tracks a known cardinality, exact audit is exact") {
    // 2000 distinct tokens, heavy repetition: repetition must not move
    // the sketch (registers are max-combined per distinct hash)
    val toks = (0 until 2000).flatMap(i => Seq.fill(1 + i % 3)(s"w$i"))
    val out = TextAnalysis.vocabHllAudit(corpus(toks).repartition(6))
      .collect().head
    val (m, seen, est, exact, err) = (out.getLong(0), out.getLong(1),
      out.getLong(3), out.getLong(4), out.getLong(5))
    assert(m == 64L && seen == 64L)
    assert(exact == 2000L)
    // standard HLL error is ~1.04/sqrt(64) = 13%; allow 3 sigma
    assert(err < 400000L, s"estimate $est vs exact $exact (err $err)")
  }

  test("vocabHllAudit is partitioning-independent (integer-only combine)") {
    val toks = (0 until 500).map(i => s"t${i % 311}")
    val a = TextAnalysis.vocabHllAudit(corpus(toks).repartition(1))
      .collect().head.toSeq
    val b = TextAnalysis.vocabHllAudit(corpus(toks).repartition(11))
      .collect().head.toSeq
    assert(a == b)
  }

  test("vocabHllAudit plan: the sketch aggregate never shuffles the vocabulary") {
    val qe = TextAnalysis.vocabHllAudit(corpus(Seq("a", "b", "c")))
    // the sketch side's only exchange carries <= 64 bucket rows; the
    // exact-distinct audit column is the ONLY distinct aggregate
    val plan = qe.queryExecution.executedPlan.toString
    assert(plan.contains("partial_max") || plan.contains("max(__rho"), plan)
  }

  test("vocabHllBySource: the union row IS the whole-corpus sketch (mergeability)") {
    val docs = (0 until 300).map { i =>
      (i.toLong, (0 until 8).map(j => s"w${(i * 7 + j) % 97}").mkString(" "),
        if (i % 3 == 0) "a" else "b")
    }.toDF("doc_id", "text", "source")
    val rows = TextAnalysis.vocabHllBySource(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows.keySet == Set("a", "b", "__union"))
    val whole = TextAnalysis.vocabHllAudit(docs.select("doc_id", "text"))
      .collect().head
    // register-wise max of the per-source sketches == one pass over
    // the whole corpus, column for column
    assert(rows("__union") ==
      ((whole.getLong(1), whole.getLong(2), whole.getLong(3))))
  }

  // ---------------------------------------------- bpeFirstMerges

  test("bpeFirstMerges weights pairs by corpus frequency via the vocabulary") {
    // "ab" occurs 30 times, "abc" 5 times, "xy" once; single chars drop
    val toks = Seq.fill(30)("ab") ++ Seq.fill(5)("abc") ++ Seq("xy", "q")
    val out = TextAnalysis.bpeFirstMerges(corpus(toks), k = 5)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // (a,b) = 30 + 5 = 35 from TWO distinct words; (b,c) = 5; (x,y) = 1
    assert(out(("a", "b")) == ((35L, 1L)))
    assert(out(("b", "c")) == ((5L, 2L)))
    assert(out(("x", "y")) == ((1L, 3L)))
    assert(out.size == 3)
  }

  test("bpeFirstMerges: repetition moves counts, not the pair-explode work") {
    // the same distinct vocabulary at different corpus sizes ranks
    // identically with scaled counts — the vocab-weighted contract
    val a = TextAnalysis.bpeFirstMerges(corpus(Seq("ab", "cd", "ab")), k = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3)))
    val b = TextAnalysis.bpeFirstMerges(
        corpus(Seq.fill(3)(Seq("ab", "cd", "ab")).flatten), k = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3)))
    assert(a.toSeq == b.toSeq)
  }

  // --------------------------------------------------- bpeTrain

  /** Textbook in-memory BPE reference: greedy leftmost-non-overlapping
    * merge application, most-frequent pair first, ties by (a, b). */
  private def bpeRef(words: Map[String, Long], n: Int)
      : Seq[(String, String, Long)] = {
    var vocab = words.map { case (w, f) => w.map(_.toString).toList -> f }.toSeq
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var i = 0
    var go = true
    while (i < n && go) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (counts.isEmpty) go = false
      else {
        val ((a, b), c) = counts.toSeq.minBy { case ((x, y), m) => (-m, x, y) }
        out += ((a, b, c))
        vocab = vocab.map { case (syms, f) =>
          val acc = scala.collection.mutable.ListBuffer.empty[String]
          syms.foreach { x =>
            if (acc.nonEmpty && acc.last == a && x == b)
              acc(acc.length - 1) = a + b
            else acc += x
          }
          acc.toList -> f
        }
        i += 1
      }
    }
    out.toSeq
  }

  test("bpeTrain replays textbook BPE merge-for-merge, incl. repeat fusion") {
    // "aaaa": merge 1 must be (a,a) and apply as "aa aa" (greedy
    // leftmost non-overlapping), making merge 2 (aa,aa)
    val toks = Seq.fill(4)("aaaa") ++ Seq.fill(6)("abab") ++
      Seq.fill(3)("banana") ++ Seq.fill(2)("bandana")
    val words = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = TextAnalysis.bpeTrain(corpus(toks), nMerges = 6)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
    val ref = bpeRef(words, 6)
    assert(got == ref, s"\ngot $got\nref $ref")
    // the repeat-fusion case is actually exercised
    assert(got.exists { case (a, b, _) => a == b },
      s"fixture too weak: no (x,x) merge in $got")
  }

  test("bpeTrain stops early when no pair remains") {
    val got = TextAnalysis.bpeTrain(corpus(Seq("ab", "ab")), nMerges = 10)
      .collect()
    assert(got.length == 1) // after merging (a,b) every word is 1 symbol
    assert((got.head.getString(1), got.head.getString(2)) == (("a", "b")))
  }

  // ----------------------------------------------- collocationsTopK

  test("collocationsTopK ranks the engineered collocation first, respects minCount") {
    // "foo bar" always adjacent (50 times); filler tokens also appear
    // OUTSIDE their adjacency context so their marginals exceed their
    // pair counts (without this, a deterministic "bar x0" pair PMI-ties
    // the engineered collocation — PMI is scale-free in the marginals)
    val docs = ((0 until 50).map { i =>
      (i.toLong, s"foo bar x${i % 7} y${i % 11} z${i % 13}")
    } ++ (0 until 40).map { j =>
      (1000L + j, s"x${j % 7} q${j % 5} y${j % 11} r${j % 3} z${j % 13}")
    }).toDF("doc_id", "text")
    val out = TextAnalysis.collocationsTopK(docs, k = 10, minCount = 5)
      .collect()
    val top = out.find(_.getLong(6) == 1L).get
    assert((top.getString(0), top.getString(1)) == (("foo", "bar")))
    assert(top.getLong(2) == 50L)
    assert(top.getLong(5) > 0L, "engineered collocation must have positive PMI")
    // every surviving pair respects the floor
    assert(out.forall(_.getLong(2) >= 5L))
    // sub-threshold pairs (each "bar x?" occurs ~7 times but "x? y?"
    // variants occur < 5 times each... verify none below floor) and
    // ranking is by pmi desc
    val pmis = out.sortBy(_.getLong(6)).map(_.getLong(5)).toSeq
    assert(pmis == pmis.sorted.reverse)
  }

  test("collocationsTopK is partitioning-independent") {
    val docs = (0 until 40).map(i => (i.toLong, s"a b c d a b")).toDF("doc_id", "text")
    val one = TextAnalysis.collocationsTopK(docs.repartition(1), k = 5, minCount = 2)
      .collect().map(_.toSeq).toSeq
    val many = TextAnalysis.collocationsTopK(docs.repartition(9), k = 5, minCount = 2)
      .collect().map(_.toSeq).toSeq
    assert(one == many)
  }

  test("hllDistinctByGroup: groups sketch independently, audit is exact") {
    val df = ((0 until 500).map(i => ("d1", i % 200)) ++
      (0 until 100).map(i => ("d2", i % 7)))
      .toDF("day", "uid")
    val out = TextAnalysis.hllDistinctByGroup(df.repartition(8), "day", "uid")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(out("d1")._2 == 200L && out("d2")._2 == 7L)
    // small group: registers mostly empty, raw HLL biased high but
    // bounded; big group inside the ~13% band x 3 sigma
    assert(out("d1")._3 < 400000L, out("d1").toString)
    // per-group sketch equals the single-corpus sketch on that slice
    val solo = TextAnalysis.vocabHllAudit(
        df.filter($"day" === "d1")
          .select(concat_ws(" ", collect_list($"uid".cast("string"))
            .over(org.apache.spark.sql.expressions.Window.partitionBy($"day")))
            .as("text")).limit(1))
      .collect().head
    assert(out("d1")._1 == solo.getLong(3),
      s"grouped vs solo sketch diverge: ${out("d1")._1} vs ${solo.getLong(3)}")
  }

  test("hllDistinctRolling: windowSize=1 is the per-group sketch; merge is register max") {
    // days 0,1,2,5: users overlap across adjacent days; day 5 isolated
    val df = ((0 until 300).map(i => (0L, i % 120)) ++
      (0 until 300).map(i => (1L, 60 + i % 120)) ++   // 60 shared with day 0
      (0 until 100).map(i => (2L, i % 40)) ++          // all shared with day 0
      (0 until 50).map(i => (5L, 1000 + i)))           // disjoint, own window
      .toDF("day", "uid")
    // windowSize=1 must be row-identical to hllDistinctByGroup
    val w1 = TextAnalysis.hllDistinctRolling(df.repartition(8), "day", "uid", 1)
      .orderBy("group").collect().map(_.toSeq).toSeq
    val byG = TextAnalysis.hllDistinctByGroup(
        df.repartition(8).select($"day".cast("long").as("day"), $"uid"),
        "day", "uid")
      .orderBy("group").collect().map(_.toSeq).toSeq
    assert(w1 == byG)
    // windowSize=7: every day's exact audit is the true trailing union
    val w7 = TextAnalysis.hllDistinctRolling(df, "day", "uid", 7)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(w7(0L)._2 == 120L)            // just day 0
    assert(w7(1L)._2 == 180L)            // 0..120 ∪ 60..180
    assert(w7(2L)._2 == 180L)            // day 2 adds nothing new
    // day 5 window = days [-1..5] = all four days: 180 ∪ {1000..1049}
    assert(w7(5L)._2 == 230L)
    // merged estimate for day 1 equals the direct sketch of the union slice
    val unionSketch = TextAnalysis.hllDistinctByGroup(
        df.filter($"day" <= 1L).select(lit(0L).as("g"), $"uid"), "g", "uid")
      .collect().head.getLong(3)
    assert(w7(1L)._1 == unionSketch,
      s"rolling merge diverges from the direct union sketch: ${w7(1L)._1} vs $unionSketch")
  }

  // -------------------------------------------------- charEntropy

  test("charEntropy: exact micro-nats on known distributions, junk ranks outside prose") {
    val docs = Seq(
      (1L, "aaaaaaaa"),                       // degenerate: H = 0
      (2L, "abababab"),                       // uniform 2-char: H = ln 2
      (3L, "the cat sat on the warm mat"),    // prose band
      (4L, "QmFzZTY0IGp1bmsgcGFkZGluZyE9PQ")) // base64-ish: high H
      .toDF("doc_id", "text")
    val out = TextAnalysis.charEntropy(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == ((8L, 1L, 0L)))
    // per-term quantization: floor(4*ln(2)*1e6+0.5) = 2772589 per
    // char class; (2772589 * 2) div 8 = 693147 ~= ln(2) micro-nats
    assert(out(2L) == ((8L, 2L, 693147L)))
    assert(out(4L)._3 > out(3L)._3,
      s"base64 junk should out-entropy prose: ${out(4L)} vs ${out(3L)}")
    assert(out(1L)._3 < out(3L)._3)
  }

  // -------------------------------------------------- languageMix

  test("languageMix flags a document whose lines alternate languages") {
    val docs = Seq(
      (1L, "the cat is of the mat\nder hund ist nicht das\nthe dog is in a house"),
      (2L, "el que no de la y\nel la que de y no"),
      (3L, "qqq zzz\nwww")) // no markers anywhere -> und, not mixed
      .toDF("doc_id", "text")
    val out = TextAnalysis.languageMix(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4), r.getBoolean(5))))
      .toMap
    // doc 1: 2 en lines + 1 de line -> dominant en, mixed
    assert(out(1L) == ((3L, 2L, "en", 2L, true)))
    // doc 2: monolingual es
    assert(out(2L) == ((2L, 1L, "es", 2L, false)))
    // doc 3: all-und lines -> dominant 'und', zero langs, not mixed
    assert(out(3L) == ((2L, 0L, "und", 2L, false)))
  }

  test("languageMix dominant tie breaks to the smaller language label") {
    val docs = Seq(
      (1L, "the cat is of a mat\nder hund ist nicht das")) // 1 en + 1 de
      .toDF("doc_id", "text")
    val out = TextAnalysis.languageMix(docs).collect().head
    assert(out.getString(3) == "de") // 'de' < 'en'
    assert(out.getBoolean(5))
  }

  // --------------------------------------------- sampleWeightedTopK

  test("sampleWeightedTopK: exact k, heavier rows overrepresented, layout-stable") {
    val docs = (0 until 400).map { i =>
      (i.toLong, if (i % 2 == 0) 100L else 1L)
    }.toDF("id", "w")
    val out = graft.llmdata.Sampling.sampleWeightedTopK(docs, "id", "w", k = 50)
      .collect()
    assert(out.length == 50)
    // ranks are 1..k by (key, id)
    assert(out.map(_.getLong(3)).sorted.toSeq == (1L to 50L))
    // the 100x-heavier even ids should dominate the sample
    val evens = out.count(_.getLong(0) % 2 == 0)
    assert(evens > 40, s"expected heavy ids to dominate, got $evens/50")
    // deterministic under repartitioning
    val again = graft.llmdata.Sampling.sampleWeightedTopK(
        docs.repartition(13), "id", "w", k = 50)
      .collect().map(_.toSeq).toSeq
    assert(again == out.map(_.toSeq).toSeq)
  }

  test("sampleWeightedPerStratum: exact k per stratum, small strata kept whole") {
    val docs = ((0 until 100).map(i => (i.toLong, "big", 10L)) ++
      (100 until 103).map(i => (i.toLong, "tiny", 10L)))
      .toDF("id", "s", "w")
    val out = graft.llmdata.Sampling.sampleWeightedPerStratum(
        docs, "id", "s", "w", k = 10)
      .collect()
      .groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(out == Map("big" -> 10, "tiny" -> 3))
    // per-stratum sample == the single-stratum operator run on that
    // stratum alone (the window cut and the global cut agree)
    val bigOnly = graft.llmdata.Sampling.sampleWeightedTopK(
        docs.filter($"s" === "big").select("id", "w"), "id", "w", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    val bigStrat = graft.llmdata.Sampling.sampleWeightedPerStratum(
        docs, "id", "s", "w", k = 10)
      .collect().filter(_.getString(0) == "big")
      .map(r => (r.getLong(1), r.getLong(4))).toSet
    assert(bigStrat == bigOnly)
  }

  // ------------------------------------------------ dupSpanCoverage

  private def coverage(docs: (Long, String)*) =
    Dedup.dupSpanCoverage(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap // (n_tokens, covered_tokens, n_dup_starts, coverage_micro)

  test("dupSpanCoverage: one shared shingle covers exactly its window") {
    val out = coverage(
      1L -> "a b c d e",
      2L -> "a b c x y")
    // only "a b c" repeats; it covers 3 of 5 tokens in each doc
    assert(out(1L) == ((5L, 3L, 1L, 600000L)))
    assert(out(2L) == ((5L, 3L, 1L, 600000L)))
  }

  test("dupSpanCoverage: overlapping windows never double-count") {
    val out = coverage(
      1L -> "p q p q p q",
      2L -> "m n o")
    // every shingle of doc 1 repeats WITHIN it: starts 0..3, union
    // covers all 6 tokens — not 4 windows x 3
    assert(out(1L) == ((6L, 6L, 4L, 1000000L)))
    // unique doc: zero coverage, still reported
    assert(out(2L) == ((3L, 0L, 0L, 0L)))
  }

  test("dupSpanCoverage: sub-shingle docs report zeros, not absence") {
    val out = coverage(1L -> "z z", 2L -> "z z")
    assert(out(1L) == ((2L, 0L, 0L, 0L)))
  }

  // ------------------------------------------------- dupSpanRemoval

  private def removal(docs: (Long, String)*) =
    Dedup.dupSpanRemoval(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap // (n_tokens, n_removed, text_clean)

  test("dupSpanRemoval: the globally-first occurrence survives, later ones go") {
    val out = removal(
      1L -> "a b c d e",
      2L -> "a b c x y")
    // "a b c" first occurs in doc 1 (lowest doc_id) -> doc 1 intact,
    // doc 2 loses its copy
    assert(out(1L) == ((5L, 0L, "a b c d e")))
    assert(out(2L) == ((5L, 3L, "x y")))
  }

  test("dupSpanRemoval: within-doc repeats collapse to the first window") {
    val out = removal(1L -> "p q p q p q", 2L -> "m n o")
    // dup starts at pos 2 and 3 cover tokens 2..5; the first "p q"
    // prefix survives
    assert(out(1L) == ((6L, 4L, "p q")))
    assert(out(2L) == ((3L, 0L, "m n o")))
  }

  test("dupSpanRemoval: sub-shingle docs pass through untouched") {
    val out = removal(1L -> "z z", 2L -> "z z")
    assert(out(1L) == ((2L, 0L, "z z")))
    assert(out(2L) == ((2L, 0L, "z z")))
  }

  // ---------------------------------------------------- plan shapes

  test("plan shape: dupSpanCoverage shares ONE persisted gram frame") {
    val plan = Dedup.dupSpanCoverage(
        Seq((1L, "a b c d")).toDF("doc_id", "text"))
      .queryExecution.executedPlan.toString
    // occurrence count + join-back both read the cached positional
    // explode — the tokenize/shingle work runs once per corpus
    assert(plan.contains("InMemoryTableScan"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("plan shape: dupSpanRemoval has NO gram-keyed sort window (VERDICT r13 #1)") {
    val qe = Dedup.dupSpanRemoval(
        Seq((1L, "a b c d"), (2L, "a b c e")).toDF("doc_id", "text"))
      .queryExecution
    // first-occurrence is a min(struct) AGGREGATE joined back, never a
    // ranking: the hot-boilerplate gram whose occurrence list is
    // corpus-sized must not serialize a row_number window partition
    val plan = qe.executedPlan.toString
    assert(!plan.toLowerCase.contains("row_number"), plan)
    // no Window operator is keyed by the gram column — the only
    // windows left are the doc-keyed coverage scan
    val gramWindows = qe.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.exists(_.references.exists(_.name == "__g")) => w
    }
    assert(gramWindows.isEmpty, gramWindows.mkString("\n"))
    // the min(struct) partial-combines map-side before the exchange
    assert(plan.contains("min(struct") ||
      plan.contains("partial_min"), plan)
  }

  test("plan shape: heavy-hitter recount broadcasts candidates, cuts via TakeOrdered") {
    val toks = Seq.fill(20)("hh") ++ (0 until 5).map(i => s"u$i")
    val plan = TextAnalysis.heavyHittersExact(corpus(toks), k = 1,
        capacity = 64)
      .queryExecution.executedPlan.toString
    // pass 2's only exchange is the map-side-combined candidate agg:
    // the candidate set joins broadcast, the top-k cut is per-partition
    // heaps + a k-row driver merge — the vocabulary never shuffles
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
