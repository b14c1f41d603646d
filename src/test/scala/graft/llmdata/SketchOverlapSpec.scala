package graft.llmdata

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KMV cross-source overlap, Count-Min audit, prefix dedup, and BPE
  * encoding — the round-14 closing wave. */
class SketchOverlapSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------ vocabKmvOverlap

  private def srcDocs(rows: (String, String)*) =
    rows.zipWithIndex.map { case ((src, text), i) => (i.toLong, text, src) }
      .toDF("doc_id", "text", "source")

  test("vocabKmvOverlap: complete sketches make the estimate EXACT") {
    // each source's shingle vocabulary is far under k = 64, so the
    // union bottom-k holds the entire universe and the estimator
    // degenerates to the exact Jaccard — column for column
    val docs = srcDocs(
      "a" -> "w1 w2 w3 w4 w5 w6 w7 w8",
      "b" -> "w1 w2 w3 w4 x5 x6 x7 x8",
      "c" -> "y1 y2 y3 y4 y5 y6 y7 y8")
    val out = TextAnalysis.vocabKmvOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.toSeq.drop(2)).toMap
    assert(out.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    for (((_, _), row) <- out) {
      val Seq(_, nCommon, estMicro, nInter, _, exactMicro, errMicro) = row
      assert(estMicro == exactMicro, s"complete sketch must be exact: $row")
      assert(errMicro == 0L)
      assert(nCommon == nInter)
    }
    // docs of 8 tokens -> 6 trigrams each; a/b share the 2 trigrams
    // fully inside w1..w4; a/c share nothing
    val ab = out(("a", "b"))
    assert(ab(1) == 2L && ab(3) == 2L, ab) // n_common_in_k, n_intersect
    assert(out(("a", "c"))(3) == 0L)
    assert(out(("a", "c"))(5) == 0L) // exact_jaccard_micro
  }

  test("vocabKmvOverlap: k caps the sketch and the estimate tracks exact") {
    // 400 distinct trigram-generating tokens per source with 50%
    // engineered overlap: sketches saturate at k, estimator lands in
    // the KMV error band (~1/sqrt(k) = 12.5%; allow 3 sigma)
    val mk = (tag: String, from: Int) =>
      (from until from + 400).map(i => s"$tag${i}a $tag${i}b $tag${i}c")
        .mkString(" ")
    val docs = srcDocs(
      "a" -> (mk("s", 0) + " " + mk("s", 200)),   // s0..s599
      "b" -> (mk("s", 300) + " " + mk("s", 500))) // s300..s899
    val out = TextAnalysis.vocabKmvOverlap(docs).collect().head
    assert(out.getLong(2) == 64L, "k_eff must be k when union > k")
    val est = out.getLong(4)
    val exact = out.getLong(7)
    assert(out.getLong(8) == math.abs(est - exact))
    assert(math.abs(est - exact) < 375000L,
      s"estimate $est vs exact $exact out of the 3-sigma KMV band")
  }

  test("vocabKmvOverlap is partitioning-independent") {
    val docs = (0 until 120).map { i =>
      (i.toLong, (0 until 12).map(j => s"t${(i * 5 + j) % 83}").mkString(" "),
        s"src${i % 4}")
    }.toDF("doc_id", "text", "source")
    val one = TextAnalysis.vocabKmvOverlap(docs.repartition(1))
      .orderBy("source_a", "source_b").collect().map(_.toSeq).toSeq
    val many = TextAnalysis.vocabKmvOverlap(docs.repartition(13))
      .orderBy("source_a", "source_b").collect().map(_.toSeq).toSeq
    assert(one == many)
  }

  // ------------------------------------------------------- cmsAudit

  test("cmsAudit: estimates NEVER undercount, and collisions only inflate") {
    // 500 distinct tokens into 4 x 64 cells force collisions: every
    // estimate >= exact (structural), some strictly above
    val docs = (0 until 100).map { i =>
      (i.toLong, (0 until 5).map(j => s"v${(i * 5 + j) % 500}").mkString(" "))
    }.toDF("doc_id", "text")
    val out = TextAnalysis.cmsAudit(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 500)
    assert(out.forall { case (_, exact, est) => est >= exact },
      out.filter { case (_, e, s) => s < e }.take(5).mkString(", "))
    assert(out.exists { case (_, exact, est) => est > exact },
      "fixture too weak: no collision inflated any estimate")
  }

  test("cmsAudit: a light vocabulary reads back exactly") {
    // 8 distinct tokens in 256 cells: collisions are possible but the
    // min-over-depth must erase any single-row clash for SOME depth —
    // verify every known count reads back exactly here
    val docs = Seq((1L, "a a a b b c d e f g h a b")).toDF("doc_id", "text")
    val out = TextAnalysis.cmsAudit(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("a") == ((4L, 4L)))
    assert(out("b") == ((3L, 3L)))
    assert(out.forall { case (_, (exact, est)) => est == exact }, out)
  }

  test("cmsAudit is arrival-order- and partitioning-independent") {
    val toks = (0 until 300).map(i => s"w${i % 41}")
    def df(seed: Int) = new scala.util.Random(seed).shuffle(toks)
      .grouped(6).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
    val a = TextAnalysis.cmsAudit(df(1).repartition(1))
      .orderBy("token").collect().map(_.toSeq).toSeq
    val b = TextAnalysis.cmsAudit(df(2).repartition(9))
      .orderBy("token").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("plan shape: the CMS cell grid is built by ONE map-side-combined agg " +
      "and joins back broadcast-small") {
    val docs = Seq((1L, "a b c a")).toDF("doc_id", "text")
    val plan = TextAnalysis.cmsAudit(docs)
      .queryExecution.executedPlan.toString
    // depth x width cells are a config constant: the count agg partial-
    // combines before its exchange and the estimate join needs no sort
    assert(plan.contains("partial_count") || plan.contains("partial_"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  // ----------------------------------------------------- prefixDups

  private val pad = (1 to 10).map(i => s"k$i").mkString(" ") // shared key

  test("prefixDups: equal, proper prefix, and post-key divergence classify correctly") {
    val docs = Seq(
      (1L, s"$pad alpha beta gamma"),
      (2L, s"$pad alpha beta gamma"),        // equal to 1
      (3L, s"$pad alpha"),                   // proper prefix of 1 and 2
      (4L, s"$pad DIFFERENT tail here"),     // same key, diverges after -> dropped
      (5L, "other opener entirely distinct from the rest of them all"))
      .toDF("doc_id", "text")
    val out = Dedup.prefixDups(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(out == Map(
      (1L, 2L) -> "equal",
      (1L, 3L) -> "prefix_b_of_a",
      (2L, 3L) -> "prefix_b_of_a"))
  }

  test("prefixDups: prefix must end at a token boundary") {
    // tb continues ta WITHOUT a space: "pre" vs "prefix" — a bare
    // startswith would call this a prefix; the boundary guard must not
    val docs = Seq(
      (1L, s"$pad pre"),
      (2L, s"$pad prefix and more"))
      .toDF("doc_id", "text")
    assert(Dedup.prefixDups(docs).collect().isEmpty)
  }

  test("prefixDups: sub-key docs never pair, even when identical") {
    val docs = Seq((1L, "short doc"), (2L, "short doc")).toDF("doc_id", "text")
    assert(Dedup.prefixDups(docs).collect().isEmpty)
  }

  test("prefixDups: hot keys star-expand to the min-id representative") {
    val docs = Seq(
      (10L, s"$pad one"),
      (11L, s"$pad one"),
      (12L, s"$pad one"))
      .toDF("doc_id", "text")
    val capped = Dedup.prefixDups(docs, maxBucket = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // |bucket| = 3 > 2: only rep -> member pairs, NOT the (11,12) pair
    assert(capped == Set((10L, 11L), (10L, 12L)))
    val exact = Dedup.prefixDups(docs, maxBucket = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == Set((10L, 11L), (10L, 12L), (11L, 12L)))
  }

  test("plan shape: prefixDups pairs ONLY through the key equi-join") {
    val docs = Seq((1L, s"$pad x"), (2L, s"$pad x")).toDF("doc_id", "text")
    val plan = Dedup.prefixDups(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  // ------------------------------------------------- bpeEncodeStats

  /** In-memory reference: sequential ranked-merge application, each a
    * greedy leftmost-non-overlapping pass (the training replay). */
  private def encRef(word: String, merges: Seq[(String, String)]): Int = {
    var syms = word.map(_.toString).toList
    for ((a, b) <- merges) {
      val acc = scala.collection.mutable.ListBuffer.empty[String]
      syms.foreach { x =>
        if (acc.nonEmpty && acc.last == a && x == b)
          acc(acc.length - 1) = a + b
        else acc += x
      }
      syms = acc.toList
    }
    syms.length
  }

  test("bpeEncodeStats: encoding replays training on the training corpus") {
    val docs = Seq(
      (1L, "banana banana bandana abab", "en"),
      (2L, "abab abab aaaa", "de"),
      (3L, "banana aaaa aaaa", "de"))
      .toDF("doc_id", "text", "lang")
    val merges = TextAnalysis.bpeTrain(docs, nMerges = 5)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val got = TextAnalysis.bpeEncodeStats(docs, merges)
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val words = Map(
      "en" -> Seq("banana", "banana", "bandana", "abab"),
      "de" -> Seq("abab", "abab", "aaaa", "banana", "aaaa", "aaaa"))
    val ref = words.toSeq.sortBy(_._1).map { case (g, ws) =>
      val nTok = ws.map(w => encRef(w, merges)).sum.toLong
      (g, ws.size.toLong, nTok, nTok * 1000000L / ws.size)
    }
    assert(got.toSeq == ref, s"\ngot ${got.toSeq}\nref $ref")
  }

  test("bpeEncodeStats: fertility separates merge-friendly from hostile groups") {
    // group "rep" is pure repeated bigrams (merges collapse it hard);
    // group "rnd" is all-distinct chars (no merge ever applies twice)
    val docs = Seq(
      (1L, "abababab abababab", "rep"),
      (2L, "qwzx vkjy", "rnd"))
      .toDF("doc_id", "text", "lang")
    val merges = TextAnalysis.bpeTrain(docs, nMerges = 4)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val out = TextAnalysis.bpeEncodeStats(docs, merges).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out("rep") < out("rnd"),
      s"repetitive text must encode with lower fertility: $out")
  }

  test("bpeEncodeStats with an empty merge list counts characters") {
    val docs = Seq((1L, "ab abc", "xx")).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.bpeEncodeStats(docs, Seq.empty).collect().head
    assert((out.getLong(1), out.getLong(2)) == ((2L, 5L)))
  }
}
