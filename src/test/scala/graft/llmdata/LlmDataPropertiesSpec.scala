package graft.llmdata

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** ScalaCheck properties over the round-7 training-data operators:
  * each pins an algebraic invariant (density bound, balance bound,
  * partition-independence, sample monotonicity) rather than a golden
  * value, the complement of the DuckDB hash oracles.
  */
class LlmDataPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def forSamples[A](g: Gen[A], n: Int = 6)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(g.pureApply(Gen.Parameters.default, Seed(1337L + i)))
    }

  private val word: Gen[String] = Gen.oneOf(
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november")

  private val corpus: Gen[List[String]] =
    Gen.chooseNum(3, 12).flatMap(nDocs =>
      Gen.listOfN(nDocs,
        Gen.chooseNum(4, 40).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))))

  private def docs(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("property: winnowing density is bounded and never empty for shingled docs") {
    forSamples(corpus) { texts =>
      val out = TextAnalysis.winnowFingerprint(docs(texts)).collect()
      out.foreach { r =>
        val grams = r.getAs[Long]("n_grams")
        val sel = r.getAs[Long]("n_selected")
        if (grams == 0) assert(sel == 0)
        else {
          assert(sel >= 1)                  // every shingled doc is joinable
          assert(sel <= grams)              // selection is a subset
          // window minima: at most one new selection per window position
          assert(sel <= math.max(grams - 3, 1))
        }
      }
    }
  }

  test("property: hashClassifier is invariant under repartitioning") {
    forSamples(corpus) { texts =>
      val d = docs(texts)
      val a = TextAnalysis.hashClassifier(d).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score")).toMap
      val b = TextAnalysis.hashClassifier(d.repartition(5)).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score")).toMap
      assert(a == b)
    }
  }

  test("property: assignShards balances totals within the largest document") {
    val sizes: Gen[List[Long]] =
      Gen.chooseNum(8, 40).flatMap(n => Gen.listOfN(n, Gen.chooseNum(1L, 500L)))
    forSamples(Gen.zip(sizes, Gen.chooseNum(2, 6))) { case (ts, nShards) =>
      val d = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "n_tokens")
      val out = Sampling.assignShards(d, "doc_id", "n_tokens", nShards).collect()
      assert(out.length == ts.length)
      val shards = out.map(_.getAs[Int]("shard"))
      assert(shards.forall(s => s >= 0 && s < nShards))
      val totals = out.groupBy(_.getAs[Int]("shard")).view
        .mapValues(_.map(_.getAs[Long]("n_tokens")).sum).values.toSeq
      // snake bound: max spread <= largest document + second largest
      // (conservative; exact LPT would be <= largest)
      assert(totals.max - totals.min <= 2 * ts.max)
      // doc-count balance: within one snake row
      val counts = out.groupBy(_.getAs[Int]("shard")).view.mapValues(_.size).values.toSeq
      assert(counts.max - counts.min <= 2)
    }
  }

  test("property: stratified sample keeps a subset, and fraction 1.0 keeps all") {
    forSamples(corpus) { texts =>
      val d = docs(texts).withColumn("stratum", (col("doc_id") % 2).cast("string"))
      val all = Sampling.sampleStratified(d, "doc_id", "stratum",
        Map.empty, defaultFraction = 1.0).count()
      assert(all == texts.length.toLong)
      val half = Sampling.sampleStratified(d, "doc_id", "stratum",
        Map.empty, defaultFraction = 0.5)
      val ids = half.select("doc_id").collect().map(_.getLong(0)).toSet
      // subset of input, and shrinking the fraction shrinks the sample
      assert(ids.subsetOf((0L until texts.length.toLong).toSet))
      val quarter = Sampling.sampleStratified(d, "doc_id", "stratum",
        Map.empty, defaultFraction = 0.25)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(quarter.subsetOf(ids)) // hash thresholding is monotone
    }
  }

  test("property: GopherSignalsExpression equals the HOF spelling on random byte soup") {
    // structured noise: words drawn from letters/digits/symbols/stops/
    // multi-byte chars, joined by random space/newline runs — much
    // wider input space than the fixture parity test
    val piece: Gen[String] = Gen.oneOf(
      Gen.oneOf("the", "be", "to", "of", "and", "that", "have", "with"),
      Gen.oneOf("-", "*", "•", "#", "...", "..", "....", ""),
      Gen.listOfN(3, Gen.alphaNumChar).map(_.mkString),
      Gen.oneOf("müß", "文字", "a#b", "x...", "-lead", "12 34".take(2)))
    val sep: Gen[String] = Gen.oneOf(" ", "  ", "\n", " \n ", "\n\n", " ")
    val soup: Gen[String] = Gen.chooseNum(0, 25).flatMap { n =>
      Gen.listOfN(n, Gen.zip(piece, sep)).map(_.map { case (p, s) => p + s }.mkString)
    }
    val stops = TextAnalysis.gopherStops
    val stopsIn = stops.map(s => s"'$s'").mkString(", ")
    forSamples(Gen.listOfN(8, soup), n = 4) { texts =>
      val d = docs(texts)
      val hof = d
        .withColumn("__w", split(col("text"), " "))
        .withColumn("__l", split(col("text"), "\n"))
        .select(col("doc_id"),
          size(col("__w")).cast("long").as("a"),
          expr("aggregate(__w, 0L, (a, x) -> a + length(x))").as("b"),
          expr("size(filter(__w, x -> x rlike '[A-Za-z]'))").cast("long").as("c"),
          (length(col("text")) - length(replace(col("text"), lit("#"), lit("")))).cast("long").as("d"),
          ((length(col("text")) - length(replace(col("text"), lit("..."), lit("")))) / 3).cast("long").as("e"),
          size(col("__l")).cast("long").as("f"),
          expr("size(filter(__l, x -> startswith(ltrim(x), '-') OR startswith(ltrim(x), '*') OR startswith(ltrim(x), '•')))").cast("long").as("g"),
          expr("size(filter(__l, x -> endswith(rtrim(x), '...')))").cast("long").as("h"),
          expr(s"size(array_intersect(array_distinct(__w), array($stopsIn)))").cast("long").as("i"))
        .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
      val kernel = d
        .withColumn("_g", GopherSignalsExpression.signals(col("text"), stops))
        .select(col("doc_id") +: (0 until 9).map(i => col("_g").getItem(i)): _*)
        .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
      texts.indices.foreach { i =>
        assert(kernel(i.toLong) == hof(i.toLong),
          s"doc $i ${texts(i).replace("\n", "\\n").take(60)}: " +
            s"kernel ${kernel(i.toLong)} != hof ${hof(i.toLong)}")
      }
    }
  }

  test("property: chunkTokens covers every token and reconstructs the doc when stride <= size") {
    val params: Gen[(List[String], Int, Int)] = for {
      texts <- corpus
      size <- Gen.chooseNum(2, 12)
      stride <- Gen.chooseNum(1, 12)
    } yield (texts, size, stride)
    forSamples(params) { case (texts, size, stride) =>
      val out = TextAnalysis.chunkTokens(docs(texts), size, stride).collect()
        .groupBy(_.getAs[Long]("doc_id"))
      texts.zipWithIndex.foreach { case (t, i) =>
        val toks = t.split(" ", -1)
        val chunks = out(i.toLong).sortBy(_.getAs[Long]("chunk_idx"))
        // starts are exactly 0, stride, 2*stride, ... below n
        assert(chunks.map(_.getAs[Long]("start_token")).toSeq ==
          (0L until toks.length.toLong by stride.toLong).toSeq)
        // sizes are min(size, n - start), so windows stay in bounds
        chunks.foreach { c =>
          assert(c.getAs[Long]("n_chunk_tokens") ==
            math.min(size.toLong, toks.length - c.getAs[Long]("start_token")))
        }
        if (stride <= size) {
          // overlap never leaves a gap: every position covered...
          val covered = chunks.flatMap { c =>
            val s = c.getAs[Long]("start_token")
            s until (s + c.getAs[Long]("n_chunk_tokens"))
          }.toSet
          assert(covered == toks.indices.map(_.toLong).toSet)
          // ...and taking each chunk's first `stride` tokens plus the
          // last chunk's tail reconstructs the document exactly
          val rebuilt = chunks.flatMap { c =>
            val ct = c.getAs[String]("chunk_text").split(" ", -1)
            if (c eq chunks.last) ct else ct.take(stride)
          }
          assert(rebuilt.toSeq == toks.toSeq, s"doc $i not reconstructed")
        }
      }
    }
  }

  test("property: rrfFuse is invariant to ranking-list order and repartitioning") {
    val rankings: Gen[List[List[Long]]] = Gen.chooseNum(2, 4).flatMap(nLists =>
      Gen.listOfN(nLists, Gen.chooseNum(3, 8).flatMap(k =>
        Gen.pick(k, 0L until 30L).map(_.toList))))
    forSamples(rankings) { lists =>
      val frames = lists.map(ids =>
        ids.zipWithIndex.map { case (n, r) => (0L, n, r + 1) }
          .toDF("query_id", "neighbor_id", "rnk"))
      val fused = AnnSearch.rrfFuse(frames, topK = 50).collect()
        .map(r => (r.getAs[Long]("neighbor_id"),
          (r.getAs[Int]("rnk"), r.getAs[Long]("n_lists"), r.getAs[Long]("rrf_micro")))).toMap
      val reversed = AnnSearch.rrfFuse(frames.reverse.map(_.repartition(3)), topK = 50)
        .collect()
        .map(r => (r.getAs[Long]("neighbor_id"),
          (r.getAs[Int]("rnk"), r.getAs[Long]("n_lists"), r.getAs[Long]("rrf_micro")))).toMap
      assert(fused == reversed)
      // n_lists is the number of rankings containing the candidate
      val expected = lists.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
      fused.foreach { case (n, (_, nl, _)) => assert(nl == expected(n)) }
    }
  }

  test("property: retrievalEval metrics obey their order invariants") {
    // random ranked results + random relevance: per query rr = 0 iff
    // nothing found, first_rank <= k implies hit_at_k, and the macro
    // rates are nested hit1 <= hit_at_k <= found, all within [0, 1e6]
    val gen: Gen[(List[(Long, Long)], List[(Long, Long)])] = for {
      nq <- Gen.chooseNum(2, 5)
      res <- Gen.listOf(Gen.zip(Gen.chooseNum(0L, nq.toLong), Gen.chooseNum(0L, 20L)))
      rel <- Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0L, nq.toLong), Gen.chooseNum(0L, 25L)))
    } yield (res.distinct, rel.distinct)
    forSamples(gen) { case (res, rel) =>
      val results = res.groupBy(_._1).toSeq.flatMap { case (q, docsForQ) =>
        docsForQ.map(_._2).distinct.sorted.zipWithIndex
          .map { case (d, i) => (q, d, i + 1) }
      }.toDF("query_id", "doc_id", "rank")
      val relevance = rel.toDF("query_id", "doc_id")
      val per = TextAnalysis.retrievalEval(results, relevance, k = 3).collect()
      assert(per.length == rel.map(_._1).distinct.size) // one row per query, none dropped
      per.foreach { r =>
        val found = r.getAs[Long]("n_found")
        val rr = r.getAs[Long]("rr_micro")
        assert((rr == 0L) == (found == 0L))
        assert(rr >= 0L && rr <= 1000000L)
        if (r.getAs[Boolean]("hit1")) assert(r.getAs[Boolean]("hit_at_k"))
        assert(found <= r.getAs[Long]("n_relevant"))
      }
      val m = TextAnalysis.retrievalEvalMacro(
        TextAnalysis.retrievalEval(results, relevance, k = 3)).collect()(0)
      val (h1, hk, f) = (m.getAs[Long]("hit1_micro"),
        m.getAs[Long]("hit_at_k_micro"), m.getAs[Long]("found_micro"))
      assert(h1 <= hk && hk <= f && f <= 1000000L)
      assert(m.getAs[Long]("mrr_micro") <= f) // rr <= 1e6 per found query
    }
  }

  test("property: attribution touch counts replay from the raw events") {
    val gen: Gen[List[(Long, Long, String)]] = Gen.nonEmptyListOf(for {
      u <- Gen.chooseNum(1L, 4L)
      t <- Gen.chooseNum(0L, 50L)
      ty <- Gen.oneOf("view", "click", "purchase", "noise")
    } yield (u, t, ty)).map(_.zipWithIndex
      .map { case ((u, t, ty), i) => (u, t * 100 + i, ty) }) // unique times
    forSamples(gen) { evs =>
      val df = evs.zipWithIndex.map { case ((u, t, ty), i) => (u, t, ty, i.toLong) }
        .toDF("k", "t", "ty", "eid")
      val out = graft.enrich.Funnel.attribution(df, "k", "t", "ty", "eid", "purchase")
        .collect().map(r => r.getAs[Long]("k") -> r).toMap
      val byUser = evs.groupBy(_._1)
      byUser.foreach { case (u, rows) =>
        val convT = rows.filter(_._3 == "purchase").map(_._2).sorted.headOption
        convT match {
          case None => assert(!out.contains(u))
          case Some(ct) =>
            val touches = rows.filter(e => e._3 != "purchase" && e._2 < ct).sortBy(_._2)
            val r = out(u)
            assert(r.getAs[Long]("conv_t") == ct)
            assert(r.getAs[Long]("n_touches") == touches.size.toLong)
            if (touches.nonEmpty) {
              assert(r.getAs[String]("first_touch") == touches.head._3)
              assert(r.getAs[String]("last_touch") == touches.last._3)
            } else {
              assert(r.isNullAt(r.fieldIndex("first_touch")))
              assert(r.isNullAt(r.fieldIndex("last_touch")))
            }
        }
      }
    }
  }

  test("property: prototypePrune prunes floor(num/den) of every cluster") {
    val dims: Gen[(Int, Int)] = Gen.zip(Gen.chooseNum(6, 20), Gen.chooseNum(1, 3))
    forSamples(dims) { case (n, seedK) =>
      val rows = (0L until n.toLong).map { i =>
        i -> (0 until 64).map(d => math.sin((i % seedK) * 64 + d + 1.0) * 0.4 + 0.001 * i)
      }
      val d = rows.toDF("vec_id", "embedding")
      val out = AnnSearch.prototypePrune(d, kc = 4, iters = 2, dim = 64).collect()
      assert(out.length == n)
      out.groupBy(_.getAs[Int]("bucket")).foreach { case (_, rs) =>
        val pruned = rs.count(_.getAs[Boolean]("pruned"))
        assert(pruned == rs.length / 4) // protoPruneNum/Den = 1/4
      }
    }
  }

  test("property: A-ES weighted key strictly decreases in weight for a fixed id") {
    // -ln(u)/w is strictly decreasing in w (u fixed by the id digest),
    // so raising a row's weight can only IMPROVE its rank — the
    // monotonicity the weighted-sample semantics rest on
    forSamples(Gen.chooseNum(1L, 500L)) { id =>
      val weights = Seq(1L, 2L, 5L, 20L, 100L, 1000L)
      val keys = weights.map { w =>
        Sampling.sampleWeightedTopK(
            Seq((id, w)).toDF("id", "w"), "id", "w", k = 1)
          .collect().head.getLong(2)
      }
      assert(keys == keys.sorted.reverse, s"id $id keys $keys")
      assert(keys.distinct.length == keys.length, s"id $id keys $keys")
    }
  }

  test("property: HLL registers are monotone — adding documents never lowers the estimate inputs") {
    forSamples(corpus) { texts =>
      val all = docs(texts)
      val half = docs(texts.take(math.max(1, texts.length / 2)))
      val a = TextAnalysis.vocabHllAudit(all).collect().head
      val h = TextAnalysis.vocabHllAudit(half).collect().head
      // more data -> more buckets seen, smaller-or-equal z (registers
      // only grow), larger-or-equal raw estimate
      assert(a.getLong(1) >= h.getLong(1))
      assert(a.getLong(2) <= h.getLong(2))
      assert(a.getLong(3) >= h.getLong(3))
    }
  }

  test("property: charEntropy is bounded by ln(alphabet) and zero iff one symbol") {
    forSamples(corpus) { texts =>
      val out = TextAnalysis.charEntropy(docs(texts)).collect()
      out.foreach { r =>
        val (n, k, e) = (r.getLong(1), r.getLong(2), r.getLong(3))
        assert(e >= 0L)
        // H <= ln(k) (+1 micro slack for per-term rounding)
        val cap = math.ceil(math.log(k.toDouble) * 1e6).toLong + k
        assert(e <= cap, s"entropy $e over cap $cap for k=$k n=$n")
        if (k == 1) assert(e == 0L)
      }
    }
  }

  test("property: lineDedup equals the in-memory replay on multi-line docs") {
    val line: Gen[String] =
      Gen.chooseNum(2, 6).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val mlCorpus: Gen[List[String]] =
      Gen.chooseNum(3, 8).flatMap(nDocs => Gen.listOfN(nDocs,
        Gen.chooseNum(2, 6).flatMap(n =>
          Gen.listOfN(n, line).map(_.mkString("\n")))))
    forSamples(mlCorpus) { texts =>
      val out = Dedup.lineDedup(docs(texts)).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      val occ = texts.flatMap(_.split("\n", -1)).groupBy(identity)
        .view.mapValues(_.size).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val ls = t.split("\n", -1).toSeq
        val kept = ls.filter(l => occ(l) <= 1)
        val expected = (ls.size.toLong, (ls.size - kept.size).toLong,
          kept.mkString("\n"))
        assert(out(i.toLong) == expected, s"doc $i")
      }
    }
  }

  test("property: bpeFirstMerges equals the brute pair count") {
    forSamples(corpus) { texts =>
      val out = TextAnalysis.bpeFirstMerges(docs(texts), k = 1000).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val brute = texts.flatMap(_.split(" ")).filter(_.length >= 2)
        .flatMap(w => w.sliding(2).map(p => (p.substring(0, 1), p.substring(1))))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(out == brute)
    }
  }
}
