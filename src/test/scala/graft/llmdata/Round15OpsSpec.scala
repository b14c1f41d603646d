package graft.llmdata

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit properties for the round-15 report/proof operators whose
  * catalog oracles carry the exactness story — these pin the
  * SEMANTIC invariants. */
class Round15OpsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (0L until 60L).map { i =>
    (i, (0 to (i % 5).toInt).map(k => s"w${(i + k) % 11}").mkString(" "),
      s"src${i % 3}")
  }.toDF("doc_id", "text", "source")

  test("vocabHllShardMerge is shard-count invariant and equals the direct pass") {
    val direct = TextAnalysis.vocabHllBySource(corpus).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    Seq(1, 4, 7).foreach { n =>
      val merged = TextAnalysis.vocabHllShardMerge(corpus, shards = n)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(merged == direct, s"shards=$n must equal the direct sketch")
    }
  }

  test("mixtureImpact conserves mass and both share columns sum to ~1e6") {
    // inject exact duplicates concentrated in src0 so the mixture
    // genuinely shifts
    val d = corpus.union(corpus.filter($"source" === "src0")
      .select(($"doc_id" + 1000L).as("doc_id"), $"text", $"source"))
    val out = Dedup.mixtureImpact(d).collect()
    val before = out.map(_.getLong(2)).sum
    val after = out.map(_.getLong(4)).sum
    assert(after < before, "dedup must remove tokens")
    out.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1)) // docs after <= before
      assert(r.getLong(4) <= r.getLong(2)) // tokens after <= before
    }
    Seq(5, 6).foreach { c => // share columns sum to 1e6 minus floor slack
      val s = out.map(_.getLong(c)).sum
      assert(s > 999900L && s <= 1000000L, s"col $c sums to $s")
    }
    // src0 carried the duplicates: its share must FALL
    val src0 = out.find(_.getString(0) == "src0").get
    assert(src0.getLong(7) < 0L, "the duplicated source's share falls")
  }

  test("entropyRate: hand-computable fixture (uniform bigrams => ln of types)") {
    // one doc "a b a b a b": bigrams (a,b)x3? tokens a b a b a b ->
    // pairs: ab, ba, ab, ba, ab -> c(ab)=3, c(ba)=2, N=5
    val d = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val r = TextAnalysis.entropyRate(d).collect().head
    assert(r.getLong(0) == 5L) // n_pairs
    assert(r.getLong(1) == 2L) // bigram types
    assert(r.getLong(2) == 2L) // first-word types (a, b)
    // H(W1,W2) terms: 3 ln(5/3) + 2 ln(5/2); H(W1): first counts are
    // c1(a)=3, c1(b)=2 -> identical terms -> conditional entropy 0
    assert(r.getLong(5) == 0L, s"deterministic successor => H(w2|w1) = 0: $r")
  }

  test("temperatureSweep: lower alpha flattens the mixture") {
    val out = Curation.temperatureSweep(corpus).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(4)))
    def spread(alpha: Long): Long = {
      val shares = out.filter(_._1 == alpha).map(_._3)
      shares.max - shares.min
    }
    assert(spread(1000000L) >= spread(500000L))
    assert(spread(500000L) >= spread(250000L))
    // each alpha's shares sum to ~1e6
    Seq(1000000L, 500000L, 250000L).foreach { a =>
      val s = out.filter(_._1 == a).map(_._3).sum
      assert(s > 999900L && s <= 1000000L)
    }
  }
}
