package graft.llmdata

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import LlmDataParams._

/** Deduplication operators over a `(doc_id, text, ...)` corpus —
  * the exact + near-dup family a large-scale training-data pipeline
  * needs (builder brief; absent from the reference, which only has the
  * exact `drop_duplicates` U7/U8 of validator/union.py:343-368).
  *
  * 100 TB design:
  *  - exact dedup is a hash-aggregate on a content digest — map-side
  *    partial aggregation, one shuffle on the digest, no row ever
  *    compared to another directly;
  *  - near-dup candidates come from banded MinHash-LSH: shingle ->
  *    H minhashes -> b band keys -> *equi-join on the band key*. The
  *    pair space is never enumerated; only docs sharing a band bucket
  *    meet, so cost is sum over buckets of |bucket|^2, not n^2. A
  *    degenerate bucket (mass-duplicated boilerplate) is the known
  *    LSH hot spot — at scale, cap bucket size or salt the key before
  *    the self-join (AQE skew-join handles moderate skew);
  *  - exact-Jaccard verification runs only on LSH candidates, joined
  *    back to the (distinct) shingle sets by doc id.
  *
  * MinHash trick shared with the DuckDB oracle: a minhash is the *min
  * of fixed-width lowercase-hex md5 strings* — lexicographic min of
  * fixed-width hex equals numeric min, and md5 is identical in every
  * engine, so no engine-specific 64-bit hash is needed.
  */
object Dedup {

  /** Tokenizes and attaches word `shingleWidth`-shingles as `__sh`. */
  def shingled(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val w = shingleWidth
    val parts = (0 until w).map(i => s"element_at(__w, i + $i)").mkString(", ")
    docs
      .withColumn("__w", split(col(textCol), " "))
      .withColumn("__sh", expr(
        s"""CASE WHEN size(__w) >= $w
           | THEN transform(sequence(1, size(__w) - ${w - 1}),
           |                i -> concat_ws(' ', $parts))
           | ELSE array() END""".stripMargin))
  }

  /** MinHash signature (`__mh`: array of `numHashes` hex minhashes),
    * computed by the one-pass codegen kernel
    * ([[MinHashSignatureExpression]]; byte-identical to the
    * `array_min(transform(..md5..))` HOF spelling the oracle uses).
    */
  def minhashed(docs: DataFrame): DataFrame =
    shingled(docs).withColumn("__mh",
      MinHashSignatureExpression.signature(col("__sh"), numHashes))

  /** LSH band keys: one `(doc_id, band, key)` row per band, where key
    * is the digest of that band's `rowsPerBand` consecutive minhashes.
    */
  def bandKeys(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val bandStructs = (0 until bands).map { j =>
      val slice = (1 to rowsPerBand)
        .map(i => s"element_at(__mh, ${j * rowsPerBand + i})").mkString(", ")
      s"struct($j AS band, md5(concat($slice)) AS key)"
    }.mkString(", ")
    minhashed(docs)
      .select(col(idCol), explode(expr(s"array($bandStructs)")).as("k"))
      .select(col(idCol), col("k.band"), col("k.key"))
  }

  /** Distinct candidate pairs `(doc_a, doc_b)`, `doc_a < doc_b`, from a
    * self-equi-join of the band keys (the LSH bucket join — the only
    * place pairs are formed, and only within buckets).
    */
  def minhashCandidates(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val k = bandKeys(docs, idCol)
    val a = k.select(col("band"), col("key"), col(idCol).as("doc_a"))
    val b = k.select(col("band"), col("key"), col(idCol).as("doc_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
  }

  /** LSH candidates verified with exact shingle-set Jaccard, kept at
    * `>= jaccardThreshold`. Output: (doc_a, doc_b, jaccard).
    */
  def verifiedNearDups(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val sets = shingled(docs)
      .select(col(idCol), array_distinct(col("__sh")).as("__s"))
    val cand = minhashCandidates(docs, idCol)
    cand
      .join(sets.select(col(idCol).as("doc_a"), col("__s").as("__sa")), "doc_a")
      .join(sets.select(col(idCol).as("doc_b"), col("__s").as("__sb")), "doc_b")
      .withColumn("__inter", size(array_intersect(col("__sa"), col("__sb"))))
      .withColumn("jaccard",
        col("__inter").cast("double")
          / (size(col("__sa")) + size(col("__sb")) - col("__inter")))
      .filter(col("jaccard") >= jaccardThreshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Exact dedup: group by content digest, keep the lowest id. Output:
    * one row per distinct content `(text_hash, keep_id, n_copies)`.
    */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Near-dup clusters: connected components over the verified pair
    * graph, each doc labeled with its component's minimum doc id (the
    * dedup survivor). The edge set is the LSH-verified pairs — sparse
    * by construction (bounded by bucket sizes, not n^2) — so the
    * union-find runs driver-side over collected edges, like the join
    * engine's guarded greedy; docs in no pair are their own root.
    * At lake scale the same contract is served by iterative
    * large-star/small-star label propagation over the pair frame; the
    * survivor-selection join below is already that shape (broadcast
    * the component map, one pass over the corpus).
    *
    * Output: (doc_id, root_id) for every doc.
    */
  def nearDupClusters(docs: DataFrame, idCol: String = "doc_id",
                      maxEdges: Long = 10_000_000L): DataFrame = {
    val pairFrame = verifiedNearDups(docs, idCol).select("doc_a", "doc_b").persist()
    val nEdges = pairFrame.count()
    if (nEdges > maxEdges) {
      pairFrame.unpersist()
      throw new IllegalArgumentException(
        s"near-dup graph has $nEdges edges (> maxEdges=$maxEdges): " +
          "use distributed label propagation instead of the driver union-find")
    }
    val pairs = try pairFrame.collect() finally pairFrame.unpersist()
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { r =>
      val (a, b) = (find(r.getLong(0)), find(r.getLong(1)))
      if (a != b) { if (a < b) parent(b) = a else parent(a) = b }
    }
    val roots = parent.keys.map(x => x -> find(x)).toSeq
    val spark = docs.sparkSession
    import spark.implicits._
    val mapping = roots.toDF(idCol, "__root")
    docs.select(col(idCol))
      .join(broadcast(mapping), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__root"), col(idCol)).as("root_id"))
  }

  /** Per-token 16-bit value from the first 4 hex chars of md5(token) —
    * hex parsed positionally so the same SQL works in any engine.
    */
  private def hexVal4(h: String): String =
    (1 to 4).map { i =>
      val mult = Seq(4096, 256, 16, 1)(i - 1)
      s"(instr('0123456789abcdef', substring($h, $i, 1)) - 1) * $mult"
    }.mkString(" + ")

  /** SimHash over distinct tokens: bit k of the signature is set iff
    * the sum over tokens of (+-1 by bit k of the token hash) is >= 0.
    * Near-dup docs land in the same (or Hamming-close) signature.
    * Output: (doc_id, simhash, n_bucket).
    */
  def simhash(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    val bits = (0 until simhashBits).map { k =>
      val p = 1 << k
      s"""(CASE WHEN aggregate(__tv, 0,
         | (acc, v) -> acc + (CASE WHEN (v div $p) % 2 = 1 THEN 1 ELSE -1 END)) >= 0
         | THEN $p ELSE 0 END)""".stripMargin
    }.mkString(" + ")
    docs
      .withColumn("__w", split(col(textCol), " "))
      .withColumn("__tv", expr(
        s"transform(transform(array_distinct(__w), t -> md5(t)), h -> ${hexVal4("h")})"))
      .withColumn("simhash", expr(s"CAST($bits AS BIGINT)"))
      .withColumn("n_bucket",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("simhash")))
      .select(col(idCol), col("simhash"), col("n_bucket"))
  }
}
