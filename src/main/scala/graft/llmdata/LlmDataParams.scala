package graft.llmdata

/** Shared constants for the LLM-training-data operator family (dedup,
  * similarity search, text analysis, multimodal). Both the Spark
  * queries and their DuckDB oracle SQL are generated from these values,
  * so the two sides cannot drift.
  *
  * Design notes for 100 TB scale are on each operator object; the
  * common principle is that every candidate-generation step is a
  * bucket/band *equi-join* (shuffle on a sketch key), never an
  * all-pairs cross product.
  */
object LlmDataParams {

  /** MinHash-LSH: H hash functions, split into `bands` bands of
    * `rowsPerBand` rows. P(candidate | Jaccard j) = 1-(1-j^r)^b:
    * j=0.8 -> 0.94, j=0.3 -> 0.08 with (12, 3, 4).
    */
  val numHashes = 12
  val rowsPerBand = 3
  val bands = 4
  require(numHashes == rowsPerBand * bands)

  /** Word-shingle width for MinHash / Jaccard. */
  val shingleWidth = 3

  /** Char n-gram width, sampling stride, and sketch size for document
    * fingerprinting. */
  val fingerprintGram = 8
  val fingerprintStride = 4
  val fingerprintK = 4

  /** Exact-Jaccard verification threshold for near-dup pairs. */
  val jaccardThreshold = 0.4

  /** LSH hot-bucket cap: a band bucket with more members than this
    * star-expands to its min-id representative instead of self-joining
    * all pairs (|bucket|^2 -> |bucket| pair rows). 1000 bounds any
    * single bucket's pair fan-out at ~5*10^5 rows — well inside one
    * task — while every bucket a healthy corpus produces stays on the
    * exact all-pairs path. */
  val lshMaxBucket = 1000

  /** SimHash width in bits (over distinct tokens, md5-derived). */
  val simhashBits = 16

  /** Stopword list for quality scoring / token stats. */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Gopher-style repetition gates: a document is repetition-flagged
    * when its duplicate-word fraction or most-frequent-2-gram token
    * coverage exceeds these (Rae et al. 2021 §A1.1 use the same signal
    * family; thresholds re-tuned to this corpus's quantiles).
    */
  val repDupWordMax = 0.55
  val repTop2GramMax = 0.10

  /** Stratified-mixture sampling fractions per language (downsample
    * the dominant strata); unlisted strata keep [[mixtureDefault]].
    */
  val mixtureFractions: Map[String, Double] =
    Map("en" -> 0.5, "zh" -> 0.8, "es" -> 0.8)
  val mixtureDefault = 1.0

  /** Concat-and-chunk packing budget: tokens per training sequence. */
  val packBudget = 512L

  /** Per-source downsampling for the composed pretraining pipeline
    * (curate -> sample -> pack); unlisted sources keep the default.
    */
  val pipelineSourceFractions: Map[String, Double] =
    Map("src0" -> 0.5, "src1" -> 0.5)
  val pipelineDefaultFraction = 0.9

  /** PII scrub patterns. Deliberately backslash-free (character
    * classes + `[.]` for a literal dot) so the SAME string is a valid,
    * identical-semantics regex under Java (Spark) and RE2 (DuckDB),
    * with no engine-specific escaping layer.
    */
  val emailPattern = "[a-z0-9._-]+@[a-z0-9-]+[.][a-z]+"
  val phonePattern = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Language marker dictionaries for the n-gram/stopword language-ID
    * heuristic (deterministic; scored by marker-token hits).
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht"),
    "es" -> Seq("el", "la", "que", "de", "y", "no"),
    "fr" -> Seq("le", "la", "les", "et", "des", "ne"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** ANN: number of IVF centroids, probes per query, and k. */
  val ivfCentroids = 8
  val ivfProbes = 2
  val annK = 5

  /** Centroid count for the SCALED kNN-graph variant — the
    * bucket-count-tracks-corpus contract that keeps the self-join
    * linear per bucket (production: ~sqrt(n)).
    */
  val knnScaledCentroids = 32

  /** DSIR (Xie et al. 2023, "Data Selection for Language Models via
    * Importance Resampling"): hashed-unigram feature buckets for the
    * target/raw bag-of-words models, the resample budget, and the
    * target slice the catalog query conditions on. 64 buckets keeps
    * the oracle's bucket model readable while the operator itself
    * takes any bucket count (production: 10k+, still broadcast-sized).
    */
  val dsirBuckets = 64
  val dsirK = 40
  val dsirTargetLang = "en"

  /** Hashed-TF document clustering: feature-hash width (must be <=
    * embDim — centroid init reuses the lattice LCG positions) and
    * cluster count for the text k-means operator.
    */
  val docTfDim = 16
  val docClusterK = 8

  /** v4-capstone novelty gate: minimum corpus-unique n-gram mass in
    * micro-units (data-calibrated near the corpus p10 — drops the
    * most-boilerplate tail without touching the bulk).
    */
  val noveltyGateMicro = 100000L

  /** Calibration-bin label gate: the micro-quantized heuristic quality
    * score above which a document counts as a positive (data-calibrated
    * to this corpus's median — the synthetic quality scores span
    * ~[0.60, 0.80], so a 0.5 gate would label everything positive and
    * the reliability table would be vacuous).
    */
  val calibGateMicro = 730000L

  /** Top terms reported per document by the TF-IDF extractor. */
  val tfidfK = 5
  val ivfK = 3
  /** Query set for the ANN correctness queries: vec_id < this. */
  val annQueryIds = 20

  /** Random-hyperplane LSH for embedding near-dup: `lshTables` hash
    * tables of `lshBits` bits each (candidate if same bucket in ANY
    * table).
    */
  val lshTables = 4
  val lshBits = 4
  /** Cosine threshold for embedding near-dup (data-calibrated: the
    * synthetic embeddings are near-isotropic, max pairwise cos ~0.5).
    */
  val embDupThreshold = 0.35

  /** Within-cluster cosine above which the higher-id vector is pruned
    * by the SemDeDup pass (calibrated below [[embDupThreshold]]: same
    * near-isotropic corpus, but candidates are restricted to one
    * k-means cluster, so a lower bar still yields sparse pairs).
    */
  val semDedupThreshold = 0.30

  /** Prototypicality pruning fraction as an exact rational (prune the
    * `protoPruneNum/protoPruneDen` most prototypical members of each
    * cluster): integer rank arithmetic, never a float threshold.
    */
  val protoPruneNum = 1
  val protoPruneDen = 4

  /** Embedding dimension of the testdata embeddings table. */
  val embDim = 64

  /** Deterministic pseudo-random lattice in [-0.5, 0.5) used for IVF
    * centroids (seedOffset 0) and LSH hyperplanes (seedOffset 7777).
    * Pure integer LCG so Spark and DuckDB compute bit-identical doubles
    * from the same `(v / 1000.0 - 0.5)` expression: the integer `v` is
    * inlined into both expression strings; the two floating-point ops
    * are then identical IEEE-754 in either engine.
    */
  def latticeInts(seedOffset: Long, planeIdx: Int): IndexedSeq[Long] =
    (0 until embDim).map { d =>
      ((1103515245L * (seedOffset + planeIdx.toLong * embDim + d) + 12345L)
        % 2147483648L) % 1000L
    }

  /** `(v / 1000.0 - 0.5)` terms for an inline array/list literal —
    * identical fragment in Spark SQL and DuckDB SQL.
    */
  def latticeTerms(seedOffset: Long, planeIdx: Int): IndexedSeq[String] =
    latticeInts(seedOffset, planeIdx).map(v => s"($v / 1000.0 - 0.5)")

  /** KMV (bottom-k minimum values, Beyer et al. 2007) sketch size for
    * the cross-source vocabulary-overlap estimator. */
  val kmvK = 64

  /** Johnson–Lindenstrauss random-projection width for the
    * data-independent reduction audit (`emb_rp_recall`) — the
    * Achlioptas ±1 sign rows derive from the shared LCG (seed block
    * 770000) so both engines inline identical literals. */
  val rpDim = 8

  /** ±1 sign row k of the JL projection, as literal terms for an
    * inline array on either engine. */
  def rpSignTerms(k: Int): IndexedSeq[String] =
    latticeInts(770000L, k).map(v => if (v % 2 == 0) "1.0" else "-1.0")

  /** Prefix-dedup (truncation duplicates): candidate-key width in
    * tokens — two documents are candidates only when their first
    * `prefixKeyTokens` tokens are identical (an equi-join key, never
    * an all-pairs scan). */
  val prefixKeyTokens = 10

  /** Pseudo-relevance feedback (RM3-lite): feedback depth and the
    * number of expansion terms appended per query. */
  val prfFbDocs = 3
  val prfFbTerms = 5

  /** Perceptual-hash dedup: the aHash frame is the first
    * `phashBytes` payload bytes, split into `phashBands` bands of
    * `phashBandBits` bits for the hamming-LSH candidate join; pairs
    * verify at hamming <= `phashMaxHamming`. The pigeonhole guarantee
    * needs maxHamming < bands: <= 3 flipped bits cannot touch all 4
    * bands, so every qualifying pair shares at least one band key. */
  val phashBytes = 64
  val phashBands = 4
  val phashBandBits = 16
  val phashMaxHamming = 3
  require(phashMaxHamming < phashBands)
  require(phashBands * phashBandBits == phashBytes)

  /** Count-Min sketch geometry (Cormode & Muthukrishnan 2005):
    * `cmsDepth` independent hash rows of `cmsWidth` counters each.
    * depth x width is a CONFIG constant (256 cells), so the sketch
    * frame is broadcastable at any corpus size. */
  val cmsDepth = 4
  val cmsWidth = 64

  /** Positional decode of the first 4 hex chars of a digest column
    * `h` into a 16-bit value — THE portable hash both engines share
    * (SimHash, the hashed classifier, winnowing). `posFn` is the
    * 1-based index-of function: `instr`/`substring` on Spark,
    * `strpos`/`substr` on DuckDB; widening the hash means widening it
    * HERE, never in one caller.
    */
  def hexDecode4(h: String, posFn: String = "instr",
                 substrFn: String = "substring"): String =
    (1 to 4).map { i =>
      val mult = Seq(4096, 256, 16, 1)(i - 1)
      s"($posFn('0123456789abcdef', $substrFn($h, $i, 1)) - 1) * $mult"
    }.mkString(" + ")

  /** Fixed operating points for the classifier's precision/recall
    * sweep ([[Classifier.prSweep]]), in hard-sigmoid micro units:
    * chance (5e5) plus two symmetric bands each side. A CONFIG
    * constant so the Spark query and the DuckDB oracle enumerate the
    * same literals — thresholds are policy, not data. */
  val prSweepThresholdsPpm: Seq[Long] =
    Seq(200000L, 400000L, 500000L, 600000L, 800000L)

  /** Rank cutoffs for the retrieval recall@k curve — CONFIG so the
    * Spark query and the oracle enumerate the same literals. */
  val recallCurveKs: Seq[Long] = Seq(1L, 2L, 3L, 5L, 10L)

  /** Poisson bootstrap (online bagging, Oza & Russell 2001): replicate
    * count, and the cumulative Poisson(1) CDF P(X <= k), k = 0..8, in
    * exact micro-units (the tail beyond 8 rounds to zero at this
    * grain, so draws landing in the last cell take weight 9). A
    * document's replicate-b weight is the count of thresholds its
    * micro-uniform md5 draw reaches — identical integer arithmetic on
    * both engines.
    */
  val bootstrapReps = 20
  val poissonCumMicro: Seq[Long] = Seq(
    367879L, 735759L, 919699L, 981012L, 996340L,
    999406L, 999917L, 999990L, 999999L)

  /** Hand-pinned merge table for the SQL-expressible tokenizer-
    * application surface (`text_bpe_fertility`): the first five
    * merges BPE training learns on the sf0.01 documents corpus,
    * fixed as literals so the encode pass is one-query replayable in
    * both engines (a data-dependent list is the spec-only
    * [[TextAnalysis.bpeTrain]] surface). Applied once each, in
    * order, as the greedy leftmost-non-overlapping fold.
    */
  val bpeFixedMerges: Seq[(String, String)] = Seq(
    "e" -> "r", "i" -> "n", "o" -> "w", "o" -> "r", "s" -> "t")

  /** Multiple-of-corpus frames (exploded tokens/shingles/grams) are
    * persisted only while the INPUT corpus's estimated size is under
    * this bound — see [[PersistPolicy.persistGated]] for the
    * trade-off. 8 GiB keeps every bench/rehearsal fixture (≤ ~250 MB)
    * on the shared-scan fast path while any production corpus slice
    * big enough to threaten executor storage takes the recompute
    * path. Tune per cluster: a sane setting is a fraction of
    * aggregate executor storage memory divided by the explode
    * multiplier (~3-4× for 3-shingles).
    */
  val corpusPersistMaxBytes: Long = 8L << 30
}
