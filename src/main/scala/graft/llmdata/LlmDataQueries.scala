package graft.llmdata

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{CatalogEntry, QuerySupport}
import LlmDataParams._

/** Driver correctness/bench queries for the LLM-training-data operator
  * family, over the driver's `documents` / `embeddings` testdata
  * tables. Every oracle below is generated from the SAME constants in
  * [[LlmDataParams]] as the Spark query, with engine-portable
  * primitives only (md5 hex strings, integer lattices, left-fold
  * sums), so DuckDB replays each operator bit-exactly.
  */
object LlmDataQueries {

  private val r6 = QuerySupport.r6 _
  private def r6s(e: String) = QuerySupport.r6Sql(e)

  // ---------------------------------------------------------------- dedup

  /** Shared oracle CTE chain: tokens -> shingles -> minhash signature
    * -> band keys -> candidate pairs (mirrors Dedup.minhashCandidates).
    */
  private def minhashCtes: String = minhashCtesFrom("documents")

  private def minhashCtesFrom(src: String): String =
    s"""${minhashBandCtes(src, "")},
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)""".stripMargin

  /** Suffixed tokens -> shingles -> signature -> band-key CTE chain, so
    * two corpora can be sketched side by side in one oracle (the
    * cross-corpus join).
    */
  private def minhashBandCtes(src: String, sfx: String): String = {
    val sw = shingleWidth
    val cat = (0 until sw).map(o => s"w$sfx[i+$o]").mkString(" || ' ' || ")
    val mhList = (0 until numHashes)
      .map(k => s"list_aggregate(list_transform(sh$sfx, x -> md5('mh$k:' || x)), 'min')")
      .mkString(", ")
    val bandSelects = (0 until bands).map { j =>
      val slice = (1 to rowsPerBand).map(i => s"mh$sfx[${j * rowsPerBand + i}]").mkString(" || ")
      s"SELECT doc_id, $j AS band, md5($slice) AS key FROM mh$sfx"
    }.mkString("\n UNION ALL ")
    s"""w$sfx AS (SELECT doc_id, string_split(text, ' ') AS w$sfx FROM $src),
       |sh$sfx AS (SELECT doc_id, list_transform(range(1, greatest(len(w$sfx) - ${sw - 2}, 1)), i -> $cat) AS sh$sfx FROM w$sfx),
       |mh$sfx AS (SELECT doc_id, [$mhList] AS mh$sfx FROM sh$sfx),
       |bands$sfx AS ($bandSelects)""".stripMargin
  }

  private val dedupExact = CatalogEntry(
    "dedup_exact",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents").select("doc_id", "text")
      // inject exact duplicates (1 in 5 docs) so the dedup has work to do
      val corpus = d.union(d.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      Dedup.exactDedup(corpus).orderBy("keep_id")
    },
    Some("""WITH corpus AS (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0)
           |SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies
           |FROM corpus GROUP BY md5(text) ORDER BY keep_id""".stripMargin))

  /** Normalization-aware exact dedup: duplicates injected as
    * case/punctuation/whitespace variants (upper-cased + ' !!'
    * suffix) so the normalized digest demonstrably collapses what
    * bit-exact hashing cannot.
    */
  private val dedupExactNormalized = CatalogEntry(
    "dedup_exact_normalized",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents").select("doc_id", "text")
      val corpus = d.union(d.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 2000000).as("doc_id"),
          concat(upper(col("text")), lit(" !!")).as("text")))
      Dedup.exactDedupNormalized(corpus).orderBy("keep_id")
    },
    Some("""WITH corpus AS (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL SELECT doc_id + 2000000 AS doc_id, upper(text) || ' !!' AS text
           |  FROM documents WHERE doc_id % 7 = 0),
           |n AS (SELECT doc_id, array_to_string(list_filter(string_split(
           |        replace(replace(replace(replace(replace(replace(lower(text),
           |          '.', ''), ',', ''), '!', ''), '?', ''), ';', ''), ':', ''),
           |        ' '), x -> x != ''), ' ') AS norm
           |      FROM corpus)
           |SELECT md5(norm) AS norm_hash, min(doc_id) AS keep_id, count(*) AS n_copies
           |FROM n GROUP BY md5(norm) ORDER BY keep_id""".stripMargin))

  private val dedupMinhash = CatalogEntry(
    "dedup_minhash_candidates",
    (s, dir) => Dedup.minhashCandidates(
        Dedup.sketch(QuerySupport.table(s, dir, "documents")))
      .orderBy("doc_a", "doc_b"),
    Some(s"WITH $minhashCtes SELECT doc_a, doc_b FROM cand ORDER BY doc_a, doc_b"))

  /** Blocking-quality triad (reduction ratio / pair completeness /
    * pair quality) of the LSH candidate generation vs exact-digest
    * ground truth, on a corpus with injected exact duplicates.
    */
  private val dedupBlockingAudit = CatalogEntry(
    "dedup_blocking_audit",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents").select("doc_id", "text")
      val corpus = d.union(d.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      Dedup.blockingAudit(corpus)
    },
    Some(s"""WITH corpus AS (
            |  SELECT doc_id, text FROM documents
            |  UNION ALL SELECT doc_id + 1000000 AS doc_id, text
            |  FROM documents WHERE doc_id % 5 = 0),
            |${minhashCtesFrom("corpus")},
            |nk AS (SELECT doc_id, md5(text) AS k FROM corpus),
            |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM corpus),
            |tp AS (SELECT CAST(coalesce(sum(g * (g - 1) // 2), 0) AS BIGINT)
            |         AS n_truth_pairs
            |       FROM (SELECT count(*) AS g FROM nk GROUP BY k)),
            |cn AS (SELECT CAST(count(*) AS BIGINT) AS n_candidate_pairs FROM cand),
            |fd AS (SELECT CAST(count(*) AS BIGINT) AS n_truth_found
            |       FROM cand c JOIN nk a ON a.doc_id = c.doc_a
            |       JOIN nk b ON b.doc_id = c.doc_b WHERE a.k = b.k),
            |m AS (SELECT n_docs, n_docs * (n_docs - 1) // 2 AS n_total_pairs,
            |        n_candidate_pairs, n_truth_pairs, n_truth_found
            |      FROM nd CROSS JOIN tp CROSS JOIN cn CROSS JOIN fd)
            |SELECT n_docs, n_total_pairs, n_candidate_pairs, n_truth_pairs,
            |  n_truth_found,
            |  1000000 - n_candidate_pairs * 1000000
            |    // greatest(n_total_pairs, 1) AS reduction_ratio_micro,
            |  n_truth_found * 1000000 // greatest(n_truth_pairs, 1)
            |    AS pair_completeness_micro,
            |  n_truth_found * 1000000 // greatest(n_candidate_pairs, 1)
            |    AS pair_quality_micro
            |FROM m""".stripMargin))

  /** MinHash estimator audit over the candidate pairs: signature-
    * agreement estimate vs exact shingle Jaccard, both exact integer
    * micro-units in both engines.
    */
  private val dedupMinhashAudit = CatalogEntry(
    "dedup_minhash_estimate",
    (s, dir) => Dedup.minhashJaccardAudit(
        Dedup.sketch(QuerySupport.table(s, dir, "documents")))
      .orderBy("doc_a", "doc_b"),
    Some(s"""WITH $minhashCtes,
            |ds AS (SELECT doc_id, list_distinct(sh) AS s FROM sh),
            |j AS (SELECT c.doc_a, c.doc_b,
            |        CAST(len(list_filter(range(1, ${numHashes + 1}),
            |               i -> ma.mh[i] = mb.mh[i])) AS BIGINT) AS est_matches,
            |        CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter,
            |        CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS BIGINT) AS uni
            |      FROM cand c
            |      JOIN mh ma ON ma.doc_id = c.doc_a JOIN mh mb ON mb.doc_id = c.doc_b
            |      JOIN ds a ON a.doc_id = c.doc_a JOIN ds b ON b.doc_id = c.doc_b)
            |SELECT doc_a, doc_b, est_matches,
            |  est_matches * 1000000 // $numHashes AS est_jaccard_micro,
            |  CASE WHEN uni = 0 THEN 1000000 ELSE inter * 1000000 // uni END AS jaccard_micro,
            |  est_matches * 1000000 // $numHashes
            |    - CASE WHEN uni = 0 THEN 1000000 ELSE inter * 1000000 // uni END AS err_micro
            |FROM j ORDER BY doc_a, doc_b""".stripMargin))

  /** Source-pair near-dup matrix: candidate + verified-true pair
    * counts per unordered source pair with exact ppm shares —
    * diagonal = within-source re-crawl, off-diagonal = cross-source
    * contamination. Rides the audit chain; sources attach id-keyed.
    */
  private def sourceMatrixOracleSql(samplePred: String): String = {
      val t = (jaccardThreshold * 1000000).toLong
      s"""WITH $minhashCtes,
         |ds AS (SELECT doc_id, list_distinct(sh) AS s FROM sh),
         |jm AS (SELECT c.doc_a, c.doc_b,
         |        CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter,
         |        CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))
         |          AS BIGINT) AS uni
         |      FROM cand c
         |      JOIN ds a ON a.doc_id = c.doc_a JOIN ds b ON b.doc_id = c.doc_b$samplePred),
         |sj AS (SELECT least(da.source, db.source) AS source_a,
         |         greatest(da.source, db.source) AS source_b,
         |         (CASE WHEN uni = 0 THEN 1000000
         |               ELSE inter * 1000000 // uni END) >= $t AS istrue
         |       FROM jm JOIN documents da ON da.doc_id = jm.doc_a
         |       JOIN documents db ON db.doc_id = jm.doc_b),
         |per AS (SELECT source_a, source_b,
         |          CAST(count(*) AS BIGINT) AS n_candidate_pairs,
         |          CAST(sum(CASE WHEN istrue THEN 1 ELSE 0 END) AS BIGINT) AS n_true_pairs
         |        FROM sj GROUP BY 1, 2),
         |t AS (SELECT CAST(sum(n_true_pairs) AS BIGINT) AS tt FROM per)
         |SELECT source_a, source_b, n_candidate_pairs, n_true_pairs,
         |  CAST(n_true_pairs * 1000000 // greatest(tt, 1) AS BIGINT) AS true_share_ppm
         |FROM per CROSS JOIN t ORDER BY source_a, source_b""".stripMargin
  }

  private val dedupSourceMatrix = CatalogEntry(
    "dedup_source_matrix",
    (s, dir) => Dedup.sourceReuseMatrix(
        QuerySupport.table(s, dir, "documents"))
      .orderBy("source_a", "source_b"),
    Some(sourceMatrixOracleSql("")))

  /** The contamination matrix's production scale path over the shared
    * 25% digest pair sample (the audit family's pair-count contract:
    * 36x at the 100x saturation point unsampled). */
  private val dedupSourceMatrixSampled = CatalogEntry(
    "dedup_source_matrix_sampled",
    (s, dir) => Dedup.sourceReuseMatrix(
        QuerySupport.table(s, dir, "documents"), samplePpm = 250000L)
      .orderBy("source_a", "source_b"),
    Some(sourceMatrixOracleSql(auditSamplePred)))

  /** MinHash WIDTH planner: per prefix width, the estimator's mean
    * |err| and signed bias vs exact Jaccard over the candidate pairs
    * — the H-axis companion of the banding planner. Signed means
    * divide once, truncating toward zero identically on both engines.
    */
  private def widthPlanOracleSql(samplePred: String): String = {
      val cfg = Seq(3, 6, 12).map { w =>
        s"""SELECT CAST($w AS BIGINT) AS n_hashes,
           |  CAST(len(list_filter(range(1, ${w + 1}),
           |    i -> ma[i] = mb[i])) AS BIGINT) * 1000000 // $w - jac AS err
           |FROM j2""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH $minhashCtes,
         |ds AS (SELECT doc_id, list_distinct(sh) AS s FROM sh),
         |jm AS (SELECT ma.mh AS ma, mb.mh AS mb,
         |        CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter,
         |        CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))
         |          AS BIGINT) AS uni
         |      FROM cand c
         |      JOIN mh ma ON ma.doc_id = c.doc_a JOIN mh mb ON mb.doc_id = c.doc_b
         |      JOIN ds a ON a.doc_id = c.doc_a JOIN ds b ON b.doc_id = c.doc_b$samplePred),
         |j2 AS (SELECT ma, mb, CAST(CASE WHEN uni = 0 THEN 1000000
         |         ELSE inter * 1000000 // uni END AS BIGINT) AS jac FROM jm),
         |pc AS ($cfg)
         |SELECT n_hashes, CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(abs(err)) AS BIGINT) AS sum_abs_err,
         |  CAST(sum(abs(err)) // greatest(count(*), 1) AS BIGINT)
         |    AS mean_abs_err_micro,
         |  CAST(sum(err) // greatest(count(*), 1) AS BIGINT) AS mean_err_micro
         |FROM pc GROUP BY n_hashes ORDER BY n_hashes""".stripMargin
  }

  /** The shared sampled-pair predicate for the audit-family oracles
    * (lshPlanOracleSql's spelling, 25% cut). Lazy: consumed by
    * entries declared BEFORE this point in the object's
    * initialization order. */
  private lazy val auditSamplePred: String =
    s" WHERE substr(md5('lshplan:' || CAST(c.doc_a AS VARCHAR) || " +
      s"':' || CAST(c.doc_b AS VARCHAR)), 1, 8) < " +
      s"'${Sampling.hexThreshold(0.25)}'"

  private val dedupMinhashWidthPlan = CatalogEntry(
    "dedup_minhash_width_plan",
    (s, dir) => Dedup.minhashWidthPlan(
        Dedup.sketch(QuerySupport.table(s, dir, "documents")))
      .orderBy("n_hashes"),
    Some(widthPlanOracleSql("")))

  /** The width planner's production scale path: the same report over
    * the shared 25% digest pair sample (the audit family tracks
    * candidate pairs — 44x at the 100x saturation point unsampled).
    */
  private val dedupMinhashWidthPlanSampled = CatalogEntry(
    "dedup_minhash_width_plan_sampled",
    (s, dir) => Dedup.minhashWidthPlan(
        Dedup.sketch(QuerySupport.table(s, dir, "documents")),
        samplePpm = 250000L)
      .orderBy("n_hashes"),
    Some(widthPlanOracleSql(auditSamplePred)))

  /** Cheap-gate agreement audit: MinHash estimate vs SimHash hamming
    * against exact Jaccard on the candidate pairs — per-method exact
    * confusion + precision/recall, plus where the gates disagree.
    */
  private def methodAgreementOracleSql(samplePred: String): String = {
      val t = (jaccardThreshold * 1000000).toLong
      val hv = hexDecode4("h", posFn = "strpos", substrFn = "substr")
      val bitsSum = (0 until simhashBits).map { k =>
        val p = 1 << k
        s"(CASE WHEN list_sum(list_transform(tv, v -> CASE WHEN (v // $p) % 2 = 1 THEN 1 ELSE -1 END)) >= 0 THEN $p ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH $minhashCtes,
         |ds AS (SELECT doc_id, list_distinct(sh) AS s FROM sh),
         |wt AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |tv AS (SELECT doc_id, list_transform(list_transform(list_distinct(w), t -> md5(t)), h -> $hv) AS tv FROM wt),
         |sv AS (SELECT doc_id, CAST($bitsSum AS BIGINT) AS simhash FROM tv),
         |jm AS (SELECT c.doc_a, c.doc_b,
         |        CAST(len(list_filter(range(1, ${numHashes + 1}),
         |          i -> ma.mh[i] = mb.mh[i])) AS BIGINT) AS agree,
         |        CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter,
         |        CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))
         |          AS BIGINT) AS uni,
         |        sa.simhash AS ha, sb.simhash AS hb
         |      FROM cand c
         |      JOIN mh ma ON ma.doc_id = c.doc_a JOIN mh mb ON mb.doc_id = c.doc_b
         |      JOIN ds a ON a.doc_id = c.doc_a JOIN ds b ON b.doc_id = c.doc_b
         |      JOIN sv sa ON sa.doc_id = c.doc_a JOIN sv sb ON sb.doc_id = c.doc_b$samplePred),
         |g AS (SELECT
         |        (CASE WHEN uni = 0 THEN 1000000
         |              ELSE inter * 1000000 // uni END) >= $t AS istrue,
         |        agree * 1000000 // $numHashes >= $t AS mh_pred,
         |        bit_count(xor(ha, hb)) <= 3 AS sh_pred
         |      FROM jm),
         |pc AS (SELECT 'minhash_est' AS method, mh_pred AS pred, * FROM g
         |       UNION ALL
         |       SELECT 'simhash' AS method, sh_pred AS pred, * FROM g)
         |SELECT method,
         |  CAST(sum(CASE WHEN pred AND istrue THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |  CAST(sum(CASE WHEN pred AND NOT istrue THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |  CAST(sum(CASE WHEN NOT pred AND istrue THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |  CAST(sum(CASE WHEN NOT pred AND NOT istrue THEN 1 ELSE 0 END) AS BIGINT) AS tn,
         |  CAST(sum(CASE WHEN pred AND istrue THEN 1 ELSE 0 END) * 1000000
         |    // greatest(sum(CASE WHEN pred THEN 1 ELSE 0 END), 1) AS BIGINT)
         |    AS precision_micro,
         |  CAST(sum(CASE WHEN pred AND istrue THEN 1 ELSE 0 END) * 1000000
         |    // greatest(sum(CASE WHEN istrue THEN 1 ELSE 0 END), 1) AS BIGINT)
         |    AS recall_micro,
         |  CAST(sum(CASE WHEN mh_pred = sh_pred THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_agree,
         |  CAST(sum(CASE WHEN mh_pred <> sh_pred THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_disagree
         |FROM pc GROUP BY method ORDER BY method""".stripMargin
  }

  private val dedupMethodAgreement = CatalogEntry(
    "dedup_method_agreement",
    (s, dir) => Dedup.methodAgreement(
        QuerySupport.table(s, dir, "documents"))
      .orderBy("method"),
    Some(methodAgreementOracleSql("")))

  /** The agreement audit's production scale path over the shared 25%
    * digest pair sample (the audit family's pair-count contract). */
  private val dedupMethodAgreementSampled = CatalogEntry(
    "dedup_method_agreement_sampled",
    (s, dir) => Dedup.methodAgreement(
        QuerySupport.table(s, dir, "documents"), samplePpm = 250000L)
      .orderBy("method"),
    Some(methodAgreementOracleSql(auditSamplePred)))

  /** Bigram conditional entropy rate: count-scaled micro-nat terms
    * (the charEntropy quantization) over the bigram vocabulary and
    * its first-word marginal, exact difference, one-row report.
    */
  private val textEntropyRate = CatalogEntry(
    "text_entropy_rate",
    (s, dir) => TextAnalysis.entropyRate(
        QuerySupport.table(s, dir, "documents")),
    Some("""WITH w AS (SELECT string_split(text, ' ') AS w FROM documents
           |        WHERE len(string_split(text, ' ')) >= 2),
           |p AS (SELECT w[i] AS w1, w[i + 1] AS w2
           |      FROM (SELECT w, unnest(range(1, len(w))) AS i FROM w)),
           |c AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM p
           |      GROUP BY 1, 2),
           |f AS (SELECT w1, CAST(sum(c) AS BIGINT) AS c1 FROM c GROUP BY w1),
           |t AS (SELECT CAST(sum(c) AS BIGINT) AS n,
           |        CAST(count(*) AS BIGINT) AS n_bigram_types FROM c),
           |hj AS (SELECT CAST(coalesce(sum(CAST(floor(c * ln(CAST(n AS DOUBLE) / c)
           |          * 1000000 + 0.5) AS BIGINT)), 0) AS BIGINT) AS h_joint_unats
           |       FROM c CROSS JOIN t),
           |hf AS (SELECT CAST(count(*) AS BIGINT) AS n_first_types,
           |         CAST(coalesce(sum(CAST(floor(c1 * ln(CAST(n AS DOUBLE) / c1)
           |           * 1000000 + 0.5) AS BIGINT)), 0) AS BIGINT) AS h_first_unats
           |       FROM f CROSS JOIN t)
           |SELECT n AS n_pairs, n_bigram_types, n_first_types,
           |  h_joint_unats, h_first_unats,
           |  h_joint_unats - h_first_unats AS h_cond_unats,
           |  (h_joint_unats - h_first_unats) // greatest(n, 1)
           |    AS cond_entropy_micro
           |FROM t CROSS JOIN hj CROSS JOIN hf""".stripMargin))

  /** LSH banding planner: per signature factorization, expected
    * recall/false-candidate rate from `1-(1-j^r)^b` integrated over
    * the observed candidate-pair Jaccard distribution — the pow-free
    * repeated-multiply spelling replays double-identically.
    */
  /** Shared planner oracle body; `samplePred` restricts the pair
    * population (the sampled sibling's digest threshold; empty = the
    * full audit-exact population).
    */
  private def lshPlanOracleSql(samplePred: String): String = {
      val t = (jaccardThreshold * 1000000).toLong
      val cfg = Dedup.lshPlanConfigs.map { case (b, r) =>
        val jr = (1 to r).map(_ => "(cast(jaccard_micro as double) / 1000000.0)")
          .mkString(" * ")
        val miss = (1 to b).map(_ => s"(1.0 - $jr)").mkString(" * ")
        s"""SELECT CAST($b AS BIGINT) AS bands,
           |  CAST($r AS BIGINT) AS rows_per_band,
           |  jaccard_micro >= $t AS istrue,
           |  CAST(floor((1.0 - $miss) * 1000000.0 + 0.5) AS BIGINT) AS p
           |FROM jm""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH $minhashCtes,
         |ds AS (SELECT doc_id, list_distinct(sh) AS s FROM sh),
         |jj AS (SELECT CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter,
         |         CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))
         |           AS BIGINT) AS uni
         |       FROM cand c JOIN ds a ON a.doc_id = c.doc_a
         |       JOIN ds b ON b.doc_id = c.doc_b$samplePred),
         |jm AS (SELECT CAST(CASE WHEN uni = 0 THEN 1000000
         |         ELSE inter * 1000000 // uni END AS BIGINT) AS jaccard_micro
         |       FROM jj),
         |pc AS ($cfg)
         |SELECT bands, rows_per_band,
         |  CAST(sum(CASE WHEN istrue THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_true_pairs,
         |  CAST(coalesce(sum(CASE WHEN istrue THEN p END), 0)
         |    // greatest(sum(CASE WHEN istrue THEN 1 ELSE 0 END), 1)
         |    AS BIGINT) AS exp_recall_micro,
         |  CAST(sum(CASE WHEN NOT istrue THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_below,
         |  CAST(coalesce(sum(CASE WHEN NOT istrue THEN p END), 0)
         |    // greatest(sum(CASE WHEN NOT istrue THEN 1 ELSE 0 END), 1)
         |    AS BIGINT) AS exp_false_rate_micro
         |FROM pc GROUP BY 1, 2 ORDER BY bands DESC""".stripMargin
  }

  private val dedupLshParamPlan = CatalogEntry(
    "dedup_lsh_param_plan",
    (s, dir) => Dedup.lshParamPlan(QuerySupport.table(s, dir, "documents"))
      .orderBy(col("bands").desc),
    Some(lshPlanOracleSql("")))

  /** The planner's production scale path, oracled next to the exact
    * one (the fixed-vs-scaled sibling discipline): a deterministic
    * 25% digest sample of the pair population BEFORE the exact
    * Jaccard audit — the plan needs the distribution, not every
    * pair, and the predicate pushes below the intersect work.
    */
  private val dedupLshParamPlanSampled = CatalogEntry(
    "dedup_lsh_param_plan_sampled",
    (s, dir) => Dedup.lshParamPlan(QuerySupport.table(s, dir, "documents"),
        samplePpm = 250000L)
      .orderBy(col("bands").desc),
    Some(lshPlanOracleSql(
      // single line: line-leading || would lose a pipe to the OUTER
      // template's stripMargin
      s" WHERE substr(md5('lshplan:' || CAST(c.doc_a AS VARCHAR) || " +
        s"':' || CAST(c.doc_b AS VARCHAR)), 1, 8) < " +
        s"'${Sampling.hexThreshold(0.25)}'")))

  /** N-gram novelty per document: distinct-shingle document
    * frequencies replayed with the same empty-under-3-tokens shingle
    * contract as the decontamination oracles.
    */
  private val textNgramNovelty = CatalogEntry(
    "text_ngram_novelty",
    (s, dir) => Dedup.ngramNovelty(QuerySupport.table(s, dir, "documents"))
      .orderBy("doc_id"),
    Some {
      val sw = shingleWidth
      val cat = (0 until sw).map(o => s"w2[i+$o]").mkString(" || ' ' || ")
      val shingle = s"list_transform(range(1, greatest(len(w2) - ${sw - 2}, 1)), i -> $cat)"
      s"""WITH wq AS (SELECT doc_id, string_split(text, ' ') AS w2 FROM documents),
         |gq AS (SELECT DISTINCT doc_id, unnest($shingle) AS g FROM wq),
         |dfq AS (SELECT g, count(*) AS df FROM gq GROUP BY g)
         |SELECT gq.doc_id, count(*) AS n_grams,
         |  CAST(sum(CASE WHEN dfq.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
         |  CAST(sum(CASE WHEN dfq.df = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000
         |    // count(*) AS novelty_micro
         |FROM gq JOIN dfq USING (g) GROUP BY gq.doc_id
         |ORDER BY doc_id""".stripMargin
    })

  /** Cross-corpus novelty: candidates (doc_id % 3 <> 0) scored
    * against the reference slice's distinct gram vocabulary; the
    * left join replays the absent-gram test.
    */
  private val textCrossNovelty = CatalogEntry(
    "text_cross_novelty",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents")
      Dedup.crossNovelty(
          d.filter(col("doc_id") % 3 =!= 0),
          d.filter(col("doc_id") % 3 === 0))
        .orderBy("doc_id")
    },
    Some {
      val sw = shingleWidth
      val cat = (0 until sw).map(o => s"w2[i+$o]").mkString(" || ' ' || ")
      val shingle = s"list_transform(range(1, greatest(len(w2) - ${sw - 2}, 1)), i -> $cat)"
      s"""WITH wq AS (SELECT doc_id, string_split(text, ' ') AS w2
         |      FROM documents WHERE doc_id % 3 <> 0),
         |gq AS (SELECT DISTINCT doc_id, unnest($shingle) AS g FROM wq),
         |wr AS (SELECT doc_id, string_split(text, ' ') AS w2
         |      FROM documents WHERE doc_id % 3 = 0),
         |gr AS (SELECT DISTINCT unnest($shingle) AS g FROM wr)
         |SELECT gq.doc_id, count(*) AS n_grams,
         |  CAST(sum(CASE WHEN gr.g IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         |  CAST(sum(CASE WHEN gr.g IS NULL THEN 1 ELSE 0 END) AS BIGINT) * 1000000
         |    // count(*) AS novelty_micro
         |FROM gq LEFT JOIN gr ON gr.g = gq.g GROUP BY gq.doc_id
         |ORDER BY doc_id""".stripMargin
    })

  /** Hot-bucket capped LSH: exact duplicates are injected (3 extra
    * copies of every 10th doc) so their band buckets exceed the cap
    * (3) and take the star-expansion path, while natural buckets stay
    * on the all-pairs path — both branches of
    * [[Dedup.minhashCandidates]] are hash-checked against a DuckDB
    * oracle replicating the star semantics.
    */
  private val dedupLshCapped = CatalogEntry(
    "dedup_lsh_capped",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents").select("doc_id", "text")
      val corpus = d.union(d.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), col("text"),
          explode(array(lit(1000000L), lit(2000000L), lit(3000000L))).as("off"))
        .select((col("doc_id") + col("off")).as("doc_id"), col("text")))
      Dedup.minhashCandidates(Dedup.sketch(corpus), maxBucket = 3)
        .orderBy("doc_a", "doc_b")
    },
    Some(s"""WITH corpus AS (
            |  SELECT doc_id, text FROM documents
            |  UNION ALL
            |  SELECT doc_id + off AS doc_id, text
            |  FROM documents, (VALUES (1000000), (2000000), (3000000)) o(off)
            |  WHERE doc_id % 10 = 0),
            |${minhashCtesFrom("corpus")},
            |stats AS (SELECT band, key, count(*) AS n, min(doc_id) AS rep
            |          FROM bands GROUP BY 1, 2),
            |kb AS (SELECT b.doc_id, b.band, b.key, s.n, s.rep
            |       FROM bands b JOIN stats s USING (band, key)),
            |capped AS (
            |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            |  FROM kb a JOIN kb b
            |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
            |  WHERE a.n <= 3
            |  UNION
            |  SELECT rep AS doc_a, doc_id AS doc_b FROM kb
            |  WHERE n > 3 AND doc_id <> rep)
            |SELECT doc_a, doc_b FROM capped ORDER BY doc_a, doc_b""".stripMargin))

  private val dedupJaccard = CatalogEntry(
    "dedup_ngram_jaccard",
    (s, dir) => {
      val v = Dedup.verifiedNearDups(
        Dedup.sketch(QuerySupport.table(s, dir, "documents")))
      v.select(col("doc_a"), col("doc_b"), r6(col("jaccard")).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    },
    Some(s"""WITH $minhashCtes,
            |ds AS (SELECT doc_id, list_distinct(sh) AS s FROM sh),
            |j AS (SELECT c.doc_a, c.doc_b,
            |        len(list_intersect(a.s, b.s)) AS inter, len(a.s) AS la, len(b.s) AS lb
            |      FROM cand c JOIN ds a ON a.doc_id = c.doc_a JOIN ds b ON b.doc_id = c.doc_b)
            |SELECT doc_a, doc_b, ${r6s("CAST(inter AS DOUBLE) / (la + lb - inter)")} AS jaccard
            |FROM j WHERE CAST(inter AS DOUBLE) / (la + lb - inter) >= $jaccardThreshold
            |ORDER BY doc_a, doc_b""".stripMargin))

  /** The clustering chain up to `roots` — shared by the two cluster
    * oracles and the canonical-selection composition below.
    */
  private val clustersCtes: String =
    s"""$minhashCtes,
       |ds AS (SELECT doc_id, list_distinct(sh) AS s FROM sh),
       |vp AS (SELECT c.doc_a, c.doc_b
       |       FROM cand c JOIN ds a ON a.doc_id = c.doc_a JOIN ds b ON b.doc_id = c.doc_b
       |       WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |             / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= $jaccardThreshold),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM vp
       |          UNION SELECT doc_b, doc_a FROM vp),
       |reach AS (SELECT a, b FROM edges
       |          UNION
       |          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       |roots AS (SELECT a AS doc_id, least(a, min(b)) AS root_id FROM reach GROUP BY a)""".stripMargin

  private val clustersOracle: String =
    s"""WITH RECURSIVE $clustersCtes
       |SELECT d.doc_id, coalesce(r.root_id, d.doc_id) AS root_id
       |FROM documents d LEFT JOIN roots r USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  private val dedupClusters = CatalogEntry(
    "dedup_clusters",
    (s, dir) => Dedup.nearDupClusters(QuerySupport.table(s, dir, "documents"))
      .orderBy("doc_id"),
    Some(clustersOracle))

  /** Cluster-size histogram over the same clustering chain: the dedup
    * impact report, exact ppm of corpus mass per cluster size.
    */
  private val dedupClusterHistogram = CatalogEntry(
    "dedup_cluster_histogram",
    (s, dir) => Dedup.clusterSizeHistogram(
        QuerySupport.table(s, dir, "documents"))
      .orderBy("cluster_size"),
    Some(s"""WITH RECURSIVE $clustersCtes,
            |cl AS (SELECT d.doc_id, coalesce(r.root_id, d.doc_id) AS root_id
            |       FROM documents d LEFT JOIN roots r USING (doc_id)),
            |sz AS (SELECT root_id, CAST(count(*) AS BIGINT) AS cluster_size
            |       FROM cl GROUP BY root_id),
            |h AS (SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
            |      FROM sz GROUP BY cluster_size),
            |t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM cl)
            |SELECT cluster_size, n_clusters,
            |  CAST(cluster_size * n_clusters AS BIGINT) AS n_docs,
            |  CAST(cluster_size * n_clusters * 1000000
            |    // greatest(t.total, 1) AS BIGINT) AS docs_share_ppm
            |FROM h, t ORDER BY cluster_size""".stripMargin))

  /** Same clustering contract, forced down the distributed
    * large-star/small-star path (`maxEdges = 0`): the lake-scale plan,
    * hash-checked against the SAME recursive-CTE oracle.
    */
  private val dedupClustersDist = CatalogEntry(
    "dedup_clusters_dist",
    (s, dir) => Dedup.nearDupClusters(QuerySupport.table(s, dir, "documents"),
        maxEdges = 0L)
      .orderBy("doc_id"),
    Some(clustersOracle))

  /** Canonical selection per cluster: composes the clustering chain
    * with the text_quality chain — both already hash-checked alone —
    * and ranks members by the identical double arithmetic, so the
    * canonical flags replay engine-exactly (equal scores tie to the
    * smallest doc_id on both engines).
    */
  private val selectCanonicalOracle: String =
    s"""WITH RECURSIVE $clustersCtes,
            |cl AS (SELECT d.doc_id, coalesce(r.root_id, d.doc_id) AS root_id
            |       FROM documents d LEFT JOIN roots r USING (doc_id)),
            |qw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
            |qm AS (SELECT doc_id, len(w) AS n_tokens, len(list_distinct(w)) AS n_distinct,
            |         len(list_filter(w, t -> t IN ${inList(stopwords)})) AS n_stop FROM qw),
            |q AS (SELECT doc_id,
            |        0.4 * (n_distinct / n_tokens) + 0.3 * (1.0 - n_stop / n_tokens)
            |          + 0.3 * least(1.0, n_tokens / 50.0) AS quality
            |      FROM qm),
            |jq AS (SELECT cl.doc_id, cl.root_id, q.quality,
            |         row_number() OVER (PARTITION BY cl.root_id
            |                            ORDER BY q.quality DESC, cl.doc_id) AS rnk,
            |         count(*) OVER (PARTITION BY cl.root_id) AS n_members
            |       FROM cl JOIN q USING (doc_id))
            |SELECT doc_id, root_id, ${r6s("quality")} AS quality,
            |  CAST(n_members AS BIGINT) AS n_members,
            |  CAST(CASE WHEN rnk = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_canonical
            |FROM jq ORDER BY doc_id""".stripMargin

  private def selectCanonicalQuery(
      variant: (org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
    (s, dir) => variant(QuerySupport.table(s, dir, "documents"))
      .select(col("doc_id"), col("root_id"), r6(col("quality")).as("quality"),
        col("n_members"), col("is_canonical"))
      .orderBy("doc_id")

  private val dedupSelectCanonical = CatalogEntry(
    "dedup_select_canonical",
    selectCanonicalQuery(d => Dedup.selectCanonical(d)),
    Some(selectCanonicalOracle))

  /** Same selection contract over the DISTRIBUTED clustering (label
    * propagation, `maxEdges = 0` — no driver-side edge collection):
    * the 100 TB spelling of canonical selection, hash-checked against
    * the SAME oracle because both clusterings label every component
    * with its minimum doc id (VERDICT r11 §wrong-1).
    */
  private val dedupSelectCanonicalDist = CatalogEntry(
    "dedup_select_canonical_dist",
    selectCanonicalQuery(Dedup.selectCanonicalDist(_)),
    Some(selectCanonicalOracle))

  /** Dedup impact on the source mixture: the canonical chain composed
    * with one source-grain rollup — before/after token shares and the
    * exact ppm shift dedup causes.
    */
  private val dedupMixtureImpact = CatalogEntry(
    "dedup_mixture_impact",
    (s, dir) => Dedup.mixtureImpact(
        QuerySupport.table(s, dir, "documents"))
      .orderBy("source"),
    Some(s"""WITH RECURSIVE $clustersCtes,
            |cl AS (SELECT d.doc_id, coalesce(r.root_id, d.doc_id) AS root_id
            |       FROM documents d LEFT JOIN roots r USING (doc_id)),
            |qw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
            |qm AS (SELECT doc_id, len(w) AS n_tokens, len(list_distinct(w)) AS n_distinct,
            |         len(list_filter(w, t -> t IN ${inList(stopwords)})) AS n_stop FROM qw),
            |q AS (SELECT doc_id,
            |        0.4 * (n_distinct / n_tokens) + 0.3 * (1.0 - n_stop / n_tokens)
            |          + 0.3 * least(1.0, n_tokens / 50.0) AS quality
            |      FROM qm),
            |jq AS (SELECT cl.doc_id, cl.root_id,
            |         row_number() OVER (PARTITION BY cl.root_id
            |                            ORDER BY q.quality DESC, cl.doc_id) AS rnk
            |       FROM cl JOIN q USING (doc_id)),
            |bs AS (SELECT d.source,
            |         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS t,
            |         CASE WHEN jq.rnk = 1 THEN 1 ELSE 0 END AS canon
            |       FROM documents d JOIN jq ON jq.doc_id = d.doc_id),
            |per AS (SELECT source,
            |          CAST(count(*) AS BIGINT) AS n_docs_before,
            |          CAST(sum(t) AS BIGINT) AS n_tokens_before,
            |          CAST(sum(canon) AS BIGINT) AS n_docs_after,
            |          CAST(sum(CASE WHEN canon = 1 THEN t ELSE 0 END) AS BIGINT)
            |            AS n_tokens_after
            |        FROM bs GROUP BY source),
            |tt AS (SELECT CAST(sum(n_tokens_before) AS BIGINT) AS tb,
            |         CAST(sum(n_tokens_after) AS BIGINT) AS ta FROM per)
            |SELECT source, n_docs_before, n_tokens_before, n_docs_after,
            |  n_tokens_after,
            |  n_tokens_before * 1000000 // greatest(tb, 1) AS share_before_ppm,
            |  n_tokens_after * 1000000 // greatest(ta, 1) AS share_after_ppm,
            |  n_tokens_after * 1000000 // greatest(ta, 1)
            |    - n_tokens_before * 1000000 // greatest(tb, 1) AS share_shift_ppm
            |FROM per CROSS JOIN tt ORDER BY source""".stripMargin))

  /** Dedup impact on quality: the canonical chain composed with a
    * per-source kept-vs-dropped mean-quality rollup — "is dedup
    * deleting my best data", exact micro means.
    */
  private val dedupQualityImpact = CatalogEntry(
    "dedup_quality_impact",
    (s, dir) => Dedup.qualityImpact(
      QuerySupport.table(s, dir, "documents")),
    Some(s"""WITH RECURSIVE $clustersCtes,
            |cl AS (SELECT d.doc_id, coalesce(r.root_id, d.doc_id) AS root_id
            |       FROM documents d LEFT JOIN roots r USING (doc_id)),
            |qw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
            |qm AS (SELECT doc_id, len(w) AS n_tokens, len(list_distinct(w)) AS n_distinct,
            |         len(list_filter(w, t -> t IN ${inList(stopwords)})) AS n_stop FROM qw),
            |q AS (SELECT doc_id,
            |        0.4 * (n_distinct / n_tokens) + 0.3 * (1.0 - n_stop / n_tokens)
            |          + 0.3 * least(1.0, n_tokens / 50.0) AS quality
            |      FROM qm),
            |jq AS (SELECT cl.doc_id, cl.root_id,
            |         row_number() OVER (PARTITION BY cl.root_id
            |                            ORDER BY q.quality DESC, cl.doc_id) AS rnk
            |       FROM cl JOIN q USING (doc_id)),
            |bs AS (SELECT d.source,
            |         CAST(floor(q.quality * 1000000.0 + 0.5) AS BIGINT) AS qmu,
            |         CASE WHEN jq.rnk = 1 THEN 1 ELSE 0 END AS canon
            |       FROM documents d JOIN jq ON jq.doc_id = d.doc_id
            |       JOIN q ON q.doc_id = d.doc_id),
            |per AS (SELECT source,
            |          CAST(sum(canon) AS BIGINT) AS n_kept,
            |          CAST(sum(1 - canon) AS BIGINT) AS n_dropped,
            |          CAST(sum(CASE WHEN canon = 1 THEN qmu ELSE 0 END) AS BIGINT) AS qk,
            |          CAST(sum(CASE WHEN canon = 0 THEN qmu ELSE 0 END) AS BIGINT) AS qd
            |        FROM bs GROUP BY source)
            |SELECT source, n_kept, n_dropped,
            |  qk // greatest(n_kept, 1) AS mean_kept_micro,
            |  qd // greatest(n_dropped, 1) AS mean_dropped_micro,
            |  qk // greatest(n_kept, 1) - qd // greatest(n_dropped, 1)
            |    AS delta_micro
            |FROM per ORDER BY source""".stripMargin))

  /** Cluster-keyed split: the clustering is the already-oracled chain;
    * the assignment adds one md5-threshold projection on the root id,
    * replayed with the same substr/lexicographic-compare arithmetic as
    * the sampling oracles.
    */
  private val splitLeakageFree = CatalogEntry(
    "split_leakage_free",
    (s, dir) => Sampling.leakageFreeSplit(
        Dedup.nearDupClusters(QuerySupport.table(s, dir, "documents")),
        holdoutFraction = 0.2)
      .orderBy("doc_id"),
    Some(s"""WITH RECURSIVE $clustersCtes,
            |cl AS (SELECT d.doc_id, coalesce(r.root_id, d.doc_id) AS root_id
            |       FROM documents d LEFT JOIN roots r USING (doc_id))
            |SELECT doc_id, root_id,
            |  CASE WHEN substr(md5('split:' || CAST(root_id AS VARCHAR)), 1, 8)
            |            < '${Sampling.hexThreshold(0.2)}'
            |       THEN 'holdout' ELSE 'train' END AS split
            |FROM cl ORDER BY doc_id""".stripMargin))

  /** Content-keyed k-fold balance report: the oracle replays the
    * salted-digest fold pick and the per-fold doc/content/token
    * counts; share_ppm is exact integer division.
    */
  private val splitKfold = CatalogEntry(
    "split_kfold",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents")
      // inject duplicates (1 in 5) so the same-fold rule has work to do
      val corpus = d.select("doc_id", "text")
        .union(d.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      Sampling.kfoldAssign(corpus, k = 5)
        .groupBy("fold")
        .agg(count(lit(1)).as("n_docs"),
          count_distinct(md5(col("text"))).as("n_contents"),
          sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
        .crossJoin(broadcast(
          corpus.agg(count(lit(1)).as("__total"))))
        .withColumn("share_ppm", expr("n_docs * 1000000 div __total"))
        .select("fold", "n_docs", "n_contents", "n_tokens", "share_ppm")
        .orderBy("fold")
    },
    Some {
      val hv = hexDecode4("fh", posFn = "strpos", substrFn = "substr")
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
         |  WHERE doc_id % 5 = 0),
         |f AS (SELECT doc_id, text, md5('fold:' || md5(text)) AS fh FROM corpus),
         |a AS (SELECT doc_id, text, ($hv) % 5 AS fold FROM f),
         |t AS (SELECT fold, CAST(count(*) AS BIGINT) AS n_docs,
         |        CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_contents,
         |        CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
         |      FROM a GROUP BY fold),
         |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM t)
         |SELECT CAST(fold AS BIGINT) AS fold, n_docs, n_contents, n_tokens,
         |  n_docs * 1000000 // total AS share_ppm
         |FROM t CROSS JOIN tot ORDER BY fold""".stripMargin
    })

  /** Temporal split with a one-day embargo over the event stream:
    * integer train cut + embargo horizon replay exactly in both
    * engines.
    */
  private val splitTemporalEmbargo = CatalogEntry(
    "split_temporal_embargo",
    (s, dir) => {
      val raw = QuerySupport.table(s, dir, "events")
      Sampling.temporalSplitEmbargo(
          raw.select(col("user_id"), col("event_id"),
            QuerySupport.tsMicros(raw).as("t_us")),
          keyCol = "user_id", timeCol = "t_us", tieCol = "event_id",
          trainPpm = 700000L, embargo = 86400000000L)
        .orderBy("user_id", "t_us", "event_id")
    },
    Some("""WITH e AS (
           |  SELECT user_id, epoch_us(ts) AS t_us, event_id FROM events),
           |r AS (SELECT *,
           |        row_number() OVER (PARTITION BY user_id
           |                           ORDER BY t_us, event_id) AS rn,
           |        count(*) OVER (PARTITION BY user_id) AS n
           |      FROM e),
           |c AS (SELECT *, greatest(1, n * 700000 // 1000000) AS cut FROM r),
           |m AS (SELECT *, max(CASE WHEN rn <= cut THEN t_us END)
           |               OVER (PARTITION BY user_id) AS tmax
           |      FROM c)
           |SELECT user_id, t_us, event_id,
           |  CASE WHEN rn <= cut THEN 'train'
           |       WHEN t_us <= tmax + 86400000000 THEN 'embargo'
           |       ELSE 'test' END AS split
           |FROM m ORDER BY user_id, t_us, event_id""".stripMargin))

  /** Soft dedup over the oracled clustering chain: the u32 draw
    * replays as two [[hexDecode4]] half-words, the keep rule as the
    * same exact integer cross-product.
    */
  private val sampleClusterWeighted = CatalogEntry(
    "sample_cluster_weighted",
    (s, dir) => Sampling.clusterWeightedSample(
        Dedup.nearDupClusters(QuerySupport.table(s, dir, "documents")))
      .orderBy("doc_id"),
    Some {
      val md5s = "md5('softdedup:' || CAST(doc_id AS VARCHAR))"
      val hi = hexDecode4(s"substr($md5s, 1, 4)", posFn = "strpos", substrFn = "substr")
      val lo = hexDecode4(s"substr($md5s, 5, 4)", posFn = "strpos", substrFn = "substr")
      s"""WITH RECURSIVE $clustersCtes,
         |cl AS (SELECT d.doc_id, coalesce(r.root_id, d.doc_id) AS root_id
         |       FROM documents d LEFT JOIN roots r USING (doc_id)),
         |s AS (SELECT doc_id, root_id,
         |        count(*) OVER (PARTITION BY root_id) AS n_members,
         |        min(doc_id) OVER (PARTITION BY root_id) AS anchor
         |      FROM cl),
         |h AS (SELECT doc_id, root_id, n_members, anchor,
         |        ($hi) * 65536 + ($lo) AS hv
         |      FROM s)
         |SELECT doc_id, root_id, CAST(n_members AS BIGINT) AS n_members,
         |  (doc_id = anchor OR hv * n_members < 4294967296) AS keep
         |FROM h ORDER BY doc_id""".stripMargin
    })

  private val dedupSimhash = CatalogEntry(
    "dedup_simhash",
    (s, dir) => Dedup.simhash(QuerySupport.table(s, dir, "documents")).orderBy("doc_id"),
    Some {
      val hv = hexDecode4("h", posFn = "strpos", substrFn = "substr")
      val bitsSum = (0 until simhashBits).map { k =>
        val p = 1 << k
        s"(CASE WHEN list_sum(list_transform(tv, v -> CASE WHEN (v // $p) % 2 = 1 THEN 1 ELSE -1 END)) >= 0 THEN $p ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |tv AS (SELECT doc_id, list_transform(list_transform(list_distinct(w), t -> md5(t)), h -> $hv) AS tv FROM w),
         |s AS (SELECT doc_id, CAST($bitsSum AS BIGINT) AS simhash FROM tv)
         |SELECT doc_id, simhash, count(*) OVER (PARTITION BY simhash) AS n_bucket
         |FROM s ORDER BY doc_id""".stripMargin
    })

  /** Shared LSH-key CTE prefix for the embedding near-dup oracles:
    * `e` (double vectors), `n` (+norm), `k` (one (vec_id, tbl, bucket)
    * row per hash table).
    */
  private val embLshCtes: String = {
    def planeDot(j: Int): String = {
      val lit = latticeTerms(7777L, j).mkString(", ")
      s"list_sum(list_transform(range(1, len(v) + 1), i -> v[i] * ([$lit])[i]))"
    }
    val keySelects = (0 until lshTables).map { t =>
      val bucket = (0 until lshBits)
        .map(b => s"(CASE WHEN ${planeDot(t * lshBits + b)} >= 0 THEN ${1 << b} ELSE 0 END)")
        .mkString(" + ")
      s"SELECT vec_id, $t AS tbl, $bucket AS bucket FROM e"
    }.mkString("\n UNION ALL ")
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
       |k AS ($keySelects)""".stripMargin
  }

  private val dedupEmbedding = CatalogEntry(
    "dedup_embedding_cosine",
    (s, dir) => {
      val d = AnnSearch.embeddingNearDups(QuerySupport.table(s, dir, "embeddings"))
      d.select(col("vec_a"), col("vec_b"), r6(col("cos")).as("cosine"))
        .orderBy("vec_a", "vec_b")
    },
    Some(s"""WITH $embLshCtes,
            |cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
            |         FROM k a JOIN k b ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
            |c AS (SELECT cand.vec_a, cand.vec_b,
            |        list_sum(list_transform(range(1, len(x.v) + 1), i -> x.v[i] * y.v[i])) / (x.nrm * y.nrm) AS cos
            |      FROM cand JOIN n x ON x.vec_id = cand.vec_a JOIN n y ON y.vec_id = cand.vec_b)
            |SELECT vec_a, vec_b, ${r6s("cos")} AS cosine FROM c
            |WHERE cos >= $embDupThreshold ORDER BY vec_a, vec_b""".stripMargin))

  /** Cross-corpus embedding near-dups: new keys join reference keys
    * only — the reference side never self-pairs.
    */
  private val dedupEmbeddingCross = CatalogEntry(
    "dedup_embedding_cross",
    (s, dir) => {
      val emb = QuerySupport.table(s, dir, "embeddings")
      val d = AnnSearch.crossCorpusEmbeddingDups(
        emb.filter(col("vec_id") % 3 === 0), emb.filter(col("vec_id") % 3 =!= 0))
      d.select(col("new_id"), col("ref_id"), r6(col("cos")).as("cosine"))
        .orderBy("new_id", "ref_id")
    },
    Some(s"""WITH $embLshCtes,
            |cand AS (SELECT DISTINCT a.vec_id AS new_id, b.vec_id AS ref_id
            |         FROM k a JOIN k b ON a.tbl = b.tbl AND a.bucket = b.bucket
            |         WHERE a.vec_id % 3 = 0 AND b.vec_id % 3 <> 0),
            |c AS (SELECT cand.new_id, cand.ref_id,
            |        list_sum(list_transform(range(1, len(x.v) + 1), i -> x.v[i] * y.v[i])) / (x.nrm * y.nrm) AS cos
            |      FROM cand JOIN n x ON x.vec_id = cand.new_id JOIN n y ON y.vec_id = cand.ref_id)
            |SELECT new_id, ref_id, ${r6s("cos")} AS cosine FROM c
            |WHERE cos >= $embDupThreshold ORDER BY new_id, ref_id""".stripMargin))

  /** Hot-bucket capped embedding near-dups: buckets above the cap
    * (20 — sized so sf0.01's ~12-member average buckets split both
    * ways) star-expand to their min-id representative instead of
    * self-joining; both branches hash-checked against a DuckDB oracle
    * replicating the star semantics, the `dedup_lsh_capped` contract
    * in embedding space.
    */
  private val dedupEmbeddingCapped = CatalogEntry(
    "dedup_embedding_capped",
    (s, dir) => {
      val d = AnnSearch.embeddingNearDupsCapped(
        QuerySupport.table(s, dir, "embeddings"), maxBucket = 20)
      d.select(col("vec_a"), col("vec_b"), r6(col("cos")).as("cosine"))
        .orderBy("vec_a", "vec_b")
    },
    Some(s"""WITH $embLshCtes,
            |stats AS (SELECT tbl, bucket, count(*) AS cnt, min(vec_id) AS rep
            |          FROM k GROUP BY 1, 2),
            |kb AS (SELECT k.vec_id, k.tbl, k.bucket, s.cnt, s.rep
            |       FROM k JOIN stats s USING (tbl, bucket)),
            |cand AS (
            |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
            |  FROM kb a JOIN kb b
            |    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
            |  WHERE a.cnt <= 20
            |  UNION
            |  SELECT rep AS vec_a, vec_id AS vec_b FROM kb
            |  WHERE cnt > 20 AND vec_id <> rep),
            |c AS (SELECT cand.vec_a, cand.vec_b,
            |        list_sum(list_transform(range(1, len(x.v) + 1), i -> x.v[i] * y.v[i])) / (x.nrm * y.nrm) AS cos
            |      FROM cand JOIN n x ON x.vec_id = cand.vec_a JOIN n y ON y.vec_id = cand.vec_b)
            |SELECT vec_a, vec_b, ${r6s("cos")} AS cosine FROM c
            |WHERE cos >= $embDupThreshold ORDER BY vec_a, vec_b""".stripMargin))

  /** Passage-duplication stats (Lee et al. style window granularity):
    * 20-token passages, dup = exact text occurring more than once
    * corpus-wide.
    */
  private val dedupPassageStats = CatalogEntry(
    "dedup_passage_stats",
    (s, dir) => Dedup.passageDupStats(
        QuerySupport.table(s, dir, "documents").select("doc_id", "text"))
      .select(col("doc_id"), col("n_passages"), col("n_dup_passages"),
        r6(col("dup_passage_frac")).as("dup_passage_frac"))
      .orderBy("doc_id"),
    Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           |p AS (SELECT doc_id,
           |        unnest(list_transform(range(1, CAST(ceil(len(w) / 20.0) AS BIGINT) + 1),
           |               i -> array_to_string(list_slice(w, (i - 1) * 20 + 1, i * 20), ' '))) AS passage
           |      FROM w),
           |c AS (SELECT passage, count(*) AS cnt FROM p GROUP BY passage),
           |a AS (SELECT doc_id, count(*) AS n_passages,
           |        sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS n_dup
           |      FROM p JOIN c USING (passage) GROUP BY doc_id)
           |SELECT doc_id, CAST(n_passages AS BIGINT) AS n_passages,
           |  CAST(n_dup AS BIGINT) AS n_dup_passages,
           |  """.stripMargin + r6s("CAST(n_dup AS DOUBLE) / n_passages") +
      """ AS dup_passage_frac
        |FROM a ORDER BY doc_id""".stripMargin))

  /** Passage-level dedup with reassembly: only the first corpus-wide
    * occurrence of each 20-token passage survives; documents are
    * rebuilt from their surviving passages in order. Exact duplicates
    * are injected (every 6th doc) so whole documents get hollowed out
    * and the empty-string edge is exercised. The injected ids are
    * offset by `max(doc_id) + 1` (one-row scalar aggregate on both
    * engines) so they can never collide with genuine ids at any scale
    * factor, while still sorting AFTER every original — the originals
    * stay the first occurrence (advisor r6: a fixed +1e6 offset
    * collides once a SF produces >= 1M documents).
    */
  private val dedupSegments = CatalogEntry(
    "dedup_segments",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents").select("doc_id", "text")
      val off = d.agg(max("doc_id")).head.getLong(0) + 1L
      val corpus = d.union(d.filter(col("doc_id") % 6 === 0)
        .select((col("doc_id") + off).as("doc_id"), col("text")))
      Dedup.dedupPassages(corpus).orderBy("doc_id")
    },
    Some("""WITH corpus AS (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents) AS doc_id, text
           |  FROM documents WHERE doc_id % 6 = 0),
           |w AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
           |p AS (SELECT doc_id,
           |        unnest(range(1, CAST(ceil(len(w) / 20.0) AS BIGINT) + 1)) AS idx,
           |        unnest(list_transform(range(1, CAST(ceil(len(w) / 20.0) AS BIGINT) + 1),
           |               i -> array_to_string(list_slice(w, (i - 1) * 20 + 1, i * 20), ' '))) AS passage
           |      FROM w),
           |r AS (SELECT doc_id, idx, passage,
           |        row_number() OVER (PARTITION BY passage ORDER BY doc_id, idx) AS rn
           |      FROM p)
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_passages,
           |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           |  coalesce(string_agg(CASE WHEN rn = 1 THEN passage END, ' ' ORDER BY idx), '') AS text_dedup
           |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  /** Multi-grain passage dedup: 20-token tiling plus 50-token windows
    * at stride 25, dup masks unioned into one per-doc token keep-mask.
    * Duplicate documents are injected (every 6th, same spelling as
    * dedup_segments) so both grains flag real regions. The oracle
    * replays each grain's window construction (0-based window index,
    * clamped slice), counts window text corpus-wide, explodes only dup
    * windows to token ranges, and unions the masks.
    */
  private val dedupPassageMulti = CatalogEntry(
    "dedup_passage_multi",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents").select("doc_id", "text")
      val off = d.agg(max("doc_id")).head.getLong(0) + 1L
      val corpus = d.union(d.filter(col("doc_id") % 6 === 0)
        .select((col("doc_id") + off).as("doc_id"), col("text")))
      Dedup.passageDupMulti(corpus)
        .select(col("doc_id"), col("n_tokens"), col("n_dup_tokens"),
          r6(col("dup_token_frac")).as("dup_token_frac"))
        .orderBy("doc_id")
    },
    Some {
      def grain(tag: String, w: Int, stride: Int): String =
        s"""i$tag AS (SELECT doc_id, w.w AS toks,
           |        unnest(range(0, GREATEST(CAST(ceil((len(w.w) - $w) / CAST($stride AS DOUBLE)) AS BIGINT), 0) + 1)) AS i
           |      FROM w),
           |g$tag AS (SELECT doc_id, i * $stride + 1 AS s,
           |        LEAST(i * $stride + $w, len(toks)) AS e,
           |        array_to_string(list_slice(toks, i * $stride + 1, i * $stride + $w), ' ') AS txt
           |      FROM i$tag),
           |c$tag AS (SELECT txt, count(*) AS cnt FROM g$tag GROUP BY txt),
           |m$tag AS (SELECT doc_id, unnest(range(s, e + 1)) AS tok
           |      FROM g$tag JOIN c$tag USING (txt) WHERE cnt > 1)""".stripMargin
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents) AS doc_id, text
         |  FROM documents WHERE doc_id % 6 = 0),
         |w AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
         |${grain("1", 20, 20)},
         |${grain("2", 50, 25)},
         |m AS (SELECT DISTINCT doc_id, tok FROM
         |        (SELECT * FROM m1 UNION ALL SELECT * FROM m2)),
         |dd AS (SELECT doc_id, count(*) AS nd FROM m GROUP BY doc_id),
         |n AS (SELECT doc_id, len(w) AS nt FROM w)
         |SELECT n.doc_id, CAST(nt AS BIGINT) AS n_tokens,
         |  CAST(COALESCE(nd, 0) AS BIGINT) AS n_dup_tokens,
         |  ${r6s("CASE WHEN nt > 0 THEN CAST(COALESCE(nd, 0) AS DOUBLE) / nt ELSE 0.0 END")} AS dup_token_frac
         |FROM n LEFT JOIN dd USING (doc_id) ORDER BY n.doc_id""".stripMargin
    })

  /** Incremental-crawl dedup: the corpus is split into a reference set
    * (doc_id % 3 <> 0, "the training set") and a new set (the rest,
    * "today's crawl"); new docs are LSH-candidate-joined against the
    * reference bands only — the reference is never self-paired — then
    * exact-Jaccard verified.
    */
  private val dedupCrossCorpus = CatalogEntry(
    "dedup_cross_corpus",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents").select("doc_id", "text")
      val fresh = Dedup.sketch(d.filter(col("doc_id") % 3 === 0))
      val ref = Dedup.sketch(d.filter(col("doc_id") % 3 =!= 0))
      Dedup.crossCorpusNearDups(fresh, ref)
        .select(col("new_id"), col("ref_id"), r6(col("jaccard")).as("jaccard"))
        .orderBy("new_id", "ref_id")
    },
    Some(s"""WITH newc AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
            |refc AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
            |${minhashBandCtes("newc", "_n")},
            |${minhashBandCtes("refc", "_r")},
            |cand AS (SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS ref_id
            |         FROM bands_n a JOIN bands_r b ON a.band = b.band AND a.key = b.key),
            |dsn AS (SELECT doc_id, list_distinct(sh_n) AS s FROM sh_n),
            |dsr AS (SELECT doc_id, list_distinct(sh_r) AS s FROM sh_r),
            |j AS (SELECT c.new_id, c.ref_id,
            |        len(list_intersect(a.s, b.s)) AS inter, len(a.s) AS la, len(b.s) AS lb
            |      FROM cand c JOIN dsn a ON a.doc_id = c.new_id JOIN dsr b ON b.doc_id = c.ref_id)
            |SELECT new_id, ref_id, ${r6s("CAST(inter AS DOUBLE) / (la + lb - inter)")} AS jaccard
            |FROM j WHERE CAST(inter AS DOUBLE) / (la + lb - inter) >= $jaccardThreshold
            |ORDER BY new_id, ref_id""".stripMargin))

  /** Incremental at-ingest assignment: every incoming doc attaches to
    * its best reference partner (exact micro-Jaccard, ref-id
    * tiebreak) or is declared new; the oracle replays the band join,
    * the integer gate, and the rank-1 cut.
    */
  private val dedupIncrementalAssign = CatalogEntry(
    "dedup_incremental_assign",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents").select("doc_id", "text")
      Dedup.incrementalAssign(
          d.filter(col("doc_id") % 3 === 0), d.filter(col("doc_id") % 3 =!= 0))
        .orderBy("new_id")
    },
    Some {
      val tm = (jaccardThreshold * 1000000).toLong
      s"""WITH newc AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
         |refc AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
         |${minhashBandCtes("newc", "_n")},
         |${minhashBandCtes("refc", "_r")},
         |cand AS (SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS ref_id
         |         FROM bands_n a JOIN bands_r b ON a.band = b.band AND a.key = b.key),
         |dsn AS (SELECT doc_id, list_distinct(sh_n) AS s FROM sh_n),
         |dsr AS (SELECT doc_id, list_distinct(sh_r) AS s FROM sh_r),
         |j AS (SELECT c.new_id, c.ref_id,
         |        CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter,
         |        CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))
         |          AS BIGINT) AS uni
         |      FROM cand c JOIN dsn a ON a.doc_id = c.new_id
         |      JOIN dsr b ON b.doc_id = c.ref_id),
         |sc AS (SELECT new_id, ref_id,
         |         inter * 1000000 // greatest(uni, 1) AS jaccard_micro
         |       FROM j WHERE inter * 1000000 // greatest(uni, 1) >= $tm),
         |bst AS (SELECT new_id, ref_id, jaccard_micro FROM (
         |          SELECT *, row_number() OVER (PARTITION BY new_id
         |            ORDER BY jaccard_micro DESC, ref_id) AS rk FROM sc)
         |        WHERE rk = 1)
         |SELECT n.doc_id AS new_id, b.ref_id, b.jaccard_micro,
         |  b.ref_id IS NULL AS is_new
         |FROM newc n LEFT JOIN bst b ON b.new_id = n.doc_id
         |ORDER BY new_id""".stripMargin
    })

  /** Hot-bucket truncation CTE for the capped cross-corpus oracles:
    * keeps the `cap` lowest doc_ids per (band, key) of `src`.
    */
  private def cappedBandCte(src: String, out: String, cap: Int): String =
    s"""$out AS (SELECT band, key, doc_id FROM (
       |    SELECT band, key, doc_id,
       |      row_number() OVER (PARTITION BY band, key ORDER BY doc_id) AS rk
       |    FROM $src) WHERE rk <= $cap)""".stripMargin

  private val crossCap = 20

  /** PRODUCTION spelling of [[dedupCrossCorpus]]: per-(band, key)
    * occupancy capped at [[crossCap]] lowest ids PER SIDE — the
    * uncapped band join pairs n_new × n_ref per bucket, which on a
    * boilerplate corpus (stock phrases → hot band keys) is the
    * rehearsal-measured OOM at zipf10; a true near-dup pair shares
    * many bands, so truncating one hot band rarely loses it (the
    * dedup_containment_tight contract, cross-corpus).
    */
  private val dedupCrossCorpusCapped = CatalogEntry(
    "dedup_cross_corpus_capped",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents").select("doc_id", "text")
      val fresh = Dedup.sketch(d.filter(col("doc_id") % 3 === 0))
      val ref = Dedup.sketch(d.filter(col("doc_id") % 3 =!= 0))
      Dedup.crossCorpusNearDups(fresh, ref, maxBucket = crossCap)
        .select(col("new_id"), col("ref_id"), r6(col("jaccard")).as("jaccard"))
        .orderBy("new_id", "ref_id")
    },
    Some(s"""WITH newc AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
            |refc AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
            |${minhashBandCtes("newc", "_n")},
            |${minhashBandCtes("refc", "_r")},
            |${cappedBandCte("bands_n", "bandc_n", crossCap)},
            |${cappedBandCte("bands_r", "bandc_r", crossCap)},
            |cand AS (SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS ref_id
            |         FROM bandc_n a JOIN bandc_r b ON a.band = b.band AND a.key = b.key),
            |dsn AS (SELECT doc_id, list_distinct(sh_n) AS s FROM sh_n),
            |dsr AS (SELECT doc_id, list_distinct(sh_r) AS s FROM sh_r),
            |j AS (SELECT c.new_id, c.ref_id,
            |        len(list_intersect(a.s, b.s)) AS inter, len(a.s) AS la, len(b.s) AS lb
            |      FROM cand c JOIN dsn a ON a.doc_id = c.new_id JOIN dsr b ON b.doc_id = c.ref_id)
            |SELECT new_id, ref_id, ${r6s("CAST(inter AS DOUBLE) / (la + lb - inter)")} AS jaccard
            |FROM j WHERE CAST(inter AS DOUBLE) / (la + lb - inter) >= $jaccardThreshold
            |ORDER BY new_id, ref_id""".stripMargin))

  /** PRODUCTION spelling of [[dedupIncrementalAssign]] with the same
    * per-side hot-bucket cap; the top-1 cut and the integer gate are
    * identical.
    */
  private val dedupIncrementalAssignCapped = CatalogEntry(
    "dedup_incremental_assign_capped",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents").select("doc_id", "text")
      Dedup.incrementalAssign(
          d.filter(col("doc_id") % 3 === 0), d.filter(col("doc_id") % 3 =!= 0),
          maxBucket = crossCap)
        .orderBy("new_id")
    },
    Some {
      val tm = (jaccardThreshold * 1000000).toLong
      s"""WITH newc AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
         |refc AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
         |${minhashBandCtes("newc", "_n")},
         |${minhashBandCtes("refc", "_r")},
         |${cappedBandCte("bands_n", "bandc_n", crossCap)},
         |${cappedBandCte("bands_r", "bandc_r", crossCap)},
         |cand AS (SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS ref_id
         |         FROM bandc_n a JOIN bandc_r b ON a.band = b.band AND a.key = b.key),
         |dsn AS (SELECT doc_id, list_distinct(sh_n) AS s FROM sh_n),
         |dsr AS (SELECT doc_id, list_distinct(sh_r) AS s FROM sh_r),
         |j AS (SELECT c.new_id, c.ref_id,
         |        CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter,
         |        CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))
         |          AS BIGINT) AS uni
         |      FROM cand c JOIN dsn a ON a.doc_id = c.new_id
         |      JOIN dsr b ON b.doc_id = c.ref_id),
         |sc AS (SELECT new_id, ref_id,
         |         inter * 1000000 // greatest(uni, 1) AS jaccard_micro
         |       FROM j WHERE inter * 1000000 // greatest(uni, 1) >= $tm),
         |bst AS (SELECT new_id, ref_id, jaccard_micro FROM (
         |          SELECT *, row_number() OVER (PARTITION BY new_id
         |            ORDER BY jaccard_micro DESC, ref_id) AS rk FROM sc)
         |        WHERE rk = 1)
         |SELECT n.doc_id AS new_id, b.ref_id, b.jaccard_micro,
         |  b.ref_id IS NULL AS is_new
         |FROM newc n LEFT JOIN bst b ON b.new_id = n.doc_id
         |ORDER BY new_id""".stripMargin
    })

  /** Bloom-prefiltered exact cross-corpus matching on a head
    * fingerprint (first 3 tokens). The Bloom pass only prunes — false
    * positives die in the exact semi-join, false negatives cannot
    * exist — so the oracle is the plain `IN` subquery.
    */
  private val dedupBloomPrefilter = CatalogEntry(
    "dedup_bloom_prefilter",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents")
        .select(col("doc_id"),
          expr("concat_ws(' ', slice(split(text, ' '), 1, 3))").as("head"))
      Dedup.bloomPrefilteredMatches(
        d.filter(col("doc_id") % 3 === 0), d.filter(col("doc_id") % 3 =!= 0), "head")
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id,
           |  array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ') AS head
           |  FROM documents)
           |SELECT doc_id, head FROM d WHERE doc_id % 3 = 0
           |  AND head IN (SELECT head FROM d WHERE doc_id % 3 <> 0)
           |ORDER BY doc_id""".stripMargin))

  /** Tokenizer-vocabulary coverage: top-20 corpus vocabulary (count
    * desc, token tie-break), per-doc OOV counts against it.
    */
  private val textVocabCoverage = CatalogEntry(
    "text_vocab_coverage",
    (s, dir) => TextAnalysis.vocabCoverage(
        QuerySupport.table(s, dir, "documents"), vocabSize = 20)
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        r6(col("oov_rate")).as("oov_rate"))
      .orderBy("doc_id"),
    Some("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
           |v AS (SELECT token FROM (
           |        SELECT token, count(*) AS c FROM t GROUP BY token
           |        ORDER BY c DESC, token LIMIT 20)),
           |a AS (SELECT t.doc_id, count(*) AS n_tokens,
           |        sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS n_oov
           |      FROM t LEFT JOIN v ON t.token = v.token GROUP BY t.doc_id)
           |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           |  CAST(n_oov AS BIGINT) AS n_oov,
           |  """.stripMargin + r6s("CAST(n_oov AS DOUBLE) / n_tokens") +
      """ AS oov_rate
        |FROM a ORDER BY doc_id""".stripMargin))

  private val embLabelStats = CatalogEntry(
    "emb_label_stats",
    (s, dir) => {
      val v = AnnSearch.vectors(QuerySupport.table(s, dir, "embeddings"))
        .join(QuerySupport.table(s, dir, "embeddings").select("vec_id", "label"), "vec_id")
      v.groupBy("label")
        .agg(count(lit(1)).as("n"),
          r6(avg(col("nrm"))).as("avg_norm"),
          r6(avg(expr("element_at(v, 1)"))).as("avg_c1"))
        .orderBy("label")
    },
    Some(s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
            |n AS (SELECT label, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm, v[1] AS c1 FROM e)
            |SELECT label, count(*) AS n, ${r6s("avg(nrm)")} AS avg_norm, ${r6s("avg(c1)")} AS avg_c1
            |FROM n GROUP BY label ORDER BY label""".stripMargin))

  /** Per-label centroid drift: exact integer squared L2 between each
    * label centroid and the corpus centroid in the 1e6-quantized
    * space. The oracle sign-splits DuckDB's flooring `//` to match
    * Spark's truncating `div` on possibly-negative sums.
    */
  private val embLabelDrift = CatalogEntry(
    "emb_label_drift",
    (s, dir) => EmbeddingOps.labelCentroidDrift(
        QuerySupport.table(s, dir, "embeddings"))
      .orderBy("label"),
    Some(s"""WITH e AS (SELECT label, list_transform(embedding::DOUBLE[],
            |            x -> CAST(floor(x * 1000000) AS BIGINT)) AS vi FROM embeddings),
            |x AS (SELECT label, t.i AS d, vi[t.i] AS x FROM e, range(1, ${embDim + 1}) t(i)),
            |pl AS (SELECT label, d, sum(x) AS sx, count(*) AS n FROM x GROUP BY 1, 2),
            |g AS (SELECT d, sum(sx) AS gx, sum(n) AS gn FROM pl GROUP BY d),
            |c AS (SELECT pl.label, pl.n,
            |        CASE WHEN sx < 0 THEN -((-sx) // n) ELSE sx // n END
            |        - CASE WHEN gx < 0 THEN -((-gx) // gn) ELSE gx // gn END AS dd
            |      FROM pl JOIN g USING (d))
            |SELECT label, CAST(max(n) AS BIGINT) AS n_vecs,
            |  CAST(sum(dd * dd) AS BIGINT) AS drift_sq
            |FROM c GROUP BY label ORDER BY label""".stripMargin))

  /** Symmetric int8 embedding quantization + L∞ reconstruction audit;
    * codes rendered as CSV so the byte-exact code stream is
    * hash-compared, not just summary stats.
    */
  private val embQuantizeInt8 = CatalogEntry(
    "emb_quantize_int8",
    (s, dir) => EmbeddingOps.quantizeInt8(QuerySupport.table(s, dir, "embeddings"))
      .select(col("vec_id"), r6(col("scale")).as("scale"), col("q_csv"),
        r6(col("max_abs_err")).as("max_abs_err"))
      .orderBy("vec_id"),
    Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            |sc AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS scale FROM e),
            |q AS (SELECT vec_id, v, scale,
            |        list_transform(v, x -> CAST(CASE WHEN scale = 0.0 THEN 0.0
            |          ELSE floor(x * 127.0 / scale + 0.5) END AS BIGINT)) AS q
            |      FROM sc)
            |SELECT vec_id, ${r6s("scale")} AS scale,
            |       array_to_string(q, ',') AS q_csv,
            |       ${r6s("""list_max(list_transform(range(1, len(q) + 1),
            |         i -> abs(CAST(q[i] AS DOUBLE) * scale / 127.0 - v[i])))""")} AS max_abs_err
            |FROM q ORDER BY vec_id""".stripMargin))

  /** Top-component projection: the oracle unrolls the same power
    * iteration as order-free exact-integer CTEs — Gram via a
    * range-cross-product aggregate, the data-derived pre-scale
    * divisor, and per-iteration renorm with the truncating division
    * spelled as a sign-split around `//` (DuckDB floors, the Scala
    * driver truncates).
    */
  /** Shared power-iteration CTE chain (8 iterations, ends at `w8` =
    * the learned milli-unit direction; `e` carries the 1e6-quantized
    * vectors). Used by the projection entry and the outlier screen.
    */
  /** The shared power-iteration chain: e -> Gram -> pre-scale ->
    * w0..w<iters> (the top direction lands in w<iters>). */
  private def powerChainCtes(dim: Int, iters: Int): String = {
    val sb = new StringBuilder
    // `ex` (the exploded (vec_id, dim, value) frame) and the Gram are
    // pinned AS MATERIALIZED: DuckDB inlines plain CTEs at every
    // reference, and `gs` is read by all `iters` iteration frames —
    // un-pinned, the Gram was recomputed per iteration, and the
    // original per-row `vi[t1.i] * vi[t2.i]` double list-extract
    // spelling made each recompute ~35 s at sf0.01 (288 s for the
    // outlier entry alone — the round-15 driver-compare breaker). The
    // self-join over `ex` computes the identical integer sums
    // (BIGINT, order-independent) in ~2 s.
    sb.append(
      s"""e AS (SELECT vec_id, list_transform(embedding::DOUBLE[], x -> CAST(floor(x * 1000000) AS BIGINT)) AS vi FROM embeddings),
         |ex AS MATERIALIZED (SELECT vec_id, t.i AS i, vi[t.i] AS x FROM e, range(1, ${dim + 1}) t(i)),
         |g AS MATERIALIZED (SELECT a.i AS i, b.i AS j, SUM(a.x * b.x) AS g
         |      FROM ex a JOIN ex b USING (vec_id) GROUP BY 1, 2),
         |dv AS (SELECT (max(abs(g)) // 100000000000) + 1 AS d FROM g),
         |gs AS MATERIALIZED (SELECT i, j, CASE WHEN g < 0 THEN -((-g) // d) ELSE g // d END AS v FROM g, dv),
         |w0 AS (SELECT i, (i * 37 + 11) % 2001 - 1000 AS w FROM range(1, ${dim + 1}) t(i))""".stripMargin)
    // Each w$k is pinned too: m$k and w$k both read r$k, so an
    // un-pinned chain doubles at every level — 2^iters re-inlines of
    // the whole upstream (the 10-90 s tails that remained after the
    // Gram fix). A w$k frame is `dim` rows; materializing is free.
    for (k <- 1 to iters) {
      sb.append(
        s""",
           |r$k AS MATERIALIZED (SELECT g.i AS i, SUM(g.v * w.w) AS raw FROM gs g JOIN w${k - 1} w ON w.i = g.j GROUP BY g.i),
           |m$k AS (SELECT greatest(max(abs(raw)), 1) AS m FROM r$k),
           |w$k AS MATERIALIZED (SELECT i, CASE WHEN raw < 0 THEN -((-raw) * 1000 // m) ELSE raw * 1000 // m END AS w FROM r$k, m$k)""".stripMargin)
    }
    sb.toString
  }

  private lazy val topComponentCtes: String =
    powerChainCtes(embDim, 8) +
      s""",
         |pj AS MATERIALIZED (SELECT ex.vec_id, CAST(SUM(ex.x * w.w) AS BIGINT) AS proj_milli
         |       FROM ex JOIN w8 w ON w.i = ex.i GROUP BY ex.vec_id)""".stripMargin

  /** [[topComponentCtes]] extended with the deflated second direction
    * (renormalize-then-orthogonalize each iteration, truncating
    * division sign-split exactly as the Scala driver math). The
    * deflation re-reads `w$iters` and each iteration's frames several
    * times, and DuckDB INLINES repeated CTE references — the
    * expansion is exponential in iteration depth (the first cut
    * exhausted file handles re-opening the parquet) — so the shared
    * frames are pinned AS MATERIALIZED. */
  private lazy val pca2Ctes: String = {
    val dim = embDim
    val iters = 8
    val sb = new StringBuilder(powerChainCtes(dim, iters))
    sb.append(
      s""",
         |w1f AS MATERIALIZED (SELECT i, w FROM w$iters),
         |n1 AS MATERIALIZED (SELECT greatest(sum(w * w), 1) AS n FROM w1f),
         |v0 AS (SELECT i, (i * 53 + 17) % 2001 - 1000 AS w FROM range(1, ${dim + 1}) t(i))""".stripMargin)
    for (k <- 1 to iters) {
      sb.append(
        s""",
           |ra$k AS MATERIALIZED (SELECT g.i AS i, SUM(g.v * w.w) AS raw FROM gs g JOIN v${k - 1} w ON w.i = g.j GROUP BY g.i),
           |ma$k AS (SELECT greatest(max(abs(raw)), 1) AS m FROM ra$k),
           |rp$k AS MATERIALIZED (SELECT i, CASE WHEN raw < 0 THEN -((-raw) * 1000 // m) ELSE raw * 1000 // m END AS r FROM ra$k, ma$k),
           |dd$k AS (SELECT SUM(rp.r * w1.w) AS d FROM rp$k rp JOIN w1f w1 ON w1.i = rp.i),
           |ss$k AS MATERIALIZED (SELECT rp.i, rp.r - (CASE WHEN d * w1.w < 0 THEN -((-(d * w1.w)) // n) ELSE (d * w1.w) // n END) AS s
           |         FROM rp$k rp JOIN w1f w1 ON w1.i = rp.i, dd$k, n1),
           |mb$k AS (SELECT greatest(max(abs(s)), 1) AS m FROM ss$k),
           |v$k AS MATERIALIZED (SELECT i, CASE WHEN s < 0 THEN -((-s) * 1000 // m) ELSE s * 1000 // m END AS w FROM ss$k, mb$k)""".stripMargin)
    }
    sb.append(
      s""",
         |pj AS (SELECT ex.vec_id, CAST(SUM(ex.x * w.w) AS BIGINT) AS proj_milli
         |       FROM ex JOIN w1f w ON w.i = ex.i GROUP BY ex.vec_id),
         |pj2 AS (SELECT ex.vec_id, CAST(SUM(ex.x * w.w) AS BIGINT) AS proj2_milli
         |        FROM ex JOIN v$iters w ON w.i = ex.i GROUP BY ex.vec_id)""".stripMargin)
    sb.toString
  }

  /** Exact-integer covariance matrix: the oracle replays the milli
    * quantization, the upper-triangle pair products, and the single
    * rounded division per cell.
    */
  private val embCovariance = CatalogEntry(
    "emb_covariance",
    (s, dir) => EmbeddingOps.covarianceMatrix(
        QuerySupport.table(s, dir, "embeddings"))
      .orderBy("dim_i", "dim_j"),
    Some("""WITH v AS (SELECT list_transform(embedding::DOUBLE[],
           |         x -> CAST(floor(x * 1000) AS BIGINT)) AS v FROM embeddings),
           |px AS (SELECT unnest(flatten(list_transform(range(0, len(v)), i ->
           |         list_transform(range(i, len(v)), j ->
           |           {'di': i, 'dj': j, 'p': v[i + 1] * v[j + 1]})))) AS e
           |       FROM v),
           |pp AS (SELECT e.di AS dim_i, e.dj AS dim_j,
           |         CAST(count(*) AS BIGINT) AS n,
           |         CAST(sum(e.p) AS BIGINT) AS sum_ab
           |       FROM px GROUP BY 1, 2),
           |dx AS (SELECT unnest(range(0, len(v))) AS d, unnest(v) AS val FROM v),
           |dm AS (SELECT d, CAST(sum(val) AS BIGINT) AS s FROM dx GROUP BY d)
           |SELECT pp.dim_i, pp.dim_j, pp.n, pp.sum_ab,
           |  CAST(floor(CAST(pp.n * pp.sum_ab - a.s * b.s AS DOUBLE)
           |    / (pp.n * pp.n) + 0.5) AS BIGINT) AS cov_micro
           |FROM pp JOIN dm a ON a.d = pp.dim_i JOIN dm b ON b.d = pp.dim_j
           |ORDER BY dim_i, dim_j""".stripMargin))

  /** Per-dimension variance table: the covariance-diagonal identity
    * with exact ppm shares and a dim-bounded rank window.
    */
  private val embDimVariance = CatalogEntry(
    "emb_dim_variance",
    (s, dir) => EmbeddingOps.dimVariance(
        QuerySupport.table(s, dir, "embeddings"))
      .orderBy("dim"),
    Some("""WITH v AS (SELECT list_transform(embedding::DOUBLE[],
           |         x -> CAST(floor(x * 1000) AS BIGINT)) AS v FROM embeddings),
           |dx AS (SELECT unnest(range(0, len(v))) AS dim, unnest(v) AS val FROM v),
           |st AS (SELECT dim, CAST(count(*) AS BIGINT) AS n,
           |         CAST(sum(val) AS BIGINT) AS s,
           |         CAST(sum(val * val) AS BIGINT) AS q
           |       FROM dx GROUP BY dim),
           |vv AS (SELECT dim, CAST(floor(CAST(n * q - s * s AS DOUBLE)
           |         / (n * n) + 0.5) AS BIGINT) AS var_micro FROM st),
           |t AS (SELECT CAST(sum(var_micro) AS BIGINT) AS tt FROM vv)
           |SELECT CAST(dim AS BIGINT) AS dim, var_micro,
           |  CAST(var_micro * 1000000 // greatest(tt, 1) AS BIGINT) AS share_ppm,
           |  CAST(row_number() OVER (ORDER BY var_micro DESC, dim) AS BIGINT) AS rank
           |FROM vv CROSS JOIN t ORDER BY dim""".stripMargin))

  /** Diagonal-Mahalanobis outlier screen: the oracle replays the
    * n-scaled z-square identity and the per-term quantization.
    */
  private val embZscoreOutliers = CatalogEntry(
    "emb_zscore_outliers",
    (s, dir) => EmbeddingOps.zscoreOutliers(
        QuerySupport.table(s, dir, "embeddings"))
      .orderBy("vec_id"),
    Some("""WITH v AS (SELECT vec_id, list_transform(embedding::DOUBLE[],
           |         x -> CAST(floor(x * 1000) AS BIGINT)) AS v FROM embeddings),
           |dx AS (SELECT vec_id, unnest(range(0, len(v))) AS d,
           |         unnest(v) AS val FROM v),
           |st AS (SELECT d, CAST(count(*) AS BIGINT) AS n,
           |         CAST(sum(val) AS BIGINT) AS s,
           |         CAST(sum(val * val) AS BIGINT) AS q
           |       FROM dx GROUP BY d),
           |tm AS (SELECT dx.vec_id,
           |         CASE WHEN n * q - s * s = 0 THEN CAST(0 AS BIGINT)
           |              ELSE CAST(floor(CAST(n * val - s AS DOUBLE) * (n * val - s)
           |                / (n * q - s * s) * 1000000 + 0.5) AS BIGINT) END AS t
           |       FROM dx JOIN st USING (d))
           |SELECT vec_id, CAST(sum(t) AS BIGINT) AS score_micro,
           |  CAST(sum(t) AS BIGINT) > 192000000 AS outlier
           |FROM tm GROUP BY vec_id ORDER BY vec_id""".stripMargin))

  private val embTopComponent = CatalogEntry(
    "emb_top_component",
    (s, dir) => AnnSearch.topComponentProjection(
        QuerySupport.table(s, dir, "embeddings"))
      .orderBy("vec_id"),
    Some(s"""WITH $topComponentCtes
            |SELECT vec_id, proj_milli FROM pj ORDER BY vec_id""".stripMargin))

  /** 2-D principal map: direction 1 bit-identical to
    * emb_top_component, direction 2 by integer Gram-Schmidt-deflated
    * orthogonal iteration; the oracle replays both chains.
    */
  private val embPca2d = CatalogEntry(
    "emb_pca_2d",
    (s, dir) => AnnSearch.pca2Projection(
        QuerySupport.table(s, dir, "embeddings"))
      .orderBy("vec_id"),
    Some(s"""WITH $pca2Ctes
            |SELECT p.vec_id, p.proj_milli, q.proj2_milli
            |FROM pj p JOIN pj2 q USING (vec_id) ORDER BY vec_id""".stripMargin))

  /** Per-label median/MAD outlier screen on the learned-direction
    * projection: exact rank-picked medians (ceil(n*0.5), the
    * lang-stats convention) and an exact integer flag
    * `dev * 1000 > k_milli * mad`.
    */
  private val embProjectionOutliers = CatalogEntry(
    "emb_projection_outliers",
    (s, dir) => AnnSearch.projectionOutliers(
        QuerySupport.table(s, dir, "embeddings"))
      .orderBy("vec_id"),
    Some(s"""WITH $topComponentCtes,
            |lb AS (SELECT pj.vec_id, emb.label, pj.proj_milli
            |       FROM pj JOIN embeddings emb USING (vec_id)),
            |q1 AS MATERIALIZED (SELECT *, row_number() OVER (PARTITION BY label ORDER BY proj_milli, vec_id) AS rn,
            |         count(*) OVER (PARTITION BY label) AS n FROM lb),
            |md AS (SELECT label, max(CASE WHEN rn = ceil(n * 0.5) THEN proj_milli END) AS med
            |       FROM q1 GROUP BY label),
            |dvv AS MATERIALIZED (SELECT q1.vec_id, q1.label, q1.proj_milli, md.med,
            |          abs(q1.proj_milli - md.med) AS dev, q1.n
            |        FROM q1 JOIN md USING (label)),
            |q2 AS (SELECT *, row_number() OVER (PARTITION BY label ORDER BY dev, vec_id) AS rn2 FROM dvv),
            |mad AS (SELECT label, max(CASE WHEN rn2 = ceil(n * 0.5) THEN dev END) AS mad
            |        FROM q2 GROUP BY label)
            |SELECT d.vec_id, d.label, d.proj_milli, d.med AS med_milli,
            |  mad.mad AS mad_milli, d.dev * 1000 > 3000 * mad.mad AS outlier
            |FROM dvv d JOIN mad USING (label) ORDER BY vec_id""".stripMargin))

  /** Per-language corpus summary with rank-picked exact p50/p95. */
  private val textLangStats = CatalogEntry(
    "text_lang_stats",
    (s, dir) => TextAnalysis.corpusStats(QuerySupport.table(s, dir, "documents"))
      .orderBy("lang"),
    Some("""WITH r AS (
           |  SELECT lang, n_chars,
           |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           |         row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
           |         count(*) OVER (PARTITION BY lang) AS n
           |  FROM documents)
           |SELECT lang, count(*) AS n_docs,
           |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           |       min(n_chars) AS min_chars, max(n_chars) AS max_chars,
           |       max(CASE WHEN rn = ceil(n * 0.5) THEN n_chars END) AS p50_chars,
           |       max(CASE WHEN rn = ceil(n * 0.95) THEN n_chars END) AS p95_chars
           |FROM r GROUP BY lang ORDER BY lang""".stripMargin))

  // ------------------------------------------------------------------ ann

  private val annTopK = CatalogEntry(
    "ann_topk",
    (s, dir) => {
      val e = AnnSearch.vectors(QuerySupport.table(s, dir, "embeddings"))
      AnnSearch.bruteForceTopK(e, e.filter(col("vec_id") < annQueryIds), annK)
        .select(col("query_id"), col("neighbor_id"), col("rnk"), r6(col("cos")).as("cosine"))
        .orderBy("query_id", "rnk")
    },
    Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
            |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            |        list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm) AS cos
            |      FROM n q JOIN n c ON c.vec_id <> q.vec_id WHERE q.vec_id < $annQueryIds),
            |r AS (SELECT query_id, neighbor_id, cos,
            |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk FROM p)
            |SELECT query_id, neighbor_id, rnk, ${r6s("cos")} AS cosine
            |FROM r WHERE rnk <= $annK ORDER BY query_id, rnk""".stripMargin))

  /** Matryoshka truncation recall: per-prefix brute top-k vs the
    * full-width top-k, LEFT-joined so zero-overlap queries still
    * report.
    */
  private val annMatryoshkaRecall = CatalogEntry(
    "ann_matryoshka_recall",
    (s, dir) => AnnSearch.matryoshkaRecall(
        QuerySupport.table(s, dir, "embeddings"),
        col("vec_id") < annQueryIds, annK)
      .orderBy("dim", "query_id"),
    Some {
      // prefix blocks drop zero-norm slices on BOTH join sides (the
      // Spark path's nrm > 0 guard — r14 advice #4)
      def block(tag: String, slice: String, guard: Boolean): String =
        s"""n$tag AS (SELECT vec_id, $slice AS v,
           |    sqrt(list_sum(list_transform($slice, x -> x * x))) AS nrm FROM e),
           |p$tag AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |    list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm) AS cos
           |  FROM n$tag q JOIN n$tag c ON c.vec_id <> q.vec_id
           |  WHERE q.vec_id < $annQueryIds${if (guard) " AND q.nrm > 0 AND c.nrm > 0" else ""}),
           |t$tag AS (SELECT query_id, neighbor_id FROM (
           |    SELECT query_id, neighbor_id,
           |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
           |    FROM p$tag) WHERE rnk <= $annK)""".stripMargin
      val dims = Seq(8, 16, 32)
      val blocks = (block("f", "v", guard = false) +:
          dims.map(d => block(s"$d", s"v[1:$d]", guard = true)))
        .mkString(",\n")
      val overlaps = dims.map { d =>
        s"""SELECT $d AS dim, t$d.query_id,
           |  sum(CASE WHEN ff.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS n_overlap
           |FROM t$d LEFT JOIN tf ff ON ff.query_id = t$d.query_id
           |  AND ff.neighbor_id = t$d.neighbor_id
           |GROUP BY 1, 2""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |$blocks,
         |u AS ($overlaps)
         |SELECT CAST(dim AS BIGINT) AS dim, query_id,
         |  CAST(n_overlap AS BIGINT) AS n_overlap,
         |  CAST(n_overlap * 1000000 // $annK AS BIGINT) AS recall_micro
         |FROM u ORDER BY dim, query_id""".stripMargin
    })

  /** JL random-projection recall audit: the oracle inlines the same
    * LCG-derived ±1 sign rows, projects with the identical fold
    * order, and compares projected vs full exact top-k.
    */
  private val annRpRecall = CatalogEntry(
    "emb_rp_recall",
    (s, dir) => AnnSearch.rpRecall(
        QuerySupport.table(s, dir, "embeddings"),
        col("vec_id") < annQueryIds, annK)
      .orderBy("query_id"),
    Some {
      val projDots = (0 until rpDim).map { k =>
        val signs = rpSignTerms(k).mkString(", ")
        s"list_sum(list_transform(range(1, len(v) + 1), i -> v[i] * ([$signs])[i]))"
      }.mkString(",\n    ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |nf AS (SELECT vec_id, v,
         |    sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
         |pf AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm) AS cos
         |  FROM nf q JOIN nf c ON c.vec_id <> q.vec_id
         |  WHERE q.vec_id < $annQueryIds),
         |tf AS (SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
         |    FROM pf) WHERE rnk <= $annK),
         |pe AS (SELECT vec_id, [$projDots] AS v FROM e),
         |np AS (SELECT vec_id, v,
         |    sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM pe),
         |pp AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm) AS cos
         |  FROM np q JOIN np c ON c.vec_id <> q.vec_id
         |  WHERE q.vec_id < $annQueryIds AND q.nrm > 0 AND c.nrm > 0),
         |tp AS (SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
         |    FROM pp) WHERE rnk <= $annK)
         |SELECT CAST($rpDim AS BIGINT) AS rp_dim, tp.query_id,
         |  CAST(sum(CASE WHEN tf.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_overlap,
         |  CAST(sum(CASE WHEN tf.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |    * 1000000 // $annK AS BIGINT) AS recall_micro
         |FROM tp LEFT JOIN tf ON tf.query_id = tp.query_id
         |  AND tf.neighbor_id = tp.neighbor_id
         |GROUP BY tp.query_id ORDER BY tp.query_id""".stripMargin
    })

  /** Prefixed IVF top-k oracle CTE chain — the DuckDB replay of
    * [[AnnSearch.ivfTopK]] (two-probe bucket join + exact cosine
    * re-rank), ending in `${p}r` with columns (query_id, neighbor_id,
    * cos, rnk). The prefix keeps the chain composable next to other
    * CTE families (the hybrid entry stacks it on [[bm25BatchCtes]],
    * whose names it must not collide with).
    */
  private def ivfRankCtes(p: String, pred: String): String = {
    val dots = (0 until ivfCentroids).map { k =>
      val lit = latticeTerms(0L, k).mkString(", ")
      s"list_sum(list_transform(range(1, len(v) + 1), i -> v[i] * ([$lit])[i]))"
    }.mkString(",\n  ")
    val masked = s"list_transform(range(1, ${ivfCentroids + 1}), i -> CASE WHEN i = b1 THEN -1e18 ELSE dots[i] END)"
    s"""${p}e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |${p}d AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm, [$dots] AS dots FROM ${p}e),
       |${p}a AS (SELECT vec_id, v, nrm, dots, list_position(dots, list_aggregate(dots, 'max')) AS b1 FROM ${p}d),
       |${p}q AS (SELECT vec_id, v, nrm, b1,
       |        list_position($masked, list_aggregate($masked, 'max')) AS b2
       |      FROM ${p}a WHERE $pred),
       |${p}pr AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, unnest([b1, b2]) AS bucket FROM ${p}q),
       |${p}cand AS (SELECT p.query_id, c.vec_id AS neighbor_id,
       |          list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * c.v[i])) / (qn * c.nrm) AS cos
       |         FROM ${p}pr p JOIN ${p}a c ON c.b1 = p.bucket AND c.vec_id <> p.query_id),
       |${p}r AS (SELECT query_id, neighbor_id, cos,
       |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk FROM ${p}cand)""".stripMargin
  }

  private val annIvfTopK = CatalogEntry(
    "ann_ivf_topk",
    (s, dir) => AnnSearch.ivfTopK(QuerySupport.table(s, dir, "embeddings"),
        col("vec_id") < annQueryIds, ivfK)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), r6(col("cos")).as("cosine"))
      .orderBy("query_id", "rnk"),
    Some(s"""WITH ${ivfRankCtes("", s"vec_id < $annQueryIds")}
            |SELECT query_id, neighbor_id, rnk, ${r6s("cos")} AS cosine
            |FROM r WHERE rnk <= $ivfK ORDER BY query_id, rnk""".stripMargin))

  /** Hybrid-retrieval rank fusion: RRF over the exact brute-force
    * ranking and the IVF ranking (the two cataloged retrievers, same
    * query set). Rank positions are integers and each reciprocal
    * contribution is quantized before the BIGINT sum, so the fused
    * ordering is float-free end to end; the oracle replays both
    * retriever CTEs verbatim and the same fusion arithmetic.
    */
  private val retrievalRrfFusion = CatalogEntry(
    "retrieval_rrf_fusion",
    (s, dir) => {
      val emb = QuerySupport.table(s, dir, "embeddings")
      val e = AnnSearch.vectors(emb)
      val exact = AnnSearch.bruteForceTopK(
        e, e.filter(col("vec_id") < annQueryIds), annK)
      val ivf = AnnSearch.ivfTopK(emb, col("vec_id") < annQueryIds, ivfK)
      AnnSearch.rrfFuse(Seq(exact, ivf), topK = annK)
        .orderBy("query_id", "rnk")
    },
    Some {
      val dots = (0 until ivfCentroids).map { k =>
        val lit = latticeTerms(0L, k).mkString(", ")
        s"list_sum(list_transform(range(1, len(v) + 1), i -> v[i] * ([$lit])[i]))"
      }.mkString(",\n  ")
      val masked = s"list_transform(range(1, ${ivfCentroids + 1}), i -> CASE WHEN i = b1 THEN -1e18 ELSE dots[i] END)"
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
         |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |        list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm) AS cos
         |      FROM n q JOIN n c ON c.vec_id <> q.vec_id WHERE q.vec_id < $annQueryIds),
         |rex AS (SELECT query_id, neighbor_id,
         |          row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk FROM p),
         |d AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm, [$dots] AS dots FROM e),
         |a AS (SELECT vec_id, v, nrm, dots, list_position(dots, list_aggregate(dots, 'max')) AS b1 FROM d),
         |qf AS (SELECT vec_id, v, nrm, b1,
         |         list_position($masked, list_aggregate($masked, 'max')) AS b2
         |       FROM a WHERE vec_id < $annQueryIds),
         |pr AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, unnest([b1, b2]) AS bucket FROM qf),
         |cand AS (SELECT p.query_id, c.vec_id AS neighbor_id,
         |          list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * c.v[i])) / (qn * c.nrm) AS cos
         |         FROM pr p JOIN a c ON c.b1 = p.bucket AND c.vec_id <> p.query_id),
         |riv AS (SELECT query_id, neighbor_id,
         |          row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk FROM cand),
         |u AS (SELECT query_id, neighbor_id,
         |        CAST(floor(1000000.0 / (60 + rnk) + 0.5) AS BIGINT) AS c
         |      FROM (SELECT query_id, neighbor_id, rnk FROM rex WHERE rnk <= $annK
         |            UNION ALL
         |            SELECT query_id, neighbor_id, rnk FROM riv WHERE rnk <= $ivfK)),
         |f AS (SELECT query_id, neighbor_id, sum(c) AS rrf_micro, count(*) AS n_lists
         |      FROM u GROUP BY query_id, neighbor_id),
         |rr AS (SELECT query_id, neighbor_id,
         |         row_number() OVER (PARTITION BY query_id ORDER BY rrf_micro DESC, neighbor_id) AS rnk,
         |         n_lists, rrf_micro FROM f)
         |SELECT query_id, neighbor_id, rnk, CAST(n_lists AS BIGINT) AS n_lists,
         |  CAST(rrf_micro AS BIGINT) AS rrf_micro
         |FROM rr WHERE rnk <= $annK ORDER BY query_id, rnk""".stripMargin
    })

  /** Corpus kNN graph: the IVF self-join (every vector is a query) —
    * probes are corpus-sized so the Spark side never broadcasts them,
    * and the oracle replays the identical lattice probe semantics
    * with the query filter removed.
    */
  /** The lattice graph's shared CTE chain ending in
    * `r(query_id, neighbor_id, cos, rnk)` — used by the graph entries
    * and composed further by the PageRank oracle.
    */
  private def latticeGraphCtes(kc: Int): String = {
    val dots = (0 until kc).map { k =>
      val lit = latticeTerms(0L, k).mkString(", ")
      s"list_sum(list_transform(range(1, len(v) + 1), i -> v[i] * ([$lit])[i]))"
    }.mkString(",\n  ")
    val masked = s"list_transform(range(1, ${kc + 1}), i -> CASE WHEN i = b1 THEN -1e18 ELSE dots[i] END)"
    // `a` and `r` are pinned AS MATERIALIZED: DuckDB inlines plain
    // CTEs at every reference, and the downstream tails (mutual /
    // triangles / pagerank / label-prop / triplets) reference
    // r-derived frames several times each — un-pinned, the whole
    // kc-dot-product assignment plus the interpreted-lambda candidate
    // join re-ran per reference (12-31 s per entry at sf0.01; the
    // round-15 driver-compare budget breaker, with the power chain).
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |d AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm, [$dots] AS dots FROM e),
       |a AS MATERIALIZED (SELECT vec_id, v, nrm, dots, list_position(dots, list_aggregate(dots, 'max')) AS b1 FROM d),
       |q AS (SELECT vec_id, v, nrm, b1,
       |        list_position($masked, list_aggregate($masked, 'max')) AS b2
       |      FROM a),
       |pr AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, unnest([b1, b2]) AS bucket FROM q),
       |cand AS (SELECT p.query_id, c.vec_id AS neighbor_id,
       |          list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * c.v[i])) / (qn * c.nrm) AS cos
       |         FROM pr p JOIN a c ON c.b1 = p.bucket AND c.vec_id <> p.query_id),
       |r AS MATERIALIZED (SELECT query_id, neighbor_id, cos,
       |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk FROM cand)""".stripMargin
  }

  private val annKnnGraph = CatalogEntry(
    "ann_knn_graph",
    (s, dir) => AnnSearch.knnGraph(QuerySupport.table(s, dir, "embeddings"), annK)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), r6(col("cos")).as("cosine"))
      .orderBy("query_id", "rnk"),
    Some(s"""WITH ${latticeGraphCtes(ivfCentroids)}
            |SELECT query_id, neighbor_id, rnk, ${r6s("cos")} AS cosine
            |FROM r WHERE rnk <= $annK ORDER BY query_id, rnk""".stripMargin))

  /** IVF bucket-occupancy audit: the oracle reuses the lattice
    * assignment CTE (`a`) and replays the kc-row rollup — unreferenced
    * graph CTEs are never evaluated.
    */
  private val annBucketBalance = CatalogEntry(
    "ann_bucket_balance",
    (s, dir) => AnnSearch.bucketBalance(
        QuerySupport.table(s, dir, "embeddings"))
      .orderBy("bucket"),
    Some(s"""WITH ${latticeGraphCtes(ivfCentroids)},
            |pb AS (SELECT b1 AS bucket, CAST(count(*) AS BIGINT) AS n_vectors
            |       FROM a GROUP BY b1),
            |tt AS (SELECT CAST(sum(n_vectors) AS BIGINT) AS n,
            |         CAST(count(*) AS BIGINT) AS n_buckets_used FROM pb)
            |SELECT CAST(bucket AS BIGINT) AS bucket, n_vectors,
            |  n_vectors * 1000000 // n AS share_micro,
            |  n_vectors * $ivfCentroids * 1000000 // n AS occupancy_ratio_micro,
            |  n_buckets_used
            |FROM pb CROSS JOIN tt ORDER BY bucket""".stripMargin))

  /** Mutual (reciprocal) kNN pairs: the oracle reuses the graph CTEs
    * and replays the same direction-split self-join.
    */
  private val annKnnMutual = CatalogEntry(
    "ann_knn_mutual",
    (s, dir) => AnnSearch.knnMutual(QuerySupport.table(s, dir, "embeddings"), annK)
      .select(col("vec_a"), col("vec_b"), col("rnk_ab"), col("rnk_ba"),
        r6(col("cos")).as("cosine"))
      .orderBy("vec_a", "vec_b"),
    Some(s"""WITH ${latticeGraphCtes(ivfCentroids)},
            |t AS (SELECT query_id, neighbor_id, rnk, cos FROM r WHERE rnk <= $annK),
            |fw AS (SELECT query_id AS vec_a, neighbor_id AS vec_b,
            |              rnk AS rnk_ab, cos
            |       FROM t WHERE query_id < neighbor_id),
            |rv AS (SELECT neighbor_id AS vec_a, query_id AS vec_b, rnk AS rnk_ba
            |       FROM t WHERE query_id > neighbor_id)
            |SELECT vec_a, vec_b, rnk_ab, rnk_ba, ${r6s("cos")} AS cosine
            |FROM fw JOIN rv USING (vec_a, vec_b)
            |ORDER BY vec_a, vec_b""".stripMargin))

  /** [[annKnnMutual]]'s 100 TB path: same reciprocal cut over the
    * kc-scaled graph (see `ann_knn_graph_scaled`) — bucket occupancy,
    * and with it the candidate pair count feeding the mutual join,
    * stays bounded as the corpus grows.
    */
  private val annKnnMutualScaled = CatalogEntry(
    "ann_knn_mutual_scaled",
    (s, dir) => AnnSearch.knnMutual(QuerySupport.table(s, dir, "embeddings"),
        annK, kc = knnScaledCentroids)
      .select(col("vec_a"), col("vec_b"), col("rnk_ab"), col("rnk_ba"),
        r6(col("cos")).as("cosine"))
      .orderBy("vec_a", "vec_b"),
    Some(s"""WITH ${latticeGraphCtes(knnScaledCentroids)},
            |t AS (SELECT query_id, neighbor_id, rnk, cos FROM r WHERE rnk <= $annK),
            |fw AS (SELECT query_id AS vec_a, neighbor_id AS vec_b,
            |              rnk AS rnk_ab, cos
            |       FROM t WHERE query_id < neighbor_id),
            |rv AS (SELECT neighbor_id AS vec_a, query_id AS vec_b, rnk AS rnk_ba
            |       FROM t WHERE query_id > neighbor_id)
            |SELECT vec_a, vec_b, rnk_ab, rnk_ba, ${r6s("cos")} AS cosine
            |FROM fw JOIN rv USING (vec_a, vec_b)
            |ORDER BY vec_a, vec_b""".stripMargin))

  /** Shared triangle-count oracle tail over a graph CTE chain ending
    * in `r` — symmetrize, degree, degree-ordered direction (tuple
    * compare, no rank), wedge + closure joins, per-node credit
    * (mirrors AnnSearch.knnTriangles).
    */
  /** Triangle enumeration from an existing canonical `und(a, b)`
    * frame to `deg`/`cr` — shared by the kNN-graph and LSH-candidate
    * transitivity oracles. */
  private def triangleFromUndSql: String =
    s"""deg AS MATERIALIZED (SELECT v, count(*) AS degree FROM
       |          (SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und) z
       |        GROUP BY v),
       |dd AS MATERIALIZED (SELECT CASE WHEN (da.degree, und.a) < (db.degree, und.b)
       |                THEN und.a ELSE und.b END AS u,
       |              CASE WHEN (da.degree, und.a) < (db.degree, und.b)
       |                THEN und.b ELSE und.a END AS w
       |       FROM und JOIN deg da ON da.v = und.a
       |       JOIN deg db ON db.v = und.b),
       |wdg AS (SELECT e1.u AS u, e1.w AS v1, e2.w AS v2
       |        FROM dd e1 JOIN dd e2 ON e1.u = e2.u AND e1.w < e2.w),
       |tri AS (SELECT u, v1, v2 FROM wdg
       |        JOIN und ON und.a = least(v1, v2) AND und.b = greatest(v1, v2)),
       |cr AS (SELECT v, count(*) AS n_triangles FROM
       |         (SELECT u AS v FROM tri UNION ALL SELECT v1 AS v FROM tri
       |          UNION ALL SELECT v2 AS v FROM tri) z
       |       GROUP BY v)""".stripMargin

  /** The kNN-graph edge prefix: top-k edges from the ranked lattice
    * frame `r`, canonicalized undirected. */
  private def triangleChainSql: String =
    s"""t AS (SELECT query_id, neighbor_id FROM r WHERE rnk <= $annK),
       |und AS MATERIALIZED (SELECT DISTINCT least(query_id, neighbor_id) AS a,
       |          greatest(query_id, neighbor_id) AS b FROM t),
       |$triangleFromUndSql""".stripMargin

  /** One-row transitivity rollup over `deg`/`cr` — the
    * clusteringRollup identities. */
  private def clusteringRollupSql: String =
    """pn AS (SELECT deg.v, deg.degree,
      |        coalesce(cr.n_triangles, 0) AS n_tri,
      |        CASE WHEN deg.degree >= 2
      |          THEN coalesce(cr.n_triangles, 0) * 2 * 1000000
      |               // (deg.degree * (deg.degree - 1))
      |          ELSE 0 END AS cl
      |       FROM deg LEFT JOIN cr ON cr.v = deg.v),
      |ag AS (SELECT count(*) AS n_nodes, sum(degree) AS sd,
      |         sum(n_tri) AS st, sum(degree * (degree - 1)) AS sw,
      |         sum(cl) AS sc FROM pn)
      |SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
      |  CAST(sd // 2 AS BIGINT) AS n_edges,
      |  CAST(st // 3 AS BIGINT) AS n_triangles,
      |  CAST(sw // 2 AS BIGINT) AS n_wedges,
      |  CAST(CASE WHEN sw = 0 THEN 0
      |    ELSE 2 * st * 1000000 // sw END AS BIGINT)
      |    AS global_clustering_micro,
      |  CAST(sc // n_nodes AS BIGINT) AS avg_local_clustering_micro
      |FROM ag""".stripMargin

  private def triangleTailSql: String =
    s"""$triangleChainSql
       |SELECT deg.v AS vec_id, CAST(deg.degree AS BIGINT) AS degree,
       |  CAST(coalesce(cr.n_triangles, 0) AS BIGINT) AS n_triangles,
       |  CAST(CASE WHEN deg.degree >= 2
       |    THEN coalesce(cr.n_triangles, 0) * 2 * 1000000
       |         // (deg.degree * (deg.degree - 1))
       |    ELSE 0 END AS BIGINT) AS clustering_micro
       |FROM deg LEFT JOIN cr ON cr.v = deg.v ORDER BY vec_id""".stripMargin

  /** Triangle count + clustering coefficient on the kNN graph: the
    * oracle replays the degree-ordered compact-forward enumeration —
    * direction by (degree, id) tuple compare, wedges from higher-rank
    * out-edges only, one closure join.
    */
  private val annGraphTriangles = CatalogEntry(
    "ann_graph_triangles",
    (s, dir) => AnnSearch.knnTriangles(
        QuerySupport.table(s, dir, "embeddings"), annK)
      .orderBy("vec_id"),
    Some(s"""WITH ${latticeGraphCtes(ivfCentroids)},
            |$triangleTailSql""".stripMargin))

  /** [[annGraphTriangles]]'s 100 TB path: the same enumeration over
    * the kc-scaled graph — the closure/wedge work rides the scaled
    * graph's bounded bucket occupancy.
    */
  private val annGraphTrianglesScaled = CatalogEntry(
    "ann_graph_triangles_scaled",
    (s, dir) => AnnSearch.knnTriangles(
        QuerySupport.table(s, dir, "embeddings"), annK,
        kc = knnScaledCentroids)
      .orderBy("vec_id"),
    Some(s"""WITH ${latticeGraphCtes(knnScaledCentroids)},
            |$triangleTailSql""".stripMargin))

  /** Global clustering coefficient (transitivity) + average local —
    * the triangle chain's scalar rollup; diverging numbers flag
    * hub-dominated (degenerate) embedding regions.
    */
  private val annGraphGlobalClustering = CatalogEntry(
    "ann_graph_global_clustering",
    (s, dir) => AnnSearch.globalClustering(
        QuerySupport.table(s, dir, "embeddings"), annK),
    Some(s"""WITH ${latticeGraphCtes(ivfCentroids)},
            |$triangleChainSql,
            |$clusteringRollupSql""".stripMargin))

  /** [[annGraphGlobalClustering]]'s 100 TB path: the same rollup
    * over the kc-scaled graph — the fixed-kc sibling measured 90×
    * for 10× data (the occupancy² contract biting exactly as
    * documented); at kc∝n the wedge work rides bounded occupancy
    * (RehearseKc `transitivity` point in PLANS.md).
    */
  private val annGraphGlobalClusteringScaled = CatalogEntry(
    "ann_graph_global_clustering_scaled",
    (s, dir) => AnnSearch.globalClustering(
        QuerySupport.table(s, dir, "embeddings"), annK,
        kc = knnScaledCentroids),
    Some(s"""WITH ${latticeGraphCtes(knnScaledCentroids)},
            |$triangleChainSql,
            |$clusteringRollupSql""".stripMargin))

  /** Transitivity of the LSH candidate graph: the same triangle
    * kernel + rollup pointed at the near-dup pair frame — closed dup
    * communities vs boilerplate chains, one scalar per corpus.
    */
  private val dedupGraphTransitivity = CatalogEntry(
    "dedup_graph_transitivity",
    (s, dir) => Dedup.candidateGraphTransitivity(
      QuerySupport.table(s, dir, "documents")),
    Some(s"""WITH $minhashCtes,
            |und AS MATERIALIZED (SELECT DISTINCT least(doc_a, doc_b) AS a,
            |          greatest(doc_a, doc_b) AS b FROM cand),
            |$triangleFromUndSql,
            |$clusteringRollupSql""".stripMargin))

  /** [[dedupGraphTransitivity]]'s production path: the 25%
    * NODE-digest induced subgraph — triangle and wedge are both
    * 3-node motifs, so the p³ survival cancels in the ratio (an edge
    * sample would bias C by p); the full enumeration measured 83×
    * for 10× docs on the zipf reuse corpus.
    */
  private val dedupGraphTransitivitySampled = CatalogEntry(
    "dedup_graph_transitivity_sampled",
    (s, dir) => Dedup.candidateGraphTransitivity(
      QuerySupport.table(s, dir, "documents"), samplePpm = 250000L),
    Some {
      val thr = s"'${graft.llmdata.Sampling.hexThreshold(0.25)}'"
      s"""WITH $minhashCtes,
         |und0 AS (SELECT DISTINCT least(doc_a, doc_b) AS a,
         |          greatest(doc_a, doc_b) AS b FROM cand),
         |und AS MATERIALIZED (SELECT a, b FROM und0
         |        WHERE substr(md5('trans:' || CAST(a AS VARCHAR)), 1, 8) < $thr
         |          AND substr(md5('trans:' || CAST(b AS VARCHAR)), 1, 8) < $thr),
         |$triangleFromUndSql,
         |$clusteringRollupSql""".stripMargin
    })

  /** Shared oracle tail for the label-propagation pair: vote, rank,
    * audit — parameterized only by the graph CTEs prepended above it.
    */
  private val labelPropTailSql =
    s"""t AS (SELECT query_id, neighbor_id, cos FROM r WHERE rnk <= $annK),
       |ho AS (SELECT vec_id AS query_id, label AS true_label
       |       FROM embeddings WHERE vec_id % 5 = 0),
       |kn AS (SELECT vec_id AS neighbor_id, label AS nb_label
       |       FROM embeddings WHERE vec_id % 5 <> 0),
       |v AS (SELECT query_id, true_label, nb_label, count(*) AS n_votes,
       |        sum(CAST(floor(cos * 1000000 + 0.5) AS BIGINT)) AS vote_micro
       |      FROM t JOIN ho USING (query_id) JOIN kn USING (neighbor_id)
       |      GROUP BY 1, 2, 3),
       |rkv AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |          ORDER BY vote_micro DESC, nb_label) AS rnk,
       |          sum(n_votes) OVER (PARTITION BY query_id) AS n_nb
       |        FROM v)
       |SELECT query_id AS vec_id, true_label, nb_label AS pred_label,
       |  CAST(n_nb AS BIGINT) AS n_labeled_neighbors,
       |  CAST(vote_micro AS BIGINT) AS vote_micro,
       |  (true_label = nb_label) AS correct
       |FROM rkv WHERE rnk = 1 ORDER BY vec_id""".stripMargin

  /** One-step cosine-weighted label propagation on the kNN graph:
    * per-edge cosines quantize to micro BEFORE the vote sum (exact
    * BIGINT votes), argmax tie-breaks on the smaller label.
    */
  private val annLabelProp = CatalogEntry(
    "ann_label_prop",
    (s, dir) => AnnSearch.labelPropagation(
        QuerySupport.table(s, dir, "embeddings"), annK)
      .orderBy("vec_id"),
    Some(s"""WITH ${latticeGraphCtes(ivfCentroids)},
            |$labelPropTailSql""".stripMargin))

  /** [[annLabelProp]]'s 100 TB path: the same vote/argmax tail over
    * the kc-scaled graph — the propagation is one narrow join + one
    * aggregate and rides any kc, so scaling the graph scales the
    * whole operator (the family's bounded-occupancy contract,
    * measured next to the fixed-kc default).
    */
  private val annLabelPropScaled = CatalogEntry(
    "ann_label_prop_scaled",
    (s, dir) => AnnSearch.labelPropagation(
        QuerySupport.table(s, dir, "embeddings"), annK,
        kc = knnScaledCentroids)
      .orderBy("vec_id"),
    Some(s"""WITH ${latticeGraphCtes(knnScaledCentroids)},
            |$labelPropTailSql""".stripMargin))

  /** Triplet mining: mutual pairs as positives, the best-ranked
    * non-mutual neighbor as the hard negative — the oracle replays
    * the direction-split mutual join, the anti-join, and the
    * DISTINCT ON negative pick.
    */
  private val annTripletMining = CatalogEntry(
    "ann_triplet_mining",
    (s, dir) => AnnSearch.tripletMining(
        QuerySupport.table(s, dir, "embeddings"), annK)
      .select(col("anchor"), col("positive"), col("negative"),
        r6(col("pos_cos")).as("pos_cos"), r6(col("neg_cos")).as("neg_cos"))
      .orderBy("anchor", "positive"),
    Some(s"""WITH ${latticeGraphCtes(ivfCentroids)},
            |t AS (SELECT query_id, neighbor_id, rnk, cos FROM r WHERE rnk <= $annK),
            |fw AS (SELECT query_id AS vec_a, neighbor_id AS vec_b, cos
            |       FROM t WHERE query_id < neighbor_id),
            |rv AS (SELECT neighbor_id AS vec_a, query_id AS vec_b
            |       FROM t WHERE query_id > neighbor_id),
            |mu AS (SELECT fw.vec_a, fw.vec_b, fw.cos FROM fw JOIN rv USING (vec_a, vec_b)),
            |pa AS (SELECT vec_a AS query_id, vec_b AS neighbor_id FROM mu
            |       UNION ALL SELECT vec_b, vec_a FROM mu),
            |ng AS (SELECT t.query_id, t.neighbor_id, t.rnk, t.cos FROM t
            |       LEFT JOIN pa ON pa.query_id = t.query_id
            |         AND pa.neighbor_id = t.neighbor_id
            |       WHERE pa.query_id IS NULL),
            |n1 AS (SELECT DISTINCT ON (query_id) query_id, neighbor_id, cos
            |       FROM ng ORDER BY query_id, rnk, neighbor_id)
            |SELECT mu.vec_a AS anchor, mu.vec_b AS positive,
            |  n1.neighbor_id AS negative,
            |  ${r6s("mu.cos")} AS pos_cos, ${r6s("n1.cos")} AS neg_cos
            |FROM mu JOIN n1 ON n1.query_id = mu.vec_a
            |ORDER BY anchor, positive""".stripMargin))

  /** [[annTripletMining]]'s 100 TB path: the same mutual/anti-join
    * tail over the kc-scaled graph (the family's bounded-occupancy
    * contract, measured next to the fixed-kc default).
    */
  private val annTripletMiningScaled = CatalogEntry(
    "ann_triplet_mining_scaled",
    (s, dir) => AnnSearch.tripletMining(
        QuerySupport.table(s, dir, "embeddings"), annK,
        kc = knnScaledCentroids)
      .select(col("anchor"), col("positive"), col("negative"),
        r6(col("pos_cos")).as("pos_cos"), r6(col("neg_cos")).as("neg_cos"))
      .orderBy("anchor", "positive"),
    Some(s"""WITH ${latticeGraphCtes(knnScaledCentroids)},
            |t AS (SELECT query_id, neighbor_id, rnk, cos FROM r WHERE rnk <= $annK),
            |fw AS (SELECT query_id AS vec_a, neighbor_id AS vec_b, cos
            |       FROM t WHERE query_id < neighbor_id),
            |rv AS (SELECT neighbor_id AS vec_a, query_id AS vec_b
            |       FROM t WHERE query_id > neighbor_id),
            |mu AS (SELECT fw.vec_a, fw.vec_b, fw.cos FROM fw JOIN rv USING (vec_a, vec_b)),
            |pa AS (SELECT vec_a AS query_id, vec_b AS neighbor_id FROM mu
            |       UNION ALL SELECT vec_b, vec_a FROM mu),
            |ng AS (SELECT t.query_id, t.neighbor_id, t.rnk, t.cos FROM t
            |       LEFT JOIN pa ON pa.query_id = t.query_id
            |         AND pa.neighbor_id = t.neighbor_id
            |       WHERE pa.query_id IS NULL),
            |n1 AS (SELECT DISTINCT ON (query_id) query_id, neighbor_id, cos
            |       FROM ng ORDER BY query_id, rnk, neighbor_id)
            |SELECT mu.vec_a AS anchor, mu.vec_b AS positive,
            |  n1.neighbor_id AS negative,
            |  ${r6s("mu.cos")} AS pos_cos, ${r6s("n1.cos")} AS neg_cos
            |FROM mu JOIN n1 ON n1.query_id = mu.vec_a
            |ORDER BY anchor, positive""".stripMargin))

  /** The kNN graph's 100 TB path: centroid count scaled with the
    * corpus (`knnScaledCentroids`), so per-bucket occupancy — and
    * with it the self-join's pair count per query — stays bounded
    * while the toy-config entry above stays oracle-comparable. Same
    * probe semantics, more lattice planes.
    */
  private val annKnnGraphScaled = CatalogEntry(
    "ann_knn_graph_scaled",
    (s, dir) => AnnSearch.knnGraph(QuerySupport.table(s, dir, "embeddings"), annK,
        kc = knnScaledCentroids)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), r6(col("cos")).as("cosine"))
      .orderBy("query_id", "rnk"),
    Some(s"""WITH ${latticeGraphCtes(knnScaledCentroids)}
            |SELECT query_id, neighbor_id, rnk, ${r6s("cos")} AS cosine
            |FROM r WHERE rnk <= $annK ORDER BY query_id, rnk""".stripMargin))

  /** Recall@k audit: the oracle composes the brute-force and IVF
    * chains (CTEs renamed apart) and counts their per-query overlap —
    * index-quality measurement as a first-class, hash-checked query.
    */
  private val annRecall = CatalogEntry(
    "ann_recall",
    (s, dir) => AnnSearch.ivfRecall(QuerySupport.table(s, dir, "embeddings"),
        col("vec_id") < annQueryIds, ivfK)
      .select(col("query_id"), col("n_hits"), r6(col("recall")).as("recall"))
      .orderBy("query_id"),
    Some {
      val dots = (0 until ivfCentroids).map { k =>
        val lit = latticeTerms(0L, k).mkString(", ")
        s"list_sum(list_transform(range(1, len(v) + 1), i -> v[i] * ([$lit])[i]))"
      }.mkString(",\n  ")
      val masked = s"list_transform(range(1, ${ivfCentroids + 1}), i -> CASE WHEN i = b1 THEN -1e18 ELSE dots[i] END)"
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
         |bp AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |        list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm) AS cos
         |      FROM n q JOIN n c ON c.vec_id <> q.vec_id WHERE q.vec_id < $annQueryIds),
         |br AS (SELECT query_id, neighbor_id,
         |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk FROM bp),
         |bt AS (SELECT query_id, neighbor_id FROM br WHERE rnk <= $ivfK),
         |d AS (SELECT vec_id, v, nrm, [$dots] AS dots FROM n),
         |a AS (SELECT vec_id, v, nrm, dots, list_position(dots, list_aggregate(dots, 'max')) AS b1 FROM d),
         |q AS (SELECT vec_id, v, nrm, b1,
         |        list_position($masked, list_aggregate($masked, 'max')) AS b2
         |      FROM a WHERE vec_id < $annQueryIds),
         |pr AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, unnest([b1, b2]) AS bucket FROM q),
         |cand AS (SELECT p.query_id, c.vec_id AS neighbor_id,
         |          list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * c.v[i])) / (qn * c.nrm) AS cos
         |         FROM pr p JOIN a c ON c.b1 = p.bucket AND c.vec_id <> p.query_id),
         |ir AS (SELECT query_id, neighbor_id,
         |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk FROM cand),
         |it AS (SELECT query_id, neighbor_id FROM ir WHERE rnk <= $ivfK),
         |h AS (SELECT bt.query_id, count(*) AS n_hits
         |      FROM bt JOIN it USING (query_id, neighbor_id) GROUP BY bt.query_id),
         |qs AS (SELECT DISTINCT query_id FROM bt)
         |SELECT qs.query_id, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
         |  ${r6s(s"CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / $ivfK")} AS recall
         |FROM qs LEFT JOIN h USING (query_id) ORDER BY query_id""".stripMargin
    })

  /** IVF probe-count sweep: recall@k at probes = 1 vs 2 against one
    * shared brute-force truth, exact integer micro — the recall/cost
    * planner beside the banding and width planners. The oracle
    * composes the ann_recall chains with a per-probe bucket list.
    */
  private val annProbeSweep = CatalogEntry(
    "ann_probe_sweep",
    (s, dir) => AnnSearch.ivfProbeSweep(
        QuerySupport.table(s, dir, "embeddings"),
        col("vec_id") < annQueryIds, ivfK)
      .orderBy("n_probes"),
    Some {
      val dots = (0 until ivfCentroids).map { k =>
        val lit = latticeTerms(0L, k).mkString(", ")
        s"list_sum(list_transform(range(1, len(v) + 1), i -> v[i] * ([$lit])[i]))"
      }.mkString(",\n  ")
      val masked = s"list_transform(range(1, ${ivfCentroids + 1}), i -> CASE WHEN i = b1 THEN -1e18 ELSE dots[i] END)"
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |n AS MATERIALIZED (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
         |bp AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |        list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm) AS cos
         |      FROM n q JOIN n c ON c.vec_id <> q.vec_id WHERE q.vec_id < $annQueryIds),
         |br AS (SELECT query_id, neighbor_id,
         |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk FROM bp),
         |bt AS MATERIALIZED (SELECT query_id, neighbor_id FROM br WHERE rnk <= $ivfK),
         |d AS (SELECT vec_id, v, nrm, [$dots] AS dots FROM n),
         |a AS MATERIALIZED (SELECT vec_id, v, nrm, dots, list_position(dots, list_aggregate(dots, 'max')) AS b1 FROM d),
         |q AS MATERIALIZED (SELECT vec_id, v, nrm, b1,
         |        list_position($masked, list_aggregate($masked, 'max')) AS b2
         |      FROM a WHERE vec_id < $annQueryIds),
         |pr1 AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, b1 AS bucket FROM q),
         |pr2 AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, unnest([b1, b2]) AS bucket FROM q),
         |c1 AS (SELECT p.query_id, c.vec_id AS neighbor_id,
         |        list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * c.v[i])) / (qn * c.nrm) AS cos
         |       FROM pr1 p JOIN a c ON c.b1 = p.bucket AND c.vec_id <> p.query_id),
         |c2 AS (SELECT p.query_id, c.vec_id AS neighbor_id,
         |        list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * c.v[i])) / (qn * c.nrm) AS cos
         |       FROM pr2 p JOIN a c ON c.b1 = p.bucket AND c.vec_id <> p.query_id),
         |i1 AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
         |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk FROM c1)
         |       WHERE rnk <= $ivfK),
         |i2 AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
         |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk FROM c2)
         |       WHERE rnk <= $ivfK),
         |qs AS MATERIALIZED (SELECT CAST(count(DISTINCT query_id) AS BIGINT) AS n_queries FROM bt),
         |h1 AS (SELECT CAST(count(*) AS BIGINT) AS sum_hits FROM bt JOIN i1 USING (query_id, neighbor_id)),
         |h2 AS (SELECT CAST(count(*) AS BIGINT) AS sum_hits FROM bt JOIN i2 USING (query_id, neighbor_id)),
         |u AS (SELECT CAST(1 AS BIGINT) AS n_probes, qs.n_queries, h1.sum_hits FROM qs, h1
         |      UNION ALL
         |      SELECT CAST(2 AS BIGINT), qs.n_queries, h2.sum_hits FROM qs, h2)
         |SELECT n_probes, n_queries, sum_hits,
         |  CAST(n_queries * $ivfK AS BIGINT) AS possible,
         |  CAST(sum_hits * 1000000 // greatest(n_queries * $ivfK, 1) AS BIGINT) AS recall_micro
         |FROM u ORDER BY n_probes""".stripMargin
    })

  /** Recall@k of the LEARNED index — the production configuration's
    * audit, next to the lattice `ann_recall`: the oracle reuses the
    * k-means chain's `n` for the brute side and counts the overlap.
    */
  private val annRecallLearned = CatalogEntry(
    "ann_recall_learned",
    (s, dir) => AnnSearch.ivfKmeansRecall(
        QuerySupport.table(s, dir, "embeddings"),
        col("vec_id") < annQueryIds, ivfK)
      .select(col("query_id"), col("n_hits"), r6(col("recall")).as("recall"))
      .orderBy("query_id"),
    Some {
      val masked = s"list_transform(range(1, ${ivfCentroids + 1}), i -> CASE WHEN i = b1 THEN -1e18 ELSE scores[i] END)"
      s"""WITH ${kmeansCtesK(ivfCentroids)},
         |sc AS (SELECT vec_id, list(score ORDER BY j) AS scores FROM d2 GROUP BY vec_id),
         |a AS (SELECT n.vec_id, n.v, n.nrm, sc.scores,
         |        list_position(sc.scores, list_aggregate(sc.scores, 'max')) AS b1
         |      FROM n JOIN sc USING (vec_id)),
         |q AS (SELECT vec_id, v, nrm, b1,
         |        list_position($masked, list_aggregate($masked, 'max')) AS b2
         |      FROM a WHERE vec_id < $annQueryIds),
         |pr AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, unnest([b1, b2]) AS bucket FROM q),
         |cand AS (SELECT p.query_id, c.vec_id AS neighbor_id,
         |          list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * c.v[i])) / (qn * c.nrm) AS cos
         |         FROM pr p JOIN a c ON c.b1 = p.bucket AND c.vec_id <> p.query_id),
         |ir AS (SELECT query_id, neighbor_id,
         |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk FROM cand),
         |it AS (SELECT query_id, neighbor_id FROM ir WHERE rnk <= $ivfK),
         |bp AS (SELECT qq.vec_id AS query_id, c.vec_id AS neighbor_id,
         |        list_sum(list_transform(range(1, len(qq.v) + 1), i -> qq.v[i] * c.v[i])) / (qq.nrm * c.nrm) AS cos
         |      FROM n qq JOIN n c ON c.vec_id <> qq.vec_id WHERE qq.vec_id < $annQueryIds),
         |br AS (SELECT query_id, neighbor_id,
         |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk FROM bp),
         |bt AS (SELECT query_id, neighbor_id FROM br WHERE rnk <= $ivfK),
         |h AS (SELECT bt.query_id, count(*) AS n_hits
         |      FROM bt JOIN it USING (query_id, neighbor_id) GROUP BY bt.query_id),
         |qs AS (SELECT DISTINCT query_id FROM bt)
         |SELECT qs.query_id, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
         |  ${r6s(s"CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / $ivfK")} AS recall
         |FROM qs LEFT JOIN h USING (query_id) ORDER BY query_id""".stripMargin
    })

  // ----------------------------------------------------------------- text

  private def inList(items: Seq[String]): String =
    items.map(s => s"'$s'").mkString("(", ",", ")")

  private val textQuality = CatalogEntry(
    "text_quality",
    (s, dir) => {
      val q = TextAnalysis.qualityScore(QuerySupport.table(s, dir, "documents"))
      q.select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        r6(col("ttr")).as("ttr"), r6(col("avg_token_len")).as("avg_token_len"),
        r6(col("stop_ratio")).as("stop_ratio"), r6(col("quality")).as("quality"))
        .orderBy("doc_id")
    },
    Some(s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
            |m AS (SELECT doc_id, len(w) AS n_tokens, len(list_distinct(w)) AS n_distinct,
            |        list_sum(list_transform(w, t -> len(t))) AS tot_len,
            |        len(list_filter(w, t -> t IN ${inList(stopwords)})) AS n_stop FROM w)
            |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, CAST(n_distinct AS BIGINT) AS n_distinct,
            |  ${r6s("n_distinct / n_tokens")} AS ttr,
            |  ${r6s("tot_len / n_tokens")} AS avg_token_len,
            |  ${r6s("n_stop / n_tokens")} AS stop_ratio,
            |  ${r6s("0.4 * (n_distinct / n_tokens) + 0.3 * (1.0 - n_stop / n_tokens) + 0.3 * least(1.0, n_tokens / 50.0)")} AS quality
            |FROM m ORDER BY doc_id""".stripMargin))

  /** Curriculum packing — the curation -> training handoff: within
    * each source shard, documents lay onto the token axis in QUALITY
    * order (best first, the curriculum-learning layout) and cut into
    * budgeted sequences by the same single cumulative-sum window as
    * `pack_sequences`. The ordering key is the micro-quantized
    * heuristic quality (ties by doc id), so the permutation — and
    * with it every seq assignment — replays engine-identically.
    */
  private val packCurriculum = CatalogEntry(
    "pack_curriculum",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents")
      val q = TextAnalysis.qualityScore(d)
        .select(col("doc_id"),
          expr("cast(floor(quality * 1000000 + 0.5) as bigint)")
            .as("quality_micro"))
      val base = d.select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      val ordered = base.join(q, "doc_id")
        .withColumn("__ord",
          struct((-col("quality_micro")).as("nq"), col("doc_id").as("id")))
      Sampling.packSequences(ordered, keyCol = "source", orderCol = "__ord",
          tokenCol = "n_tokens", budget = 256L)
        .select("doc_id", "source", "n_tokens", "quality_micro",
          "seq_id", "seq_offset")
        .orderBy("doc_id")
    },
    Some(s"""WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
            |m AS (SELECT doc_id, source, len(w) AS n_tokens,
            |        len(list_distinct(w)) AS n_distinct,
            |        len(list_filter(w, t -> t IN ${inList(stopwords)})) AS n_stop
            |      FROM w),
            |q AS (SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
            |        CAST(floor((0.4 * (n_distinct / n_tokens)
            |          + 0.3 * (1.0 - n_stop / n_tokens)
            |          + 0.3 * least(1.0, n_tokens / 50.0)) * 1000000 + 0.5)
            |          AS BIGINT) AS quality_micro
            |      FROM m),
            |c AS (SELECT *, sum(n_tokens) OVER (PARTITION BY source
            |        ORDER BY quality_micro DESC, doc_id
            |        ROWS UNBOUNDED PRECEDING) AS cum FROM q)
            |SELECT doc_id, source, n_tokens, quality_micro,
            |  CAST((cum - n_tokens) // 256 AS BIGINT) AS seq_id,
            |  CAST((cum - n_tokens) % 256 AS BIGINT) AS seq_offset
            |FROM c ORDER BY doc_id""".stripMargin))

  /** Gopher rule-based quality filter (Rae et al. 2021 A1.1): every
    * ratio rule spelled as an exact integer cross-product on BOTH
    * sides, so the 7 flags + verdict hash-replay engine-identically.
    */
  private val textGopherRules = CatalogEntry(
    "text_gopher_rules",
    (s, dir) => TextAnalysis.gopherRules(QuerySupport.table(s, dir, "documents"))
      .orderBy("doc_id"),
    Some {
      val stops = TextAnalysis.gopherStops.map(s => s"'$s'").mkString(", ")
      s"""WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS w,
         |             string_split(text, chr(10)) AS l FROM documents),
         |m AS (SELECT doc_id,
         |        CAST(len(w) AS BIGINT) AS n_words,
         |        COALESCE(list_sum(list_transform(w, x -> len(x))), 0) AS chars,
         |        len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS alpha,
         |        len(text) - len(replace(text, '#', '')) AS hash,
         |        (len(text) - len(replace(text, '...', ''))) // 3 AS ell,
         |        len(l) AS nl,
         |        len(list_filter(l, x -> starts_with(ltrim(x), '-') OR starts_with(ltrim(x), '*') OR starts_with(ltrim(x), '•'))) AS bul,
         |        len(list_filter(l, x -> ends_with(rtrim(x), '...'))) AS elll,
         |        len(list_intersect(list_distinct(w), [$stops])) AS stop
         |      FROM w),
         |f AS (SELECT doc_id, n_words,
         |        CASE WHEN n_words >= 50 AND n_words <= 100000 THEN 1 ELSE 0 END AS r1_word_count,
         |        CASE WHEN chars >= 3 * n_words AND chars <= 10 * n_words THEN 1 ELSE 0 END AS r2_mean_word_len,
         |        CASE WHEN (hash + ell) * 10 < n_words THEN 1 ELSE 0 END AS r3_symbol_ratio,
         |        CASE WHEN bul * 10 < nl * 9 THEN 1 ELSE 0 END AS r4_bullet_lines,
         |        CASE WHEN elll * 10 < nl * 3 THEN 1 ELSE 0 END AS r5_ellipsis_lines,
         |        CASE WHEN alpha * 5 >= n_words * 4 THEN 1 ELSE 0 END AS r6_alpha_words,
         |        CASE WHEN stop >= 2 THEN 1 ELSE 0 END AS r7_stop_words
         |      FROM m)
         |SELECT doc_id, n_words,
         |  CAST(r1_word_count AS BIGINT) AS r1_word_count,
         |  CAST(r2_mean_word_len AS BIGINT) AS r2_mean_word_len,
         |  CAST(r3_symbol_ratio AS BIGINT) AS r3_symbol_ratio,
         |  CAST(r4_bullet_lines AS BIGINT) AS r4_bullet_lines,
         |  CAST(r5_ellipsis_lines AS BIGINT) AS r5_ellipsis_lines,
         |  CAST(r6_alpha_words AS BIGINT) AS r6_alpha_words,
         |  CAST(r7_stop_words AS BIGINT) AS r7_stop_words,
         |  CAST(7 - r1_word_count - r2_mean_word_len - r3_symbol_ratio - r4_bullet_lines
         |       - r5_ellipsis_lines - r6_alpha_words - r7_stop_words AS BIGINT) AS n_failed,
         |  CAST(CASE WHEN r1_word_count + r2_mean_word_len + r3_symbol_ratio + r4_bullet_lines
         |       + r5_ellipsis_lines + r6_alpha_words + r7_stop_words = 7 THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM f ORDER BY doc_id""".stripMargin
    })

  private val textLangid = CatalogEntry(
    "text_langid",
    (s, dir) => TextAnalysis.languageId(QuerySupport.table(s, dir, "documents"))
      .orderBy("doc_id"),
    Some {
      val langs = langMarkers.map(_._1)
      val scores = langMarkers
        .map { case (l, m) => s"len(list_filter(w, t -> t IN ${inList(m)})) AS s_$l" }
        .mkString(", ")
      val allZero = langs.map(l => s"s_$l = 0").mkString(" AND ")
      val branches = langs.zipWithIndex.dropRight(1).map { case (l, i) =>
        val geRest = langs.drop(i + 1).map(r => s"s_$l >= s_$r").mkString(" AND ")
        s"WHEN $geRest THEN '$l'"
      }.mkString(" ")
      val outs = langs.map(l => s"CAST(s_$l AS BIGINT) AS s_$l").mkString(", ")
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |s AS (SELECT doc_id, $scores FROM w)
         |SELECT doc_id, $outs,
         |  CASE WHEN $allZero THEN 'und' $branches ELSE '${langs.last}' END AS predicted_lang
         |FROM s ORDER BY doc_id""".stripMargin
    })

  /** Flesch readability: vowel-group syllables, terminator-count
    * sentences, exact integer counts, the fixed double formula at
    * the edge only.
    */
  private val textReadability = CatalogEntry(
    "text_readability",
    (s, dir) => TextAnalysis.readability(
        QuerySupport.table(s, dir, "documents"))
      .select(col("doc_id"), col("n_tokens"), col("n_sentences"),
        col("n_syllables"),
        r6(col("words_per_sentence")).as("words_per_sentence"),
        r6(col("syllables_per_word")).as("syllables_per_word"),
        r6(col("flesch")).as("flesch"))
      .orderBy("doc_id"),
    Some("""WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
           |m AS (SELECT doc_id,
           |        CAST(len(w) AS BIGINT) AS n_tokens,
           |        greatest(1, CAST(len(text) -
           |          len(replace(replace(replace(text, '.', ''), '!', ''), '?', ''))
           |          AS BIGINT)) AS n_sentences,
           |        CAST(list_sum(list_transform(w, x ->
           |          len(list_filter(range(1, greatest(len(x), 1) + 1), i ->
           |            substr(x, i, 1) IN ('a','e','i','o','u')
           |            AND (i = 1 OR NOT substr(x, i - 1, 1) IN ('a','e','i','o','u'))))))
           |          AS BIGINT) AS n_syllables
           |      FROM w)
           |SELECT doc_id, n_tokens, n_sentences, n_syllables,
           |  floor((CAST(n_tokens AS DOUBLE) / n_sentences) * 1000000.0 + 0.5) / 1000000.0 AS words_per_sentence,
           |  floor((CAST(n_syllables AS DOUBLE) / n_tokens) * 1000000.0 + 0.5) / 1000000.0 AS syllables_per_word,
           |  floor((206.835 - 1.015 * (CAST(n_tokens AS DOUBLE) / n_sentences)
           |    - 84.6 * (CAST(n_syllables AS DOUBLE) / n_tokens)) * 1000000.0 + 0.5) / 1000000.0 AS flesch
           |FROM m ORDER BY doc_id""".stripMargin))

  /** Language-ID confusion matrix: langid CTEs joined to the declared
    * label, two grain-bounded aggregates, exact integer row shares.
    */
  private val textLangidConfusion = CatalogEntry(
    "text_langid_confusion",
    (s, dir) => TextAnalysis.langidConfusion(
        QuerySupport.table(s, dir, "documents"))
      .orderBy("true_lang", "predicted_lang"),
    Some {
      val langs = langMarkers.map(_._1)
      val scores = langMarkers
        .map { case (l, m) => s"len(list_filter(w, t -> t IN ${inList(m)})) AS s_$l" }
        .mkString(", ")
      val allZero = langs.map(l => s"s_$l = 0").mkString(" AND ")
      val branches = langs.zipWithIndex.dropRight(1).map { case (l, i) =>
        val geRest = langs.drop(i + 1).map(r => s"s_$l >= s_$r").mkString(" AND ")
        s"WHEN $geRest THEN '$l'"
      }.mkString(" ")
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |s AS (SELECT doc_id, $scores FROM w),
         |p AS (SELECT doc_id,
         |        CASE WHEN $allZero THEN 'und' $branches
         |        ELSE '${langs.last}' END AS predicted_lang
         |      FROM s),
         |c AS (SELECT d.lang AS true_lang, p.predicted_lang,
         |        count(*) AS n_docs
         |      FROM documents d JOIN p USING (doc_id) GROUP BY 1, 2),
         |t AS (SELECT true_lang, sum(n_docs) AS tt FROM c GROUP BY 1)
         |SELECT c.true_lang, c.predicted_lang,
         |  CAST(n_docs AS BIGINT) AS n_docs,
         |  CAST(n_docs * 1000000 // tt AS BIGINT) AS row_share_micro
         |FROM c JOIN t USING (true_lang)
         |ORDER BY true_lang, predicted_lang""".stripMargin
    })

  /** Per-line language mix: the oracle replays the line explode, the
    * marker scorer per line, and the (count desc, lang asc) dominant
    * pick.
    */
  private val textLangMix = CatalogEntry(
    "text_lang_mix",
    (s, dir) => TextAnalysis.languageMix(QuerySupport.table(s, dir, "documents"))
      .orderBy("doc_id"),
    Some {
      val langs = langMarkers.map(_._1)
      val scores = langMarkers
        .map { case (l, m) => s"len(list_filter(w, t -> t IN ${inList(m)})) AS s_$l" }
        .mkString(", ")
      val allZero = langs.map(l => s"s_$l = 0").mkString(" AND ")
      val branches = langs.zipWithIndex.dropRight(1).map { case (l, i) =>
        val geRest = langs.drop(i + 1).map(r => s"s_$l >= s_$r").mkString(" AND ")
        s"WHEN $geRest THEN '$l'"
      }.mkString(" ")
      s"""WITH ln0 AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line
         |            FROM documents),
         |lw AS (SELECT doc_id, string_split(line, ' ') AS w FROM ln0),
         |ls AS (SELECT doc_id, $scores FROM lw),
         |lp AS (SELECT doc_id,
         |         CASE WHEN $allZero THEN 'und' $branches
         |              ELSE '${langs.last}' END AS predicted_lang
         |       FROM ls),
         |lc AS (SELECT doc_id, predicted_lang, count(*) AS n FROM lp
         |       GROUP BY doc_id, predicted_lang),
         |lr AS (SELECT *, row_number() OVER (PARTITION BY doc_id
         |         ORDER BY n DESC, predicted_lang) AS rk FROM lc)
         |SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_lines,
         |  CAST(sum(CASE WHEN predicted_lang <> 'und' THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_langs,
         |  max(CASE WHEN rk = 1 THEN predicted_lang END) AS dominant_lang,
         |  CAST(max(CASE WHEN rk = 1 THEN n END) AS BIGINT) AS dominant_lines,
         |  sum(CASE WHEN predicted_lang <> 'und' THEN 1 ELSE 0 END) >= 2
         |    AS mixed
         |FROM lr GROUP BY doc_id ORDER BY doc_id""".stripMargin
    })

  /** Exact-k-per-stratum weighted sample: same A-ES draw as
    * `sample_weighted`, ranked inside each language.
    */
  private val sampleWeightedStratified = CatalogEntry(
    "sample_weighted_stratified",
    (s, dir) => Sampling.sampleWeightedPerStratum(
        QuerySupport.table(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            size(split(col("text"), " ")).cast("long").as("w")),
        idCol = "doc_id", stratumCol = "lang", weightCol = "w", k = 25)
      .orderBy("stratum", "rank"),
    Some {
      val md5s = "md5('wsamp:' || CAST(doc_id AS VARCHAR))"
      val hi = hexDecode4(s"substr($md5s, 1, 4)", posFn = "strpos", substrFn = "substr")
      val lo = hexDecode4(s"substr($md5s, 5, 4)", posFn = "strpos", substrFn = "substr")
      s"""WITH d AS (SELECT lang AS stratum, doc_id,
         |        CAST(len(string_split(text, ' ')) AS BIGINT) AS weight,
         |        ($hi) * 65536 + ($lo) AS hv
         |      FROM documents),
         |kk AS (SELECT stratum, doc_id, weight,
         |         CAST(floor(-ln((hv + 1) / 4294967296.0)
         |           * 1000000000000.0 / weight) AS BIGINT) AS key_pico
         |       FROM d WHERE weight > 0),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY stratum
         |         ORDER BY key_pico, doc_id) AS rank FROM kk)
         |SELECT stratum, doc_id, weight, key_pico, CAST(rank AS BIGINT) AS rank
         |FROM rk WHERE rank <= 25 ORDER BY stratum, rank""".stripMargin
    })

  /** Char-entropy gibberish screen: the oracle replays the per-char
    * histogram and the per-term micro-nat quantization.
    */
  private val textCharEntropy = CatalogEntry(
    "text_char_entropy",
    (s, dir) => TextAnalysis.charEntropy(QuerySupport.table(s, dir, "documents"))
      .orderBy("doc_id"),
    Some("""WITH ch AS (SELECT doc_id,
           |         unnest(list_transform(range(1, len(text) + 1),
           |           i -> substr(text, i, 1))) AS c
           |       FROM documents),
           |cc AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY doc_id, c),
           |cn AS (SELECT *, sum(n) OVER (PARTITION BY doc_id) AS nt FROM cc),
           |ct AS (SELECT doc_id, nt,
           |         CAST(floor(n * ln(CAST(nt AS DOUBLE) / n) * 1000000 + 0.5)
           |           AS BIGINT) AS t
           |       FROM cn)
           |SELECT doc_id, CAST(max(nt) AS BIGINT) AS n_chars,
           |  CAST(count(*) AS BIGINT) AS n_distinct_chars,
           |  CAST(sum(t) // max(nt) AS BIGINT) AS entropy_micro
           |FROM ct GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  private val textFingerprint = CatalogEntry(
    "text_fingerprint",
    (s, dir) => TextAnalysis.fingerprint(QuerySupport.table(s, dir, "documents"))
      .orderBy("doc_id"),
    Some {
      val g = fingerprintGram
      val pick = (1 to fingerprintK).map(i => s"h[$i]").mkString(" || ")
      s"""WITH g AS (SELECT doc_id, list_transform(range(1, greatest(len(text) - ${g - 2}, 1), $fingerprintStride), i -> substr(text, i, $g)) AS g FROM documents),
         |h AS (SELECT doc_id, len(g) AS n_grams, list_sort(list_distinct(list_transform(g, x -> md5(x)))) AS h FROM g)
         |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams, md5($pick) AS fingerprint
         |FROM h ORDER BY doc_id""".stripMargin
    })

  private val textTokenCount = CatalogEntry(
    "text_token_count",
    (s, dir) => {
      val t = TextAnalysis.tokenCounts(QuerySupport.table(s, dir, "documents"))
      t.select(col("doc_id"), col("n_ws_tokens"), col("n_bpe_tokens"),
        r6(col("tokens_per_100_chars")).as("tokens_per_100_chars"))
        .orderBy("doc_id")
    },
    Some(s"""SELECT doc_id,
            |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
            |  CAST(len(regexp_extract_all(text, '${TextAnalysis.bpePattern}')) AS BIGINT) AS n_bpe_tokens,
            |  ${r6s(s"len(regexp_extract_all(text, '${TextAnalysis.bpePattern}')) * 100.0 / len(text)")} AS tokens_per_100_chars
            |FROM documents ORDER BY doc_id""".stripMargin))

  private val textTokensFreq = CatalogEntry(
    "text_tokens_freq",
    (s, dir) => TextAnalysis.tokenFrequency(QuerySupport.table(s, dir, "documents")),
    Some("""WITH t AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
           |SELECT token, count(*) AS cnt FROM t GROUP BY token
           |ORDER BY cnt DESC, token LIMIT 50""".stripMargin))

  /** Shared curation CTE chain ending in
    * `cur(doc_id, predicted_lang, quality)` — quality/langid scoring,
    * LSH near-dup roots (recursive reachability), survivors only.
    */
  private val curationCtes: String = {
    val langs = langMarkers.map(_._1)
    val scores = langMarkers
      .map { case (l, m) => s"len(list_filter(w, t -> t IN ${inList(m)})) AS s_$l" }
      .mkString(", ")
    val allZero = langs.map(l => s"s_$l = 0").mkString(" AND ")
    val branches = langs.zipWithIndex.dropRight(1).map { case (l, i) =>
      val geRest = langs.drop(i + 1).map(r => s"s_$l >= s_$r").mkString(" AND ")
      s"WHEN $geRest THEN '$l'"
    }.mkString(" ")
    s"""$minhashCtes,
       |ds AS (SELECT doc_id, list_distinct(sh) AS s FROM sh),
       |vp AS (SELECT c.doc_a, c.doc_b
       |       FROM cand c JOIN ds a ON a.doc_id = c.doc_a JOIN ds b ON b.doc_id = c.doc_b
       |       WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |             / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= $jaccardThreshold),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM vp UNION SELECT doc_b, doc_a FROM vp),
       |reach AS (SELECT a, b FROM edges
       |          UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       |roots AS (SELECT a AS doc_id, least(a, min(b)) AS root_id FROM reach GROUP BY a),
       |m AS (SELECT doc_id, len(w) AS n_tokens, len(list_distinct(w)) AS n_distinct,
       |        len(list_filter(w, t -> t IN ${inList(stopwords)})) AS n_stop, $scores FROM w),
       |scored AS (SELECT doc_id,
       |    0.4 * (n_distinct / n_tokens) + 0.3 * (1.0 - n_stop / n_tokens)
       |      + 0.3 * least(1.0, n_tokens / 50.0) AS quality,
       |    CASE WHEN $allZero THEN 'und' $branches ELSE '${langs.last}' END AS predicted_lang
       |  FROM m),
       |cur AS (SELECT s.doc_id, s.predicted_lang, s.quality
       |        FROM scored s LEFT JOIN roots r USING (doc_id)
       |        WHERE s.quality >= 0.70 AND s.predicted_lang = 'en'
       |          AND coalesce(r.root_id, s.doc_id) = s.doc_id)""".stripMargin
  }

  private val textCuration = CatalogEntry(
    "text_curation",
    (s, dir) => {
      val c = TextAnalysis.curate(QuerySupport.table(s, dir, "documents"),
        minQuality = 0.70, langs = Seq("en"))
      c.select(col("doc_id"), col("predicted_lang"), r6(col("quality")).as("quality"))
        .orderBy("doc_id")
    },
    Some(s"""WITH RECURSIVE $curationCtes
            |SELECT doc_id, predicted_lang, ${r6s("quality")} AS quality
            |FROM cur ORDER BY doc_id""".stripMargin))

  /** The composed pretraining curation pipeline in ONE call: curate
    * (quality + language + near-dup roots) -> join source/token counts
    * -> deterministic per-source downsampling -> concat-and-chunk
    * sequence packing. Each stage is the already-oracled operator; the
    * composition proves they chain hash-exactly — the "a user runs the
    * whole pipeline" flagship. Plan cost = curation's (one sketch, one
    * band join) + one sample filter (row-local) + one packing window.
    */
  private val pretrainPipeline = CatalogEntry(
    "pretrain_pipeline",
    (s, dir) => {
      val docs = QuerySupport.table(s, dir, "documents")
      val curated = TextAnalysis.curate(docs, minQuality = 0.70, langs = Seq("en"))
        .select("doc_id", "predicted_lang", "quality")
      val enr = curated.join(
        docs.select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens")), "doc_id")
      val sampled = Sampling.sampleStratified(enr, idCol = "doc_id",
        stratumCol = "source", fractions = pipelineSourceFractions,
        defaultFraction = pipelineDefaultFraction)
      Sampling.packSequences(sampled, keyCol = "source", orderCol = "doc_id",
          tokenCol = "n_tokens", budget = packBudget)
        .select(col("doc_id"), col("source"), col("predicted_lang"),
          r6(col("quality")).as("quality"), col("n_tokens"),
          col("seq_id"), col("seq_offset"))
        .orderBy("doc_id")
    },
    Some {
      val branches = pipelineSourceFractions.toSeq.sortBy(_._1).map { case (src, f) =>
        s"WHEN source = '$src' THEN '${Sampling.hexThreshold(f)}'"
      }.mkString(" ")
      val thr = s"CASE $branches ELSE '${Sampling.hexThreshold(pipelineDefaultFraction)}' END"
      s"""WITH RECURSIVE $curationCtes,
         |enr AS (SELECT c.doc_id, d.source, c.predicted_lang, c.quality,
         |          CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
         |        FROM cur c JOIN documents d USING (doc_id)),
         |samp AS (SELECT * FROM enr
         |         WHERE substr(md5('samp:' || CAST(doc_id AS VARCHAR)), 1, 8) < $thr
         |            OR $thr = 'ffffffff'),
         |pk AS (SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |                                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |       FROM samp)
         |SELECT doc_id, source, predicted_lang, ${r6s("quality")} AS quality, n_tokens,
         |       (cum - n_tokens) // $packBudget AS seq_id,
         |       (cum - n_tokens) % $packBudget AS seq_offset
         |FROM pk ORDER BY doc_id""".stripMargin
    })

  private val textRepetition = CatalogEntry(
    "text_repetition",
    (s, dir) => {
      val t = TextAnalysis.repetitionSignals(QuerySupport.table(s, dir, "documents"))
      t.select(col("doc_id"), col("n_tokens"),
        r6(col("dup_word_frac")).as("dup_word_frac"),
        r6(col("top_2gram_frac")).as("top_2gram_frac"),
        r6(col("top_3gram_frac")).as("top_3gram_frac"),
        col("rep_flagged"))
        .orderBy("doc_id")
    },
    Some {
      def grams(k: Int): String = {
        val cat = (0 until k).map(o => s"w[i+$o]").mkString(" || ' ' || ")
        s"CASE WHEN len(w) >= $k THEN list_transform(range(1, len(w) - ${k - 2}), i -> $cat) ELSE []::VARCHAR[] END"
      }
      def topCount(g: String): String =
        s"coalesce(list_max(list_transform(list_distinct($g), g -> len(list_filter($g, x -> x = g)))), 0)"
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |m AS (SELECT doc_id, len(w) AS n, len(list_distinct(w)) AS nd,
         |        ${grams(2)} AS g2, ${grams(3)} AS g3 FROM w),
         |t AS (SELECT doc_id, n,
         |        1.0 - nd * 1.0 / n AS dw,
         |        ${topCount("g2")} * 2.0 / n AS t2,
         |        ${topCount("g3")} * 3.0 / n AS t3
         |      FROM m)
         |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
         |  ${r6s("dw")} AS dup_word_frac, ${r6s("t2")} AS top_2gram_frac,
         |  ${r6s("t3")} AS top_3gram_frac,
         |  (dw > $repDupWordMax OR t2 > $repTop2GramMax) AS rep_flagged
         |FROM t ORDER BY doc_id""".stripMargin
    })

  /** PII is injected deterministically (same expression in both
    * engines) so the scrub has matches to find on the synthetic
    * corpus: every 7th doc gains an email, every 11th a phone number.
    */
  private val textPiiRedact = CatalogEntry(
    "text_pii_redact",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents").select("doc_id", "text")
      val injected = d.withColumn("text",
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" reach user"),
            col("doc_id").cast("string"), lit("@mail.com")))
          .when(col("doc_id") % 11 === 0,
            concat(col("text"), lit(" call 555-867-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(col("text")))
      TextAnalysis.redactPii(injected).orderBy("doc_id")
    },
    Some(s"""WITH c AS (SELECT doc_id,
            |  CASE WHEN doc_id % 7 = 0 THEN text || ' reach user' || CAST(doc_id AS VARCHAR) || '@mail.com'
            |       WHEN doc_id % 11 = 0 THEN text || ' call 555-867-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
            |       ELSE text END AS text
            |  FROM documents)
            |SELECT doc_id,
            |  CAST(len(regexp_extract_all(text, '$emailPattern')) AS BIGINT) AS n_emails,
            |  CAST(len(regexp_extract_all(text, '$phonePattern')) AS BIGINT) AS n_phones,
            |  regexp_replace(regexp_replace(text, '$emailPattern', '<EMAIL>', 'g'),
            |                 '$phonePattern', '<PHONE>', 'g') AS redacted
            |FROM c ORDER BY doc_id""".stripMargin))

  /** Per-source PII density over the same deterministic injection as
    * text_pii_redact: exact counts and matches-per-million-tokens.
    */
  private val textPiiDensity = CatalogEntry(
    "text_pii_density",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents")
        .select("doc_id", "text", "source")
      val injected = d.withColumn("text",
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" reach user"),
            col("doc_id").cast("string"), lit("@mail.com")))
          .when(col("doc_id") % 11 === 0,
            concat(col("text"), lit(" call 555-867-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(col("text")))
      TextAnalysis.piiDensity(injected).orderBy("source")
    },
    Some(s"""WITH c AS (SELECT doc_id, source,
            |  CASE WHEN doc_id % 7 = 0 THEN text || ' reach user' || CAST(doc_id AS VARCHAR) || '@mail.com'
            |       WHEN doc_id % 11 = 0 THEN text || ' call 555-867-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
            |       ELSE text END AS text
            |  FROM documents),
            |p AS (SELECT doc_id, source,
            |  CAST(len(regexp_extract_all(text, '$emailPattern')) AS BIGINT) AS ne,
            |  CAST(len(regexp_extract_all(text, '$phonePattern')) AS BIGINT) AS np,
            |  CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
            |  FROM c)
            |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
            |  CAST(sum(CASE WHEN ne + np > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_pii,
            |  CAST(sum(ne) AS BIGINT) AS n_emails,
            |  CAST(sum(np) AS BIGINT) AS n_phones,
            |  CAST(sum(nt) AS BIGINT) AS n_tokens,
            |  CAST((sum(ne) + sum(np)) * 1000000 // greatest(sum(nt), 1) AS BIGINT) AS pii_per_mtoken
            |FROM p GROUP BY source ORDER BY source""".stripMargin))

  /** Deterministic stratified mixture sampling over the corpus: both
    * engines keep a doc iff the first 8 hex chars of
    * `md5('samp:' || doc_id)` fall under the stratum's threshold —
    * row-local, reproducible, partition-layout-independent.
    */
  private val sampleStratified = CatalogEntry(
    "sample_stratified",
    (s, dir) => Sampling.sampleStratified(
        QuerySupport.table(s, dir, "documents").select("doc_id", "lang", "n_chars"),
        idCol = "doc_id", stratumCol = "lang",
        fractions = mixtureFractions, defaultFraction = mixtureDefault)
      .orderBy("doc_id"),
    Some {
      val branches = mixtureFractions.toSeq.sortBy(_._1).map { case (l, f) =>
        s"WHEN lang = '$l' THEN '${Sampling.hexThreshold(f)}'"
      }.mkString(" ")
      val thr = s"CASE $branches ELSE '${Sampling.hexThreshold(mixtureDefault)}' END"
      s"""SELECT doc_id, lang, n_chars FROM documents
         |WHERE substr(md5('samp:' || CAST(doc_id AS VARCHAR)), 1, 8) < $thr
         |   OR $thr = 'ffffffff'
         |ORDER BY doc_id""".stripMargin
    })

  /** Balanced shard assignment: the snake over the size rank is pure
    * rank arithmetic, so the oracle replays it with one SQL window.
    */
  private val packShards = CatalogEntry(
    "pack_shards",
    (s, dir) => Sampling.assignShards(
        QuerySupport.table(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            size(split(col("text"), " ")).cast("long").as("n_tokens")),
        idCol = "doc_id", tokenCol = "n_tokens", nShards = 8)
      .orderBy("doc_id"),
    Some("""WITH d AS (SELECT doc_id, lang,
           |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           |  FROM documents),
           |r AS (SELECT *, row_number() OVER (ORDER BY n_tokens DESC, doc_id) - 1 AS size_rank
           |      FROM d)
           |SELECT doc_id, lang, n_tokens, CAST(size_rank AS BIGINT) AS size_rank,
           |  CAST(CASE WHEN size_rank % 16 < 8 THEN size_rank % 16
           |       ELSE 15 - size_rank % 16 END AS INT) AS shard
           |FROM r ORDER BY doc_id""".stripMargin))

  /** Token-budget subset selection: best documents first (n_chars
    * desc, doc_id tie-break — a total order, as the operator requires)
    * until the inclusive running token total hits the budget. The
    * oracle replays the distributed two-pass prefix sum as one SQL
    * window cumulative sum — same total order, same inclusive-<=
    * cutoff. Budget 10k tokens ≈ 37% of the sf0.01 corpus, so the cut
    * lands mid-corpus at every SF.
    */
  private val sampleTokenBudget = CatalogEntry(
    "sample_token_budget",
    (s, dir) => Sampling.selectByTokenBudget(
        QuerySupport.table(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"),
            size(split(col("text"), " ")).cast("long").as("n_tokens")),
        scoreCol = "n_chars", tokenCol = "n_tokens", tieCol = "doc_id",
        budget = 10000L)
      .orderBy("doc_id"),
    Some("""SELECT doc_id, lang, n_chars, n_tokens, cum_tokens FROM (
           |  SELECT doc_id, lang, n_chars,
           |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           |         CAST(SUM(len(string_split(text, ' ')))
           |              OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT) AS cum_tokens
           |  FROM documents)
           |WHERE cum_tokens <= 10000 ORDER BY doc_id""".stripMargin))

  // ---------------------------------------------------------- curation

  /** Benchmark decontamination: eval set = every 97th doc, train = the
    * rest; per-train-doc distinct-gram overlap with the eval set.
    */
  private val textDecontaminate = CatalogEntry(
    "text_decontaminate",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents")
      val ev = d.filter(col("doc_id") % 97 === 0).select("doc_id", "text")
      val tr = d.filter(col("doc_id") % 97 =!= 0).select("doc_id", "lang", "text")
      Curation.decontaminate(tr, ev)
        .select("doc_id", "lang", "n_contaminated_grams", "contaminated")
        .orderBy("doc_id")
    },
    Some {
      val sw = shingleWidth
      val cat = (0 until sw).map(o => s"w[i+$o]").mkString(" || ' ' || ")
      val shingle = s"list_transform(range(1, greatest(len(w) - ${sw - 2}, 1)), i -> $cat)"
      s"""WITH ev AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
         |tr AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 97 <> 0),
         |we AS (SELECT doc_id, string_split(text, ' ') AS w FROM ev),
         |eg AS (SELECT DISTINCT unnest($shingle) AS g FROM we),
         |wt AS (SELECT doc_id, string_split(text, ' ') AS w FROM tr),
         |tg AS (SELECT DISTINCT doc_id, unnest($shingle) AS g FROM wt),
         |hits AS (SELECT doc_id, count(*) AS n FROM tg JOIN eg USING (g) GROUP BY doc_id)
         |SELECT t.doc_id, t.lang,
         |       CAST(coalesce(h.n, 0) AS BIGINT) AS n_contaminated_grams,
         |       h.n IS NOT NULL AS contaminated
         |FROM tr t LEFT JOIN hits h USING (doc_id) ORDER BY doc_id""".stripMargin
    })

  /** Cluster-aware decontamination: the doc-level n-gram verdict
    * widened by a root_id window max over the oracled clustering chain
    * — a near-copy of a contaminated document is flagged even when the
    * perturbation shares no exact shingle with the eval set. Train and
    * eval are DISJOINT here, so the eval-MEMBERSHIP seed (ADVICE r12
    * #3) is live in this oracle: a cluster containing an eval doc is
    * contaminated even when no train member shares an exact eval gram.
    */
  private val textDecontaminateClusters = CatalogEntry(
    "text_decontaminate_clusters",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents")
      val ev = d.filter(col("doc_id") % 97 === 0).select("doc_id", "text")
      val tr = d.filter(col("doc_id") % 97 =!= 0).select("doc_id", "text")
      Curation.decontaminateClusters(tr, ev, Dedup.nearDupClusters(d))
        .orderBy("doc_id")
    },
    Some {
      val sw = shingleWidth
      val cat = (0 until sw).map(o => s"w2[i+$o]").mkString(" || ' ' || ")
      val shingle = s"list_transform(range(1, greatest(len(w2) - ${sw - 2}, 1)), i -> $cat)"
      s"""WITH RECURSIVE $clustersCtes,
         |cl AS (SELECT d.doc_id, coalesce(r.root_id, d.doc_id) AS root_id
         |       FROM documents d LEFT JOIN roots r USING (doc_id)),
         |ev AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
         |tr AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0),
         |we AS (SELECT doc_id, string_split(text, ' ') AS w2 FROM ev),
         |eg AS (SELECT DISTINCT unnest($shingle) AS g FROM we),
         |wt AS (SELECT doc_id, string_split(text, ' ') AS w2 FROM tr),
         |tg AS (SELECT DISTINCT doc_id, unnest($shingle) AS g FROM wt),
         |hits AS (SELECT doc_id, count(*) AS n FROM tg JOIN eg USING (g) GROUP BY doc_id),
         |f AS (SELECT t.doc_id, CAST(coalesce(h.n, 0) AS BIGINT) AS n_contaminated_grams,
         |        h.n IS NOT NULL AS contaminated
         |      FROM tr t LEFT JOIN hits h USING (doc_id)),
         |er AS (SELECT DISTINCT cl.root_id, TRUE AS eval_member
         |       FROM cl JOIN ev ON cl.doc_id = ev.doc_id)
         |SELECT f.doc_id, cl.root_id, f.n_contaminated_grams, f.contaminated,
         |  max(CASE WHEN f.contaminated THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY cl.root_id) = 1
         |  OR coalesce(er.eval_member, FALSE) AS cluster_contaminated
         |FROM f JOIN cl USING (doc_id)
         |LEFT JOIN er ON er.root_id = cl.root_id ORDER BY doc_id""".stripMargin
    })

  /** Eval-anchored decontamination: direct gram overlap + one-hop
    * (train, eval) near-dup verification — eval-linear pair work, the
    * production sibling of the cluster-exact spelling (the r17
    * zipf10 attribution: clustering is 638 s of v4's 724 s at 100×).
    */
  private val textDecontaminateAnchored = CatalogEntry(
    "text_decontaminate_anchored",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents")
      val ev = d.filter(col("doc_id") % 97 === 0).select("doc_id", "text")
      val tr = d.filter(col("doc_id") % 97 =!= 0).select("doc_id", "text")
      Curation.decontaminateAnchored(tr, ev).orderBy("doc_id")
    },
    Some {
      val sw = shingleWidth
      val cat = (0 until sw).map(o => s"wd[i+$o]").mkString(" || ' ' || ")
      val shingle = s"list_transform(range(1, greatest(len(wd) - ${sw - 2}, 1)), i -> $cat)"
      s"""WITH ev AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
         |tr AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0),
         |${minhashBandCtes("tr", "t")},
         |${minhashBandCtes("ev", "e")},
         |gwe AS (SELECT doc_id, string_split(text, ' ') AS wd FROM ev),
         |egr AS (SELECT DISTINCT unnest($shingle) AS g FROM gwe),
         |gwt AS (SELECT doc_id, string_split(text, ' ') AS wd FROM tr),
         |tgr AS (SELECT DISTINCT doc_id, unnest($shingle) AS g FROM gwt),
         |hits AS (SELECT doc_id, count(*) AS n FROM tgr JOIN egr USING (g) GROUP BY doc_id),
         |f AS (SELECT t.doc_id, CAST(coalesce(h.n, 0) AS BIGINT) AS n_contaminated_grams,
         |        h.n IS NOT NULL AS contaminated
         |      FROM tr t LEFT JOIN hits h USING (doc_id)),
         |cand AS (SELECT DISTINCT a.doc_id AS t, b.doc_id AS e
         |         FROM bandst a JOIN bandse b ON a.band = b.band AND a.key = b.key
         |           AND a.doc_id <> b.doc_id),
         |dst AS (SELECT doc_id, list_distinct(sht) AS s FROM sht),
         |dse AS (SELECT doc_id, list_distinct(she) AS s FROM she),
         |nd AS (SELECT DISTINCT cand.t AS doc_id
         |       FROM cand JOIN dst a ON a.doc_id = cand.t
         |         JOIN dse b ON b.doc_id = cand.e
         |       WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |             / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
         |             >= $jaccardThreshold)
         |SELECT f.doc_id, f.n_contaminated_grams, f.contaminated,
         |  nd.doc_id IS NOT NULL AS near_dup_eval,
         |  f.contaminated OR nd.doc_id IS NOT NULL AS flagged
         |FROM f LEFT JOIN nd USING (doc_id) ORDER BY doc_id""".stripMargin
    })

  /** Eval-side contamination audit over the same split as
    * text_decontaminate; counts are distinct-set cardinalities, the
    * fraction one fixed-order division.
    */
  private val contamReport = CatalogEntry(
    "text_contamination_report",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents")
      val ev = d.filter(col("doc_id") % 97 === 0).select("doc_id", "text")
      val tr = d.filter(col("doc_id") % 97 =!= 0).select("doc_id", "text")
      Curation.contaminationReport(tr, ev)
        .select(col("doc_id"), col("n_grams"), col("n_leaked"),
          r6(col("leak_frac")).as("leak_frac"), col("n_train_docs"))
        .orderBy("doc_id")
    },
    Some(contamReportOracle(evalPred = "doc_id % 97 = 0")))

  private def contamReportOracle(evalPred: String): String = {
    val sw = shingleWidth
    val cat = (0 until sw).map(o => s"w[i+$o]").mkString(" || ' ' || ")
    val shingle = s"list_transform(range(1, greatest(len(w) - ${sw - 2}, 1)), i -> $cat)"
    s"""WITH ev AS (SELECT doc_id, text FROM documents WHERE $evalPred),
       |tr AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0),
       |we AS (SELECT doc_id, string_split(text, ' ') AS w FROM ev),
       |eg AS (SELECT DISTINCT doc_id AS eid, unnest($shingle) AS g FROM we),
       |ng AS (SELECT eid, count(*) AS n_grams FROM eg GROUP BY eid),
       |wt AS (SELECT doc_id, string_split(text, ' ') AS w FROM tr),
       |tg AS (SELECT DISTINCT doc_id AS tid, unnest($shingle) AS g FROM wt),
       |pairs AS (SELECT eg.eid, eg.g, tg.tid FROM tg JOIN eg USING (g)),
       |lk AS (SELECT eid, count(*) AS n_leaked
       |       FROM (SELECT DISTINCT eid, g FROM pairs) GROUP BY eid),
       |sh AS (SELECT eid, count(*) AS n_train_docs
       |       FROM (SELECT DISTINCT eid, tid FROM pairs) GROUP BY eid)
       |SELECT e.doc_id,
       |  CAST(coalesce(ng.n_grams, 0) AS BIGINT) AS n_grams,
       |  CAST(coalesce(lk.n_leaked, 0) AS BIGINT) AS n_leaked,
       |  ${r6s("CASE WHEN coalesce(ng.n_grams, 0) = 0 THEN 0.0 ELSE CAST(coalesce(lk.n_leaked, 0) AS DOUBLE) / ng.n_grams END")} AS leak_frac,
       |  CAST(coalesce(sh.n_train_docs, 0) AS BIGINT) AS n_train_docs
       |FROM ev e LEFT JOIN ng ON ng.eid = e.doc_id
       |  LEFT JOIN lk ON lk.eid = e.doc_id
       |  LEFT JOIN sh ON sh.eid = e.doc_id
       |ORDER BY doc_id""".stripMargin
  }

  /** Eval-ANCHORED contamination report — the production spelling of
    * [[contamReport]] for reuse-heavy corpora: the report's
    * gram-equi-join pairs every eval doc with every train doc sharing
    * a gram, and on a boilerplate corpus (stock phrases → hot grams)
    * that product is quadratic BY CONTRACT — the rehearsal row
    * measured 486 s at zipf10 (cliff). Pairs scale linearly in the
    * eval-doc count, so the fix is a FIXED-SIZE eval anchor (the
    * known-item `doc_id < 5000` pattern, NOT a fractional sample,
    * which would only divide the quadratic constant): with the eval
    * side pinned, pair count tracks the TRAIN side alone — corpus-
    * linear, the text_decontaminate_anchored contract. Each anchored
    * doc's row is IDENTICAL to its full-report row — the audit is
    * per-eval-doc, so anchoring drops rows, never changes them.
    */
  private val contamReportSampled = CatalogEntry(
    "text_contamination_report_sampled",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents")
      val ev = d.filter(col("doc_id") % 97 === 0 && col("doc_id") < 5000)
        .select("doc_id", "text")
      val tr = d.filter(col("doc_id") % 97 =!= 0).select("doc_id", "text")
      Curation.contaminationReport(tr, ev)
        .select(col("doc_id"), col("n_grams"), col("n_leaked"),
          r6(col("leak_frac")).as("leak_frac"), col("n_train_docs"))
        .orderBy("doc_id")
    },
    Some(contamReportOracle(
      evalPred = "doc_id % 97 = 0 AND doc_id < 5000")))

  /** C4-style per-source cap: top 10 docs per source by n_chars desc,
    * doc_id tie-break.
    */
  private val sampleCapPerSource = CatalogEntry(
    "sample_cap_per_source",
    (s, dir) => Curation.capPerStratum(
        QuerySupport.table(s, dir, "documents").select("doc_id", "source", "n_chars"),
        stratumCol = "source", orderCol = "n_chars", tieCol = "doc_id", cap = 10)
      .orderBy("doc_id"),
    Some("""SELECT doc_id, source, n_chars FROM (
           |  SELECT doc_id, source, n_chars,
           |         row_number() OVER (PARTITION BY source
           |                            ORDER BY n_chars DESC, doc_id) AS rn
           |  FROM documents) WHERE rn <= 10 ORDER BY doc_id""".stripMargin))

  /** Temperature-scaled language mixture (alpha = 0.5, target keep
    * rate 0.5): keep probability ∝ count^(alpha-1), replayed in SQL
    * with the same sorted-stratum float fold and hex-threshold
    * arithmetic.
    */
  private val sampleTemperatureOracle: Option[String] =
    Some("""WITH c AS (SELECT lang, count(*) AS c FROM documents GROUP BY lang),
           |t AS (SELECT list_aggregate(list(pow(c, CAST(0.5 AS DOUBLE)) ORDER BY lang),
           |                            'sum') AS sumw,
           |             CAST(sum(c) AS DOUBLE) AS total FROM c),
           |p AS (SELECT lang,
           |             CAST(0.5 AS DOUBLE) * total / sumw * pow(c, CAST(0.5 AS DOUBLE)) / c AS p
           |      FROM c, t),
           |thr AS (SELECT lang,
           |               CASE WHEN p >= 1.0 THEN 'ffffffff'
           |                    ELSE printf('%08x',
           |                           least(CAST(floor(p * CAST(4294967296.0 AS DOUBLE)) AS BIGINT),
           |                                 4294967295)) END AS h
           |        FROM p)
           |SELECT d.doc_id, d.lang, d.source FROM documents d JOIN thr USING (lang)
           |WHERE substr(md5('samp:' || CAST(doc_id AS VARCHAR)), 1, 8) < h
           |   OR h = 'ffffffff'
           |ORDER BY doc_id""".stripMargin)

  /** Temperature-sweep planning table: nested-sqrt α weights (no
    * pow — sqrt is correctly-rounded on both engines), exact integer
    * ppm shares per α.
    */
  private val sampleTemperatureSweep = CatalogEntry(
    "sample_temperature_sweep",
    (s, dir) => Curation.temperatureSweep(
        QuerySupport.table(s, dir, "documents"))
      .orderBy(col("alpha_micro").desc, col("source")),
    Some("""WITH per AS (SELECT source,
           |        CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
           |      FROM documents GROUP BY source),
           |rows_ AS (
           |  SELECT CAST(1000000 AS BIGINT) AS alpha_micro, source, n_tokens,
           |         n_tokens AS weight FROM per
           |  UNION ALL
           |  SELECT CAST(500000 AS BIGINT), source, n_tokens,
           |         CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000 + 0.5)
           |           AS BIGINT) FROM per
           |  UNION ALL
           |  SELECT CAST(250000 AS BIGINT), source, n_tokens,
           |         CAST(floor(sqrt(sqrt(CAST(n_tokens AS DOUBLE))) * 1000000 + 0.5)
           |           AS BIGINT) FROM per),
           |tot AS (SELECT alpha_micro, CAST(sum(weight) AS BIGINT) AS tw
           |        FROM rows_ GROUP BY alpha_micro)
           |SELECT r.alpha_micro, r.source, r.n_tokens, r.weight,
           |  r.weight * 1000000 // greatest(t.tw, 1) AS share_ppm
           |FROM rows_ r JOIN tot t USING (alpha_micro)
           |ORDER BY alpha_micro DESC, source""".stripMargin))

  private val sampleTemperatureMix = CatalogEntry(
    "sample_temperature_mix",
    (s, dir) => Curation.temperatureSample(
        QuerySupport.table(s, dir, "documents").select("doc_id", "lang", "source"),
        idCol = "doc_id", stratumCol = "lang", alpha = 0.5, targetFraction = 0.5)
      .orderBy("doc_id"),
    sampleTemperatureOracle)

  /** The explicit-target mixture: src0 over-weighted past its natural
    * share (rate clamps at 1e6 = keep-all), src1 at roughly natural
    * (near the clamp), the rest thinned to a 10000-micro target —
    * both clamp branches and the thinning branch are hash-checked.
    */
  private val mixtureTargets: Map[String, Long] =
    Map("src0" -> 300000L, "src1" -> 100000L) ++
      (2 until 20).map(i => s"src$i" -> 10000L).toMap

  private val sampleMixtureRates = CatalogEntry(
    "sample_mixture_rates",
    (s, dir) => Curation.mixtureRates(
        QuerySupport.table(s, dir, "documents"), mixtureTargets)
      .orderBy("doc_id"),
    Some {
      val md5s = "md5('mix:' || CAST(doc_id AS VARCHAR))"
      val hi = hexDecode4(s"substr($md5s, 1, 4)", posFn = "strpos", substrFn = "substr")
      val lo = hexDecode4(s"substr($md5s, 5, 4)", posFn = "strpos", substrFn = "substr")
      val tw = mixtureTargets.toSeq.sortBy(_._1)
        .map { case (s, w) => s"WHEN '$s' THEN $w" }
        .mkString("CASE source ", " ", " ELSE 0 END")
      s"""WITH tk AS (SELECT doc_id, source,
         |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |      FROM documents),
         |ns AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS ns FROM tk GROUP BY source),
         |nt AS (SELECT CAST(sum(ns) AS BIGINT) AS nt FROM ns),
         |rt AS (SELECT source, least(1000000, ($tw) * nt.nt // ns.ns) AS rate_micro
         |       FROM ns, nt),
         |h AS (SELECT tk.doc_id, tk.source, tk.n_tokens, rt.rate_micro,
         |        ($hi) * 65536 + ($lo) AS hv
         |      FROM tk JOIN rt USING (source))
         |SELECT doc_id, source, n_tokens, CAST(rate_micro AS BIGINT) AS rate_micro,
         |  hv * 1000000 < rate_micro * 4294967296 AS keep
         |FROM h ORDER BY doc_id""".stripMargin
    })

  /** Epochs report over the same mixture targets: exact integer
    * allocation and epoch counts, the >4-epoch repetition flag.
    */
  private val sampleEpochsReport = CatalogEntry(
    "sample_epochs_report",
    (s, dir) => Curation.epochsReport(
        QuerySupport.table(s, dir, "documents"),
        budgetTokens = 10000000L, targetsMicro = mixtureTargets)
      .orderBy("source"),
    Some {
      val tw = mixtureTargets.toSeq.sortBy(_._1)
        .map { case (s, w) => s"WHEN '$s' THEN $w" }
        .mkString("CASE source ", " ", " ELSE 0 END")
      s"""WITH ns AS (SELECT source,
         |        CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
         |      FROM documents GROUP BY source),
         |t AS (SELECT source, n_tokens,
         |        CAST(($tw) AS BIGINT) AS target_micro FROM ns),
         |a AS (SELECT *, CAST(10000000 * target_micro // 1000000 AS BIGINT)
         |        AS alloc_tokens FROM t)
         |SELECT source, n_tokens, target_micro, alloc_tokens,
         |  CAST(alloc_tokens * 1000000 // greatest(n_tokens, 1) AS BIGINT)
         |    AS epochs_micro,
         |  alloc_tokens * 1000000 // greatest(n_tokens, 1) > 4000000
         |    AS over_4_epochs
         |FROM a ORDER BY source""".stripMargin
    })

  /** Seeded deterministic global shuffle: rank under md5('epoch0:'||id). */
  private val shuffleGlobal = CatalogEntry(
    "shuffle_global",
    (s, dir) => Curation.deterministicShuffle(
        QuerySupport.table(s, dir, "documents").select("doc_id", "lang"),
        idCol = "doc_id", seed = "epoch0")
      .select("doc_id", "lang", "shuffle_pos")
      .orderBy("doc_id"),
    Some("""SELECT doc_id, lang,
           |       row_number() OVER (ORDER BY md5('epoch0:' || CAST(doc_id AS VARCHAR)),
           |                          doc_id) - 1 AS shuffle_pos
           |FROM documents ORDER BY doc_id""".stripMargin))

  /** Shuffle-quality audit: per-source adjacent-same-pair counts in
    * the seeded shuffle order vs the exact random-permutation
    * expectation — adjacency via a pos+1 equi-join, never a
    * global-order window.
    */
  private val curationShuffleAudit = CatalogEntry(
    "curation_shuffle_audit",
    (s, dir) => Curation.shuffleAudit(
        QuerySupport.table(s, dir, "documents"))
      .orderBy("source"),
    Some("""WITH s AS (SELECT source,
           |        row_number() OVER (ORDER BY md5('epoch0:' || CAST(doc_id AS VARCHAR)),
           |                           doc_id) - 1 AS p
           |      FROM documents),
           |adj AS (SELECT a.source FROM s a JOIN s b ON b.p = a.p + 1
           |        WHERE b.source = a.source),
           |sm AS (SELECT source, CAST(count(*) AS BIGINT) AS n_adjacent_same
           |       FROM adj GROUP BY source),
           |per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
           |        FROM s GROUP BY source),
           |tt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s)
           |SELECT per.source, n_docs,
           |  coalesce(n_adjacent_same, 0) AS n_adjacent_same,
           |  n_docs * (n_docs - 1) * 1000000 // n AS expected_same_micro
           |FROM per LEFT JOIN sm USING (source) CROSS JOIN tt
           |ORDER BY source""".stripMargin))

  /** Padding-waste report: packed vs padded sequence counts and
    * utilization per language — pure ceil-division aggregates.
    */
  private val packPaddingWaste = CatalogEntry(
    "pack_padding_waste",
    (s, dir) => Sampling.packPaddingWaste(
        QuerySupport.table(s, dir, "documents")
          .select(col("lang"),
            size(split(col("text"), " ")).cast("long").as("n_tokens")),
        keyCol = "lang", tokenCol = "n_tokens", budget = packBudget)
      .orderBy("lang"),
    Some(s"""WITH d AS (SELECT lang,
            |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            |      FROM documents),
            |a AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
            |        CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
            |        CAST(sum((n_tokens + $packBudget - 1) // $packBudget)
            |          AS BIGINT) AS n_seqs_padded
            |      FROM d GROUP BY lang),
            |b AS (SELECT *, (n_tokens + $packBudget - 1) // $packBudget
            |        AS n_seqs_packed FROM a)
            |SELECT lang, n_docs, n_tokens, n_seqs_packed, n_seqs_padded,
            |  n_tokens * 1000000 // greatest(n_seqs_packed * $packBudget, 1)
            |    AS util_packed_micro,
            |  n_tokens * 1000000 // greatest(n_seqs_padded * $packBudget, 1)
            |    AS util_padded_micro
            |FROM b ORDER BY lang""".stripMargin))

  /** Concat-and-chunk packing assignment, sharded by language. */
  private val packSequences = CatalogEntry(
    "pack_sequences",
    (s, dir) => {
      val docs = QuerySupport.table(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
      Sampling.packSequences(docs, keyCol = "lang", orderCol = "doc_id",
          tokenCol = "n_tokens", budget = packBudget)
        .select("doc_id", "lang", "n_tokens", "seq_id", "seq_offset")
        .orderBy("doc_id")
    },
    Some(s"""WITH d AS (
            |  SELECT doc_id, lang,
            |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            |  FROM documents),
            |c AS (
            |  -- CAST: DuckDB window SUM() yields HUGEINT -> float64 in the
            |  -- verify bridge; Spark emits BIGINT.
            |  SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
            |                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
            |  FROM d)
            |SELECT doc_id, lang, n_tokens,
            |       (cum - n_tokens) // $packBudget AS seq_id,
            |       (cum - n_tokens) % $packBudget AS seq_offset
            |FROM c ORDER BY doc_id""".stripMargin))

  // ----------------------------------------------------------- multimodal

  private val multimodalMeta = CatalogEntry(
    "multimodal_meta",
    (s, dir) => {
      val media = Multimodal.asMediaTable(QuerySupport.table(s, dir, "documents"))
      Multimodal.metaProjection(media)
        .withColumnRenamed("media_id", "doc_id")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           |  md5(text) AS payload_md5,
           |  lower(hex(encode(substr(text, 1, 8)))) AS head_hex,
           |  CAST(64 + octet_length(encode(text)) % 512 AS BIGINT) AS fake_width,
           |  CAST(64 + (octet_length(encode(text)) // 7) % 512 AS BIGINT) AS fake_height
           |FROM documents ORDER BY doc_id""".stripMargin))

  /** Resolution-tier × aspect-class ingest panel over the (stub)
    * decoded dimensions: integer ppm aspect classes, pixel-count
    * tiers, one ≤ 9-cell rollup + broadcast total.
    */
  private val multimodalDimsStats = CatalogEntry(
    "multimodal_dims_stats",
    (s, dir) => Multimodal.dimsStats(
      Multimodal.asMediaTable(QuerySupport.table(s, dir, "documents"))),
    Some("""WITH m AS (SELECT
           |        CAST(64 + octet_length(encode(text)) % 512 AS BIGINT) AS w,
           |        CAST(64 + (octet_length(encode(text)) // 7) % 512 AS BIGINT) AS h
           |      FROM documents),
           |c AS (SELECT
           |        CASE WHEN w * h < 16384 THEN 'small'
           |          WHEN w * h < 147456 THEN 'medium'
           |          ELSE 'large' END AS size_tier,
           |        CASE WHEN w * 1000000 // h < 950000 THEN 'portrait'
           |          WHEN w * 1000000 // h > 1052631 THEN 'landscape'
           |          ELSE 'square' END AS aspect_class,
           |        w, h
           |      FROM m),
           |g AS (SELECT size_tier, aspect_class, count(*) AS n_items,
           |        sum(w) AS sw, sum(h) AS sh
           |      FROM c GROUP BY 1, 2),
           |t AS (SELECT sum(n_items) AS t FROM g)
           |SELECT size_tier, aspect_class, CAST(n_items AS BIGINT) AS n_items,
           |  CAST(n_items * 1000000 // t.t AS BIGINT) AS share_ppm,
           |  CAST(sw // n_items AS BIGINT) AS avg_width,
           |  CAST(sh // n_items AS BIGINT) AS avg_height
           |FROM g, t ORDER BY size_tier, aspect_class""".stripMargin))

  /** Perceptual-hash near-dup oracle: replays the positional byte
    * decode, integer mean, band packing, band-bucket candidates (with
    * the star cap), and popcount verify over a corpus with injected
    * exact copies and one-character edits.
    */
  private def phashDedupQuery(cap: Int)(s: SparkSession, dir: String): DataFrame = {
    val d = QuerySupport.table(s, dir, "documents").select("doc_id", "text")
    val corpus = d
      .union(d.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      .union(d.filter(col("doc_id") % 9 === 0)
        .select((col("doc_id") + 3000000).as("doc_id"),
          expr("concat(substring(text, 1, 4), 'q', substring(text, 6))")
            .as("text")))
    Multimodal.phashDedup(Multimodal.asMediaTable(corpus), maxBucket = cap)
      .orderBy("media_a", "media_b")
  }

  private val multimodalPhashDedup = CatalogEntry(
    "multimodal_phash_dedup",
    phashDedupQuery(lshMaxBucket),
    Some(phashDedupOracle(lshMaxBucket)))

  /** [[multimodalPhashDedup]] with the hot-bucket cap tightened to the
    * scale knob — the `dedup_containment_tight` contract for the
    * perceptual family: on a corpus of near-identical frames the band
    * buckets hold most of the corpus and pair-expand by occupancy^2
    * up to the cap; the tight cap is the production setting, measured
    * next to the default in PLANS.md.
    */
  private val multimodalPhashDedupTight = CatalogEntry(
    "multimodal_phash_dedup_tight",
    phashDedupQuery(20),
    Some(phashDedupOracle(20)))

  private def phashByteSql(i: Int): String = {
    val hexMap = "0123456789ABCDEF"
    s"CASE WHEN len >= $i THEN (strpos('$hexMap', substr(hx, ${2 * i - 1}, 1)) - 1) * 16" +
      s" + (strpos('$hexMap', substr(hx, ${2 * i}, 1)) - 1) ELSE 0 END AS y$i"
  }

  /** Shared perceptual-dedup oracle prefix: the injected corpus
    * (exact copies + one-char edits) and the positional byte decode
    * `yb` both hash families read.
    */
  private lazy val phashCorpusCtes: String = {
    val byteCols = (1 to phashBytes).map(phashByteSql).mkString(",\n|  ")
    s"""corpus AS (
       |  SELECT doc_id AS media_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS media_id, text FROM documents
       |  WHERE doc_id % 5 = 0
       |  UNION ALL
       |  SELECT doc_id + 3000000 AS media_id,
       |    substr(text, 1, 4) || 'q' || substr(text, 6) AS text
       |  FROM documents WHERE doc_id % 9 = 0),
       |hx AS (SELECT media_id, hex(encode(text)) AS hx,
       |         octet_length(encode(text)) AS len FROM corpus),
       |yb AS (SELECT media_id,
       |  $byteCols
       |  FROM hx)""".stripMargin
  }

  /** aHash band frame `bd` from `yb`: integer mean threshold. */
  private lazy val ahashBandCtes: String = {
    val meanSql = (1 to phashBytes).map(i => s"y$i").mkString("(", " + ", s") // $phashBytes")
    val bandCols = (0 until phashBands).map { j =>
      val terms = (1 to phashBandBits).map { p =>
        val i = j * phashBandBits + p
        s"CASE WHEN y$i > mean THEN ${1 << (p - 1)} ELSE 0 END"
      }.mkString(" + ")
      s"$terms AS b$j"
    }.mkString(",\n|  ")
    s"""mn AS (SELECT *, $meanSql AS mean FROM yb),
       |bd AS (SELECT media_id,
       |  $bandCols
       |  FROM mn)""".stripMargin
  }

  /** DCT-pHash band frame `bd` from `yb`: the separable integer
    * DCT-II replay — G then F stages against the SAME micro-quantized
    * basis constants as [[Multimodal.dctPhashBands]], median as order
    * statistic 32 of the 63 exact AC integers, band packing with the
    * DC bit pinned 0.
    */
  private lazy val dctBandCtes: String = {
    val q = Multimodal.dctQ
    val gCols = (for (u <- 0 until 8; c <- 0 until 8) yield {
      val terms = (0 until 8)
        .map(r => s"CAST(y${8 * r + c + 1} AS BIGINT) * ${q(u)(r)}").mkString(" + ")
      s"$terms AS g_${u}_$c"
    }).mkString(",\n|  ")
    val fCols = (for (u <- 0 until 8; v <- 0 until 8) yield {
      val terms = (0 until 8)
        .map(c => s"g_${u}_$c * ${q(v)(c)}").mkString(" + ")
      s"$terms AS f_${u}_$v"
    }).mkString(",\n|  ")
    val acList = (for (u <- 0 until 8; v <- 0 until 8 if u != 0 || v != 0)
      yield s"f_${u}_$v").mkString(", ")
    val bandCols = (0 until phashBands).map { j =>
      val terms = (1 to phashBandBits).map { p =>
        val idx = j * phashBandBits + p - 1
        val u = idx / 8
        val v = idx % 8
        if (u == 0 && v == 0) "0"
        else s"CASE WHEN f_${u}_$v > med THEN ${1 << (p - 1)} ELSE 0 END"
      }.mkString(" + ")
      s"$terms AS b$j"
    }.mkString(",\n|  ")
    s"""gs AS (SELECT media_id,
       |  $gCols
       |  FROM yb),
       |fs AS (SELECT media_id,
       |  $fCols
       |  FROM gs),
       |md AS (SELECT *, list_sort([$acList])[32] AS med FROM fs),
       |bd AS (SELECT media_id,
       |  $bandCols
       |  FROM md)""".stripMargin
  }

  /** Band-keyed candidate join + popcount verify from `bd` to the
    * verified pair frame `hm` — shared by both hash families.
    */
  private def bandJoinCtes(cap: Int): String = {
    val bandRows = (0 until phashBands)
      .map(j => s"SELECT media_id, $j AS band, b$j AS key FROM bd")
      .mkString("\n|  UNION ALL ")
    val hamSql = (0 until phashBands)
      .map(j => s"bit_count(xor(pa.b$j, pb.b$j))").mkString(" + ")
    s"""k AS ($bandRows),
       |st AS (SELECT band, key, count(*) AS n, min(media_id) AS rep
       |       FROM k GROUP BY 1, 2),
       |kk AS (SELECT k.media_id, k.band, k.key, st.n, st.rep
       |       FROM k JOIN st USING (band, key)),
       |cand AS (
       |  SELECT a.media_id AS media_a, b.media_id AS media_b
       |  FROM kk a JOIN kk b
       |    ON a.band = b.band AND a.key = b.key AND a.media_id < b.media_id
       |  WHERE a.n <= $cap
       |  UNION
       |  SELECT rep AS media_a, media_id AS media_b FROM kk
       |  WHERE n > $cap AND media_id <> rep),
       |hm AS (SELECT media_a, media_b, CAST($hamSql AS BIGINT) AS hamming
       |       FROM cand
       |       JOIN bd pa ON pa.media_id = cand.media_a
       |       JOIN bd pb ON pb.media_id = cand.media_b)""".stripMargin
  }

  private def phashDedupOracle(cap: Int): String =
    s"""WITH $phashCorpusCtes,
       |$ahashBandCtes,
       |${bandJoinCtes(cap)}
       |SELECT media_a, media_b, hamming FROM hm
       |WHERE hamming <= $phashMaxHamming ORDER BY media_a, media_b""".stripMargin

  /** DCT-pHash near-dup pairs over the same injected corpus: the
    * separable integer DCT-II, exact median threshold, and banded
    * hamming join replay engine-identically (all-int64 arithmetic).
    */
  private val multimodalDctPhashDedup = CatalogEntry(
    "multimodal_dct_phash_dedup",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents").select("doc_id", "text")
      val corpus = d
        .union(d.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
        .union(d.filter(col("doc_id") % 9 === 0)
          .select((col("doc_id") + 3000000).as("doc_id"),
            expr("concat(substring(text, 1, 4), 'q', substring(text, 6))")
              .as("text")))
      Multimodal.dctPhashDedup(Multimodal.asMediaTable(corpus))
        .orderBy("media_a", "media_b")
    },
    Some {
      s"""WITH $phashCorpusCtes,
         |$dctBandCtes,
         |${bandJoinCtes(lshMaxBucket)}
         |SELECT media_a, media_b, hamming FROM hm
         |WHERE hamming <= $phashMaxHamming ORDER BY media_a, media_b""".stripMargin
    })

  /** PRODUCTION perceptual-dedup spelling: per-media keep verdict via
    * connected components over the aHash pair graph (recursive
    * min-label reachability in the oracle — the dedup_clusters
    * contract applied to the perceptual family).
    */
  private val multimodalPhashKeep = CatalogEntry(
    "multimodal_phash_keep",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents").select("doc_id", "text")
      val corpus = d
        .union(d.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
        .union(d.filter(col("doc_id") % 9 === 0)
          .select((col("doc_id") + 3000000).as("doc_id"),
            expr("concat(substring(text, 1, 4), 'q', substring(text, 6))")
              .as("text")))
      Multimodal.phashKeep(Multimodal.asMediaTable(corpus))
        .orderBy("media_id")
    },
    Some {
      s"""WITH RECURSIVE $phashCorpusCtes,
         |$ahashBandCtes,
         |${bandJoinCtes(lshMaxBucket)},
         |pp AS (SELECT media_a, media_b FROM hm
         |       WHERE hamming <= $phashMaxHamming),
         |edges AS (SELECT media_a AS a, media_b AS b FROM pp
         |          UNION SELECT media_b, media_a FROM pp),
         |reach AS (SELECT a, b FROM edges
         |          UNION
         |          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         |roots AS (SELECT a AS media_id, least(a, min(b)) AS root_id
         |          FROM reach GROUP BY a),
         |cl AS (SELECT c.media_id,
         |         coalesce(r.root_id, c.media_id) AS root_id
         |       FROM corpus c LEFT JOIN roots r USING (media_id)),
         |sz AS (SELECT root_id, CAST(count(*) AS BIGINT) AS n_members
         |       FROM cl GROUP BY root_id)
         |SELECT cl.media_id, cl.root_id, sz.n_members,
         |  cl.media_id = cl.root_id AS keep
         |FROM cl JOIN sz USING (root_id) ORDER BY cl.media_id""".stripMargin
    })

  /** Corrupt/truncated-payload audit over a constructed container
    * corpus: documents wrapped per doc_id as RIFF/WAVE (le32 size
    * field), BMP (le32 file size), PNG (± the IEND trailer), or raw
    * bytes, with deltas injected so every status appears. The Spark
    * side BUILDS the payloads (hex-assembled, unhex'd) and PARSES
    * them back positionally; the oracle replays the construction
    * arithmetic directly — agreement proves the parse inverts the
    * construction exactly.
    */
  /** The constructed container corpus both payload-integrity entries
    * parse: documents wrapped per doc_id as RIFF/WAVE (le32 size
    * field), BMP (le32 file size), PNG (± the IEND trailer), or raw
    * bytes, with deltas injected so every status appears.
    */
  private def auditMediaFixture(s: SparkSession, dir: String): DataFrame = {
    def le32hex(n: String): String =
      s"concat(lpad(hex(($n) % 256), 2, '0'), " +
        s"lpad(hex((($n) div 256) % 256), 2, '0'), " +
        s"lpad(hex((($n) div 65536) % 256), 2, '0'), " +
        s"lpad(hex((($n) div 16777216) % 256), 2, '0'))"
    QuerySupport.table(s, dir, "documents")
      .withColumn("__delta", expr(
        "CASE CAST(doc_id % 5 AS INT) WHEN 1 THEN 9 " +
          "WHEN 2 THEN -least(7, octet_length(text)) ELSE 0 END"))
      .select(col("doc_id").as("media_id"),
        expr(s"""unhex(CASE CAST(doc_id % 4 AS INT)
          | WHEN 0 THEN concat('52494646',
          |   ${le32hex("4 + octet_length(text) + __delta")},
          |   '57415645', hex(text))
          | WHEN 1 THEN concat('424D',
          |   ${le32hex("6 + octet_length(text) + __delta")}, hex(text))
          | WHEN 2 THEN concat('89504E470D0A1A0A', hex(text),
          |   CASE WHEN doc_id % 8 = 2
          |        THEN '0000000049454E44AE426082' ELSE '' END)
          | ELSE hex(text) END)""".stripMargin).as("payload"))
  }

  /** Oracle replay of [[auditMediaFixture]]'s construction arithmetic,
    * ending in `r` = (media_id, format, actual_len, declared_len,
    * status) — agreement with the Spark parse proves the positional
    * parse inverts the construction exactly.
    */
  private val payloadAuditCtes: String =
    """base AS (SELECT doc_id AS media_id,
      |    octet_length(encode(text)) AS L,
      |    CASE CAST(doc_id % 5 AS INT) WHEN 1 THEN 9
      |      WHEN 2 THEN -least(7, octet_length(encode(text)))
      |      ELSE 0 END AS delta,
      |    CAST(doc_id % 4 AS INT) AS fmt,
      |    doc_id % 8 = 2 AS trailer
      |  FROM documents),
      |r AS (SELECT media_id,
      |    CASE fmt WHEN 0 THEN 'riff/wave' WHEN 1 THEN 'bmp'
      |      WHEN 2 THEN 'png' ELSE 'unknown' END AS format,
      |    CASE fmt WHEN 0 THEN 12 + L WHEN 1 THEN 6 + L
      |      WHEN 2 THEN 8 + L + CASE WHEN trailer THEN 12 ELSE 0 END
      |      ELSE L END AS actual_len,
      |    CASE fmt WHEN 0 THEN 12 + L + delta
      |      WHEN 1 THEN 6 + L + delta ELSE NULL END AS declared_len,
      |    CASE WHEN fmt = 3 THEN 'unknown'
      |      WHEN fmt = 2 THEN
      |        CASE WHEN trailer THEN 'ok' ELSE 'truncated' END
      |      WHEN delta > 0 THEN 'truncated'
      |      WHEN delta < 0 THEN 'trailing' ELSE 'ok' END AS status
      |  FROM base)""".stripMargin

  private val multimodalPayloadAudit = CatalogEntry(
    "multimodal_payload_audit",
    (s, dir) => Multimodal.payloadAudit(auditMediaFixture(s, dir))
      .orderBy("media_id"),
    Some(s"""WITH $payloadAuditCtes
           |SELECT media_id, format, CAST(actual_len AS BIGINT) AS actual_len,
           |  CAST(declared_len AS BIGINT) AS declared_len, status,
           |  CAST(actual_len - declared_len AS BIGINT) AS delta_bytes
           |FROM r ORDER BY media_id""".stripMargin))

  /** Format × status integrity panel over the same constructed
    * container corpus: one map-side-combined rollup on the audit
    * projection + a broadcast total.
    */
  private val multimodalFormatReport = CatalogEntry(
    "multimodal_format_report",
    (s, dir) => Multimodal.formatReport(auditMediaFixture(s, dir)),
    Some(s"""WITH $payloadAuditCtes,
           |g AS (SELECT format, status, CAST(count(*) AS BIGINT) AS n_items,
           |        CAST(sum(actual_len) AS BIGINT) AS total_bytes
           |      FROM r GROUP BY 1, 2),
           |t AS (SELECT sum(n_items) AS t FROM g)
           |SELECT format, status, n_items, total_bytes,
           |  CAST(n_items * 1000000 // t.t AS BIGINT) AS share_ppm
           |FROM g, t ORDER BY format, status""".stripMargin))

  /** Aspect-bucketed pixel-budget batch packing over the (stub)
    * decoded dims: per (size_tier × aspect_class) bucket, items pack
    * in id order into ≤ 1 Mpx batches via the grouped distributed
    * prefix sums ([[Sampling.groupedPrefixSums]] — no per-bucket
    * single-task window); the oracle replays the assignment with a
    * per-bucket SQL window, proving the two-pass spelling equals the
    * sequential definition row for row.
    */
  private val multimodalAspectPack = CatalogEntry(
    "multimodal_aspect_pack",
    (s, dir) => Multimodal.aspectBucketPack(
        Multimodal.asMediaTable(QuerySupport.table(s, dir, "documents")),
        pixelBudget = 1000000L)
      .orderBy("media_id"),
    Some("""WITH m AS (SELECT doc_id AS media_id,
           |    CAST(64 + octet_length(encode(text)) % 512 AS BIGINT) AS w,
           |    CAST(64 + (octet_length(encode(text)) // 7) % 512 AS BIGINT) AS h
           |  FROM documents),
           |c AS (SELECT media_id,
           |    CASE WHEN w * h < 16384 THEN 'small'
           |      WHEN w * h < 147456 THEN 'medium'
           |      ELSE 'large' END AS size_tier,
           |    CASE WHEN w * 1000000 // h < 950000 THEN 'portrait'
           |      WHEN w * 1000000 // h > 1052631 THEN 'landscape'
           |      ELSE 'square' END AS aspect_class,
           |    w * h AS px
           |  FROM m),
           |p AS (SELECT media_id, size_tier, aspect_class, px,
           |    sum(px) OVER (PARTITION BY size_tier, aspect_class
           |                  ORDER BY media_id
           |                  ROWS UNBOUNDED PRECEDING) AS cum
           |  FROM c)
           |SELECT media_id, size_tier, aspect_class, CAST(px AS BIGINT) AS px,
           |  CAST((cum - px) // 1000000 AS BIGINT) AS batch_id,
           |  CAST((cum - px) % 1000000 AS BIGINT) AS batch_offset_px
           |FROM p ORDER BY media_id""".stripMargin))

  /** Packing-efficiency panel over the aspect pack: per-bucket batch
    * count, fill ppm of the pixel budget, and the worst overshoot
    * (bounded by one item — the never-split contract).
    */
  private val multimodalPackEfficiency = CatalogEntry(
    "multimodal_pack_efficiency",
    (s, dir) => Multimodal.packEfficiency(
      Multimodal.asMediaTable(QuerySupport.table(s, dir, "documents")),
      pixelBudget = 1000000L),
    Some("""WITH m AS (SELECT doc_id AS media_id,
           |    CAST(64 + octet_length(encode(text)) % 512 AS BIGINT) AS w,
           |    CAST(64 + (octet_length(encode(text)) // 7) % 512 AS BIGINT) AS h
           |  FROM documents),
           |c AS (SELECT media_id,
           |    CASE WHEN w * h < 16384 THEN 'small'
           |      WHEN w * h < 147456 THEN 'medium'
           |      ELSE 'large' END AS size_tier,
           |    CASE WHEN w * 1000000 // h < 950000 THEN 'portrait'
           |      WHEN w * 1000000 // h > 1052631 THEN 'landscape'
           |      ELSE 'square' END AS aspect_class,
           |    w * h AS px
           |  FROM m),
           |p AS (SELECT media_id, size_tier, aspect_class, px,
           |    (sum(px) OVER (PARTITION BY size_tier, aspect_class
           |                   ORDER BY media_id
           |                   ROWS UNBOUNDED PRECEDING) - px) // 1000000 AS batch_id
           |  FROM c),
           |b AS (SELECT size_tier, aspect_class, batch_id,
           |    count(*) AS n, sum(px) AS bpx
           |  FROM p GROUP BY 1, 2, 3)
           |SELECT size_tier, aspect_class,
           |  CAST(sum(n) AS BIGINT) AS n_items,
           |  CAST(count(*) AS BIGINT) AS n_batches,
           |  CAST(sum(bpx) AS BIGINT) AS total_px,
           |  CAST(sum(bpx) * 1000000 // (count(*) * 1000000) AS BIGINT) AS fill_ppm,
           |  CAST(max(bpx) AS BIGINT) AS max_batch_px
           |FROM b GROUP BY 1, 2 ORDER BY size_tier, aspect_class""".stripMargin))

  /** Per-source MSTTR at a 25-token window: the length-invariant
    * lexical-diversity number next to [[textLexicalStats]]'s raw TTR;
    * row-local segment arithmetic, one |sources|-grain rollup.
    */
  private val textMsttr = CatalogEntry(
    "text_msttr",
    (s, dir) => TextAnalysis.sourceMsttr(
        QuerySupport.table(s, dir, "documents"), segLen = 25)
      .orderBy("source"),
    Some("""WITH w AS (SELECT source, string_split(text, ' ') AS w FROM documents),
           |f AS (SELECT source, len(w) // 25 AS n_full, w FROM w
           |      WHERE len(w) >= 25),
           |s AS (SELECT source, n_full,
           |        list_sum(list_transform(range(0, n_full), i ->
           |          len(list_distinct(w[CAST(i * 25 + 1 AS BIGINT)
           |                              : CAST((i + 1) * 25 AS BIGINT)])))) AS dsum
           |      FROM f)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs_used,
           |  CAST(sum(n_full) AS BIGINT) AS n_segments,
           |  CAST(sum(dsum) AS BIGINT) AS n_distinct_sum,
           |  CAST(sum(dsum) * 1000000 // (25 * sum(n_full)) AS BIGINT) AS msttr_ppm
           |FROM s GROUP BY source ORDER BY source""".stripMargin))

  /** k-means oracle: replays both Lloyd iterations with the same exact
    * integer arithmetic as [[AnnSearch.kmeansAssign]] — 1e6-scaled long
    * vectors, centroids as exact (sum, count) pairs, the lattice LCG
    * inlined as SQL for iteration 0, empty buckets falling back to
    * their initial centroid. Scores on both sides are one cast + one
    * divide over identical integers, so the argmax is bit-exact;
    * DISTINCT ON (vec_id) ... ORDER BY score DESC, j reproduces
    * `array_position`'s first-wins tie-break.
    */
  /** Shared k-means CTE chain: base vectors `n` (doubles + norm +
    * 1e6-scaled long ints), lattice LCG iteration-0 centroids, one
    * Lloyd recompute (assign via exact integer dots, per-bucket exact
    * sums with lattice fallback for empty buckets), ending in `d2` =
    * per-(vector, centroid) final scores. Both engines compute each
    * score as one cast + one divide over identical exact integers.
    */
  /** Lloyd-iteration CTE chain over ANY `(vec_id, v DOUBLE[])` source
    * subquery at vector width `dim` (the init LCG strides by the
    * lattice's embDim regardless of `dim` — `latticeInts(0, j)
    * .take(dim)` on the Scala side addresses positions `j*embDim + d`,
    * so the oracle must too).
    */
  private def kmeansCtesFrom(srcSql: String, k: Int, dim: Int): String = {
    s"""n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
       |    list_transform(v, x -> CAST(floor(x * 1000000) AS BIGINT)) AS vi
       |  FROM ($srcSql)),
       |initc AS (SELECT j, i,
       |    (((1103515245 * (j * $embDim + i - 1) + 12345) % 2147483648) % 1000) * 1000 - 500000 AS s
       |  FROM range(0, $k) t1(j), range(1, ${dim + 1}) t2(i)),
       |d1 AS (SELECT v.vec_id, c.j, CAST(SUM(v.vi[c.i] * c.s) AS DOUBLE) / 1.0 AS score
       |  FROM n v CROSS JOIN initc c GROUP BY v.vec_id, c.j),
       |a1 AS (SELECT DISTINCT ON (vec_id) vec_id, j + 1 AS b
       |  FROM d1 ORDER BY vec_id, score DESC, j),
       |s1 AS (SELECT a.b - 1 AS j, t.i, SUM(v.vi[t.i]) AS s, COUNT(*) AS c
       |  FROM a1 a JOIN n v USING (vec_id) CROSS JOIN range(1, ${dim + 1}) t(i)
       |  GROUP BY 1, 2),
       |s1f AS (SELECT ic.j, ic.i, COALESCE(s1.s, ic.s) AS s, COALESCE(s1.c, 1) AS c
       |  FROM initc ic LEFT JOIN s1 ON s1.j = ic.j AND s1.i = ic.i),
       |d2 AS (SELECT v.vec_id, c.j,
       |    CAST(SUM(v.vi[c.i] * c.s) AS DOUBLE) / CAST(MAX(c.c) AS DOUBLE) AS score
       |  FROM n v CROSS JOIN s1f c GROUP BY v.vec_id, c.j)""".stripMargin
  }

  private def kmeansCtesK(k: Int): String = kmeansCtesFrom(
    "SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings", k, embDim)

  private val kmeansCtes: String = kmeansCtesK(ivfCentroids)

  private val annKmeans = CatalogEntry(
    "ann_kmeans_assign",
    (s, dir) => AnnSearch.kmeansAssign(QuerySupport.table(s, dir, "embeddings"))
      .orderBy("vec_id"),
    Some(s"""WITH $kmeansCtes,
            |a2 AS (SELECT DISTINCT ON (vec_id) vec_id, CAST(j + 1 AS INT) AS bucket
            |  FROM d2 ORDER BY vec_id, score DESC, j)
            |SELECT vec_id, bucket FROM a2 ORDER BY vec_id""".stripMargin))

  private val annIvfKmeans = CatalogEntry(
    "ann_ivf_kmeans_topk",
    (s, dir) => AnnSearch.ivfKmeansTopK(QuerySupport.table(s, dir, "embeddings"),
        col("vec_id") < annQueryIds, ivfK)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), r6(col("cos")).as("cosine"))
      .orderBy("query_id", "rnk"),
    Some {
      val masked = s"list_transform(range(1, ${ivfCentroids + 1}), i -> CASE WHEN i = b1 THEN -1e18 ELSE scores[i] END)"
      s"""WITH $kmeansCtes,
         |sc AS (SELECT vec_id, list(score ORDER BY j) AS scores FROM d2 GROUP BY vec_id),
         |a AS (SELECT n.vec_id, n.v, n.nrm, sc.scores,
         |        list_position(sc.scores, list_aggregate(sc.scores, 'max')) AS b1
         |      FROM n JOIN sc USING (vec_id)),
         |q AS (SELECT vec_id, v, nrm, b1,
         |        list_position($masked, list_aggregate($masked, 'max')) AS b2
         |      FROM a WHERE vec_id < $annQueryIds),
         |pr AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, unnest([b1, b2]) AS bucket FROM q),
         |cand AS (SELECT p.query_id, c.vec_id AS neighbor_id,
         |          list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * c.v[i])) / (qn * c.nrm) AS cos
         |         FROM pr p JOIN a c ON c.b1 = p.bucket AND c.vec_id <> p.query_id),
         |r AS (SELECT query_id, neighbor_id, cos,
         |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk FROM cand)
         |SELECT query_id, neighbor_id, rnk, ${r6s("cos")} AS cosine
         |FROM r WHERE rnk <= $ivfK ORDER BY query_id, rnk""".stripMargin
    })

  /** Learned-centroid corpus kNN graph (VERDICT r10 §next-3): the
    * `kmeansState` → `knnGraph` production composition the lattice docs
    * promise, exercised end-to-end. The oracle composes the shared
    * k-means CTE chain with the graph query — probes are the whole
    * corpus (the `ann_ivf_kmeans_topk` oracle with its query filter
    * removed), so every Lloyd-learned bucket and both probe choices
    * are hash-checked.
    */
  private def learnedGraphSql(kc: Int): String = {
    val masked = s"list_transform(range(1, ${kc + 1}), i -> CASE WHEN i = b1 THEN -1e18 ELSE scores[i] END)"
    s"""WITH ${kmeansCtesK(kc)},
       |sc AS (SELECT vec_id, list(score ORDER BY j) AS scores FROM d2 GROUP BY vec_id),
       |a AS (SELECT n.vec_id, n.v, n.nrm, sc.scores,
       |        list_position(sc.scores, list_aggregate(sc.scores, 'max')) AS b1
       |      FROM n JOIN sc USING (vec_id)),
       |q AS (SELECT vec_id, v, nrm, b1,
       |        list_position($masked, list_aggregate($masked, 'max')) AS b2
       |      FROM a),
       |pr AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, unnest([b1, b2]) AS bucket FROM q),
       |cand AS (SELECT p.query_id, c.vec_id AS neighbor_id,
       |          list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * c.v[i])) / (qn * c.nrm) AS cos
       |         FROM pr p JOIN a c ON c.b1 = p.bucket AND c.vec_id <> p.query_id),
       |r AS (SELECT query_id, neighbor_id, cos,
       |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk FROM cand)
       |SELECT query_id, neighbor_id, rnk, ${r6s("cos")} AS cosine
       |FROM r WHERE rnk <= $annK ORDER BY query_id, rnk""".stripMargin
  }

  private val annKnnGraphLearned = CatalogEntry(
    "ann_knn_graph_learned",
    (s, dir) => AnnSearch.knnGraphLearned(QuerySupport.table(s, dir, "embeddings"), annK)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), r6(col("cos")).as("cosine"))
      .orderBy("query_id", "rnk"),
    Some(learnedGraphSql(ivfCentroids)))

  /** The learned graph's 100 TB path (VERDICT r11 §next-5): the same
    * `kc` knob that bounds the lattice graph's per-bucket occupancy
    * applied to the Lloyd-learned buckets — identical plan shape to
    * `ann_knn_graph_learned`, more centroids, so the self-join's
    * candidate count per query stays bounded as the corpus grows.
    * Above the toy corpus this, not the fixed-kc entry, is the
    * configuration to run.
    */
  private val annKnnGraphLearnedScaled = CatalogEntry(
    "ann_knn_graph_learned_scaled",
    (s, dir) => AnnSearch.knnGraphLearned(QuerySupport.table(s, dir, "embeddings"),
        annK, kc = knnScaledCentroids)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), r6(col("cos")).as("cosine"))
      .orderBy("query_id", "rnk"),
    Some(learnedGraphSql(knnScaledCentroids)))

  /** kNN-graph PageRank: the oracle composes the shared lattice graph
    * CTEs with the same fixed-iteration exact-integer recursion
    * (per-edge truncation before the order-free incoming sum, exact
    * restart floor), unrolled one CTE pair per iteration.
    */
  private def pagerankSql(kc: Int): String = {
    val iters = 4
    val d = 850000L
    val sb = new StringBuilder
    sb.append(
      s"""WITH ${latticeGraphCtes(kc)},
         |edges AS (SELECT query_id AS src, neighbor_id AS dst FROM r WHERE rnk <= $annK),
         |nodes AS (SELECT vec_id AS id FROM embeddings),
         |odeg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
         |ed AS (SELECT e2.src, e2.dst, o.deg FROM edges e2 JOIN odeg o USING (src)),
         |r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS rk FROM nodes)""".stripMargin)
    for (k <- 1 to iters) {
      sb.append(
        s""",
           |c$k AS (SELECT ed.dst, SUM((p.rk * $d) // (1000000 * ed.deg)) AS s
           |        FROM ed JOIN r${k - 1} p ON p.id = ed.src GROUP BY ed.dst),
           |r$k AS (SELECT n.id, CAST(${1000000L - d} + coalesce(c.s, 0) AS BIGINT) AS rk
           |        FROM nodes n LEFT JOIN c$k c ON c.dst = n.id)""".stripMargin)
    }
    sb.append(
      s"""
         |SELECT id AS vec_id, rk AS rank_micro FROM r$iters ORDER BY vec_id""".stripMargin)
    sb.toString
  }

  private val annKnnPagerank = CatalogEntry(
    "ann_knn_pagerank",
    (s, dir) => AnnSearch.knnPageRank(QuerySupport.table(s, dir, "embeddings"))
      .orderBy("vec_id"),
    Some(pagerankSql(ivfCentroids)))

  /** The PageRank's 100 TB path: it inherits the graph's per-bucket
    * occupancy² contract, and the SAME `kc` knob solves it — this
    * entry pins the scaled-centroid composition end to end.
    */
  private val annKnnPagerankScaled = CatalogEntry(
    "ann_knn_pagerank_scaled",
    (s, dir) => AnnSearch.knnPageRank(QuerySupport.table(s, dir, "embeddings"),
        kc = knnScaledCentroids)
      .orderBy("vec_id"),
    Some(pagerankSql(knnScaledCentroids)))

  /** PQ code assignment (storage path for 100 TB embedding corpora):
    * the oracle replays the exact integer-space argmin — the 8x16
    * sub-centroid score arrays are inlined as list literals of BIGINT
    * arithmetic (same `floor(x*1e6)` scaling, same first-wins
    * `list_position`/`array_position` tie rule), so codes and the
    * total squared error are engine-exact.
    */
  private val pqSubspaces = 8
  private val pqCodebook = 16

  /** Shared PQ oracle fragments: the `e` (integer vectors) and `s`
    * (per-subspace score arrays a1..aM) CTE bodies, exactly mirroring
    * `AnnSearch.pqScoreArray`'s BIGINT arithmetic.
    */
  /** The per-subspace score-array list literals (`[...] AS a1, ...`);
    * references a 1e6-scaled `vi` column in scope. Shared by the pure
    * PQ oracles (over CTE `e`) and the IVF-PQ oracle (over the k-means
    * chain's `n`, which carries the same `vi`).
    */
  private def pqArraysSql: String = {
    val subDim = embDim / pqSubspaces
    (0 until pqSubspaces).map { m =>
      val scores = (0 until pqCodebook).map { j =>
        val cents = AnnSearch.pqCentroid(m, j, subDim)
        (0 until subDim).map { d =>
          val x = s"vi[${m * subDim + d + 1}]"
          s"($x - (${cents(d)})) * ($x - (${cents(d)}))"
        }.mkString(" + ")
      }
      s"[${scores.map(sc => s"($sc)").mkString(", ")}] AS a${m + 1}"
    }.mkString(",\n  ")
  }

  private def pqOracleCtes: String =
    s"""e AS (SELECT vec_id,
       |  list_transform(embedding::DOUBLE[], x -> CAST(floor(x * 1000000) AS BIGINT)) AS vi
       |  FROM embeddings),
       |s AS (SELECT vec_id,
       |  $pqArraysSql
       |  FROM e)""".stripMargin

  private def pqOracleCodes: String = (1 to pqSubspaces).map(m =>
    s"CAST(list_position(a$m, list_aggregate(a$m, 'min')) AS INT) AS code_$m")
    .mkString(",\n  ")

  private val annPqAssign = CatalogEntry(
    "ann_pq_assign",
    (s, dir) => AnnSearch.pqAssign(QuerySupport.table(s, dir, "embeddings"))
      .orderBy("vec_id"),
    Some {
      val err = (1 to pqSubspaces).map(m => s"list_aggregate(a$m, 'min')").mkString(" + ")
      s"""WITH $pqOracleCtes
         |SELECT vec_id,
         |  $pqOracleCodes,
         |  CAST($err AS BIGINT) AS sq_err
         |FROM s ORDER BY vec_id""".stripMargin
    })

  /** Learned-codebook PQ assignment (VERDICT r10's learned-composition
    * theme applied to PQ): the oracle replays the per-subspace Lloyd
    * recompute exactly — initial codes from the lattice score arrays,
    * per-(subspace, code, dim) exact BIGINT sums, truncating division
    * (DuckDB `//` = Scala `Long./`; both truncate toward zero — NOT
    * `Math.floorDiv`, which diverges on negative sums) back into the
    * integer space with lattice fallback for empty cells, then the
    * final argmin against the
    * updated centroids with first-wins tie-break on both engines.
    */
  /** The learned-codebook Lloyd replay chain (a0 codes -> exact cell
    * sums -> truncating centroid update -> re-scored candidates ->
    * per-(vec, subspace) argmin `best`) — shared by the learned
    * assignment entry and the distortion report.
    */
  private lazy val pqLearnedChainSql: String = {
      val subDim = embDim / pqSubspaces
      val cent0 = (0 until pqSubspaces).flatMap { m =>
        val cents = (0 until pqCodebook).map(j => AnnSearch.pqCentroid(m, j, subDim))
        (0 until pqCodebook).flatMap { j =>
          (0 until subDim).map(d => s"($m, ${j + 1}, ${d + 1}, ${cents(j)(d)})")
        }
      }.mkString(", ")
      val statsUnion = (1 to pqSubspaces).map { m =>
        val off = (m - 1) * subDim
        s"""SELECT ${m - 1} AS m, code_$m AS code, t.d AS d,
           |      SUM(e.vi[$off + t.d]) AS s, COUNT(*) AS cnt
           |    FROM a0 JOIN e USING (vec_id) CROSS JOIN range(1, ${subDim + 1}) t(d)
           |    GROUP BY 1, 2, 3""".stripMargin
      }.mkString("\n    UNION ALL\n    ")
      s"""a0 AS (SELECT vec_id, $pqOracleCodes FROM s),
         |cent0(m, j, d, c) AS (VALUES $cent0),
         |st AS (
         |    $statsUnion),
         |cent1 AS (SELECT c0.m, c0.j, c0.d, COALESCE(st.s // st.cnt, c0.c) AS c
         |          FROM cent0 c0 LEFT JOIN st
         |            ON st.m = c0.m AND st.code = c0.j AND st.d = c0.d),
         |cand AS (SELECT e.vec_id, c.m, c.j,
         |           SUM((e.vi[c.m * $subDim + c.d] - c.c)
         |               * (e.vi[c.m * $subDim + c.d] - c.c)) AS score
         |         FROM e CROSS JOIN cent1 c GROUP BY 1, 2, 3),
         |best AS (SELECT DISTINCT ON (vec_id, m) vec_id, m, j, score
         |         FROM cand ORDER BY vec_id, m, score, j)""".stripMargin
  }

  private val annPqAssignLearned = CatalogEntry(
    "ann_pq_assign_learned",
    (s, dir) => AnnSearch.pqAssignLearned(QuerySupport.table(s, dir, "embeddings"))
      .orderBy("vec_id"),
    Some {
      val codePivot = (1 to pqSubspaces).map(m =>
        s"CAST(MAX(CASE WHEN m = ${m - 1} THEN j END) AS INT) AS code_$m")
        .mkString(",\n  ")
      s"""WITH $pqOracleCtes,
         |$pqLearnedChainSql
         |SELECT vec_id,
         |  $codePivot,
         |  CAST(SUM(score) AS BIGINT) AS sq_err
         |FROM best GROUP BY vec_id ORDER BY vec_id""".stripMargin
    })

  /** Quantization-quality report: lattice vs Lloyd-learned total
    * squared error with the improvement in ppm — Lloyd monotonicity
    * as a hash-gated NUMBER (the shard-merge-proof discipline).
    */
  private val annPqDistortion = CatalogEntry(
    "ann_pq_distortion",
    (s, dir) => AnnSearch.pqDistortion(
        QuerySupport.table(s, dir, "embeddings")),
    Some {
      val err = (1 to pqSubspaces).map(m => s"list_aggregate(a$m, 'min')").mkString(" + ")
      s"""WITH $pqOracleCtes,
         |$pqLearnedChainSql,
         |la AS (SELECT CAST(count(*) AS BIGINT) AS n_vectors,
         |         CAST(sum($err) AS BIGINT) AS lattice_total_sq FROM s),
         |lr AS (SELECT CAST(sum(score) AS BIGINT) AS learned_total_sq
         |       FROM best)
         |SELECT n_vectors, lattice_total_sq, learned_total_sq,
         |  CAST(floor(CAST(lattice_total_sq - learned_total_sq AS DOUBLE)
         |    / CAST(greatest(lattice_total_sq, 1) AS DOUBLE)
         |    * 1000000.0 + 0.5) AS BIGINT) AS improvement_ppm
         |FROM la CROSS JOIN lr""".stripMargin
    })

  /** ADC top-k over the PQ codes: the oracle reuses the assignment's
    * score-array CTEs — the corpus side keeps only its argmin codes,
    * the query side keeps the arrays as distance tables, and the
    * approximate distance is the exact BIGINT sum of one array lookup
    * per subspace on both engines.
    */
  private val annPqTopK = CatalogEntry(
    "ann_pq_topk",
    (s, dir) => AnnSearch.pqTopK(QuerySupport.table(s, dir, "embeddings"),
        col("vec_id") < annQueryIds, annK)
      .orderBy("query_id", "rnk"),
    Some {
      val dist = (1 to pqSubspaces).map(m => s"q.a$m[c.code_$m]").mkString(" + ")
      s"""WITH $pqOracleCtes,
         |c AS (SELECT vec_id,
         |  $pqOracleCodes
         |  FROM s),
         |q AS (SELECT vec_id AS query_id, ${(1 to pqSubspaces).map(m => s"a$m").mkString(", ")}
         |      FROM s WHERE vec_id < $annQueryIds),
         |p AS (SELECT q.query_id, c.vec_id AS neighbor_id, $dist AS dist
         |      FROM q JOIN c ON c.vec_id <> q.query_id),
         |r AS (SELECT query_id, neighbor_id, dist,
         |        row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rnk
         |      FROM p)
         |SELECT query_id, neighbor_id, rnk, CAST(dist AS BIGINT) AS adc_dist
         |FROM r WHERE rnk <= $annK ORDER BY query_id, rnk""".stripMargin
    })

  /** IVF-PQ (IVFADC): coarse learned-k-means probe + ADC-over-codes
    * ranking within the probed buckets. The oracle composes the two
    * already-proven replays — the k-means CTE chain for buckets and
    * the PQ score arrays for codes/distance tables — over the same
    * `vi` integers, so bucket choice, codes, and ADC distances are all
    * engine-exact.
    */
  private def ivfPqSql(queryFilterSql: String): String = {
      val masked = s"list_transform(range(1, ${ivfCentroids + 1}), i -> CASE WHEN i = b1 THEN -1e18 ELSE scores[i] END)"
      val aList = (1 to pqSubspaces).map(m => s"a$m").mkString(", ")
      val dist = (1 to pqSubspaces).map(m => s"pr.a$m[c.code_$m]").mkString(" + ")
      s"""WITH $kmeansCtes,
         |sc AS (SELECT vec_id, list(score ORDER BY j) AS scores FROM d2 GROUP BY vec_id),
         |s AS (SELECT n.vec_id,
         |  $pqArraysSql,
         |  sc.scores, list_position(sc.scores, list_aggregate(sc.scores, 'max')) AS b1
         |      FROM n JOIN sc USING (vec_id)),
         |c AS (SELECT vec_id, b1,
         |  $pqOracleCodes
         |  FROM s),
         |q AS (SELECT vec_id, $aList, b1,
         |        list_position($masked, list_aggregate($masked, 'max')) AS b2
         |      FROM s $queryFilterSql),
         |pr AS (SELECT vec_id AS query_id, $aList, unnest([b1, b2]) AS bucket FROM q),
         |p AS (SELECT pr.query_id, c.vec_id AS neighbor_id, $dist AS dist
         |      FROM pr JOIN c ON c.b1 = pr.bucket AND c.vec_id <> pr.query_id),
         |r AS (SELECT query_id, neighbor_id, dist,
         |        row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rnk
         |      FROM p)
         |SELECT query_id, neighbor_id, rnk, CAST(dist AS BIGINT) AS adc_dist
         |FROM r WHERE rnk <= $ivfK ORDER BY query_id, rnk""".stripMargin
  }

  private val annIvfPq = CatalogEntry(
    "ann_ivfpq_topk",
    (s, dir) => AnnSearch.ivfPqTopK(QuerySupport.table(s, dir, "embeddings"),
        col("vec_id") < annQueryIds, ivfK)
      .orderBy("query_id", "rnk"),
    Some(ivfPqSql(s"WHERE vec_id < $annQueryIds")))

  /** The kNN graph at PQ memory footprint: every vector is a query and
    * every candidate is ranked by ADC over its 8-byte code — the graph
    * build a 100 TB embedding corpus can afford when the float vectors
    * no longer fit hot storage. Same learned buckets, same two-probe
    * semantics; only the codes travel.
    */
  private val annKnnGraphPq = CatalogEntry(
    "ann_knn_graph_pq",
    (s, dir) => AnnSearch.ivfPqTopK(QuerySupport.table(s, dir, "embeddings"),
        lit(true), ivfK)
      .orderBy("query_id", "rnk"),
    Some(ivfPqSql("")))

  /** IVFADC+R: the IVF-PQ chain widened to a kPrime shortlist, then an
    * exact-cosine re-rank of the shortlist joined back to the float
    * vectors by id. The oracle appends three CTEs to the proven IVF-PQ
    * replay: the shortlist cut, the float-vector re-join (`n` already
    * carries v + nrm), and the cosine re-rank window — every
    * arithmetic step already hash-proven in the brute-force and IVF-PQ
    * oracles.
    */
  private val annIvfPqRerank = CatalogEntry(
    "ann_ivfpq_rerank",
    (s, dir) => AnnSearch.ivfPqRerankTopK(QuerySupport.table(s, dir, "embeddings"),
        col("vec_id") < annQueryIds, ivfK, 3 * ivfK)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), r6(col("cos")).as("cosine"))
      .orderBy("query_id", "rnk"),
    Some {
      val kPrime = 3 * ivfK
      val masked = s"list_transform(range(1, ${ivfCentroids + 1}), i -> CASE WHEN i = b1 THEN -1e18 ELSE scores[i] END)"
      val aList = (1 to pqSubspaces).map(m => s"a$m").mkString(", ")
      val dist = (1 to pqSubspaces).map(m => s"pr.a$m[c.code_$m]").mkString(" + ")
      s"""WITH $kmeansCtes,
         |sc AS (SELECT vec_id, list(score ORDER BY j) AS scores FROM d2 GROUP BY vec_id),
         |s AS (SELECT n.vec_id,
         |  $pqArraysSql,
         |  sc.scores, list_position(sc.scores, list_aggregate(sc.scores, 'max')) AS b1
         |      FROM n JOIN sc USING (vec_id)),
         |c AS (SELECT vec_id, b1,
         |  $pqOracleCodes
         |  FROM s),
         |q AS (SELECT vec_id, $aList, b1,
         |        list_position($masked, list_aggregate($masked, 'max')) AS b2
         |      FROM s WHERE vec_id < $annQueryIds),
         |pr AS (SELECT vec_id AS query_id, $aList, unnest([b1, b2]) AS bucket FROM q),
         |p AS (SELECT pr.query_id, c.vec_id AS neighbor_id, $dist AS dist
         |      FROM pr JOIN c ON c.b1 = pr.bucket AND c.vec_id <> pr.query_id),
         |r AS (SELECT query_id, neighbor_id, dist,
         |        row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rnk
         |      FROM p),
         |sl AS (SELECT query_id, neighbor_id FROM r WHERE rnk <= $kPrime),
         |rr AS (SELECT sl.query_id, sl.neighbor_id,
         |        list_sum(list_transform(range(1, len(qv.v) + 1), i -> qv.v[i] * cv.v[i]))
         |          / (qv.nrm * cv.nrm) AS cos
         |       FROM sl JOIN n qv ON qv.vec_id = sl.query_id
         |                JOIN n cv ON cv.vec_id = sl.neighbor_id),
         |r2 AS (SELECT query_id, neighbor_id, cos,
         |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
         |       FROM rr)
         |SELECT query_id, neighbor_id, rnk, ${r6s("cos")} AS cosine
         |FROM r2 WHERE rnk <= $ivfK ORDER BY query_id, rnk""".stripMargin
    })

  /** SemDeDup: semantic (embedding-space) dedup — learned k-means
    * buckets partition the pair space, within-bucket cosine prunes the
    * higher id. The oracle reuses the k-means CTEs (2 exact Lloyd
    * iterations) and the list-fold cosine, both already hash-proven.
    */
  private val dedupSemantic = CatalogEntry(
    "dedup_semantic",
    (s, dir) => AnnSearch.semanticNearDups(QuerySupport.table(s, dir, "embeddings"))
      .orderBy("vec_id"),
    Some(s"""WITH $kmeansCtes,
            |a2 AS (SELECT DISTINCT ON (vec_id) vec_id, CAST(j + 1 AS INT) AS bucket
            |  FROM d2 ORDER BY vec_id, score DESC, j),
            |rm AS (SELECT DISTINCT b.vec_id
            |       FROM a2 a JOIN a2 b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
            |       JOIN n x ON x.vec_id = a.vec_id JOIN n y ON y.vec_id = b.vec_id
            |       WHERE list_sum(list_transform(range(1, len(x.v) + 1), i -> x.v[i] * y.v[i]))
            |             / (x.nrm * y.nrm) >= $semDedupThreshold)
            |SELECT a2.vec_id, a2.bucket, (rm.vec_id IS NOT NULL) AS removed
            |FROM a2 LEFT JOIN rm USING (vec_id) ORDER BY a2.vec_id""".stripMargin))

  /** Prototypicality pruning: per-cluster centroid-cosine rank with an
    * integer-rational prune flag. The oracle rebuilds the exact
    * (sum, count) centroids from the k-means assignment and replays
    * the same fixed-order dot/norm arithmetic: the centroid dot is an
    * exact integer sum, the centroid self-norm folds in doubles (its
    * integer squares overflow BIGINT), and the prune flag is pure rank
    * arithmetic — every column hash-safe.
    */
  private val embPrototypePrune = CatalogEntry(
    "emb_prototype_prune",
    (s, dir) => AnnSearch.prototypePrune(QuerySupport.table(s, dir, "embeddings"))
      .select(col("vec_id"), col("bucket"), col("rnk"), col("n_bucket"),
        col("pruned"), r6(col("cos")).as("cosine"))
      .orderBy("vec_id"),
    Some {
      val dim = embDim
      s"""WITH $kmeansCtes,
         |a2 AS (SELECT DISTINCT ON (vec_id) vec_id, CAST(j + 1 AS INT) AS bucket
         |  FROM d2 ORDER BY vec_id, score DESC, j),
         |sums AS (SELECT a.bucket, t.i, SUM(n.vi[t.i]) AS s
         |  FROM a2 a JOIN n USING (vec_id) CROSS JOIN range(1, ${dim + 1}) t(i)
         |  GROUP BY 1, 2),
         |cs AS (SELECT bucket, list(CAST(s AS BIGINT) ORDER BY i) AS sv FROM sums GROUP BY bucket),
         |p AS (SELECT n.vec_id, a.bucket,
         |        CAST(list_sum(list_transform(range(1, ${dim + 1}), i -> n.vi[i] * cs.sv[i])) AS DOUBLE)
         |        / (sqrt(CAST(list_sum(list_transform(n.vi, x -> x * x)) AS DOUBLE))
         |           * sqrt(list_sum(list_transform(cs.sv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
         |      FROM n JOIN a2 a ON a.vec_id = n.vec_id JOIN cs ON cs.bucket = a.bucket),
         |r AS (SELECT vec_id, bucket, cos,
         |        row_number() OVER (PARTITION BY bucket ORDER BY cos DESC, vec_id) AS rnk,
         |        count(*) OVER (PARTITION BY bucket) AS n_bucket
         |      FROM p)
         |SELECT vec_id, bucket, rnk, n_bucket,
         |  (rnk * $protoPruneDen <= n_bucket * $protoPruneNum) AS pruned,
         |  ${r6s("cos")} AS cosine
         |FROM r ORDER BY vec_id""".stripMargin
    })

  /** TF-IDF keyword extraction: `ln` is bit-identical across engines
    * on these count rationals (verified), so scores and ranks replay
    * exactly; ties break on the term.
    */
  private val textTfidf = CatalogEntry(
    "text_tfidf_topk",
    (s, dir) => {
      val t = TextAnalysis.tfidfTopTerms(
        QuerySupport.table(s, dir, "documents"), tfidfK)
      t.select(col("doc_id"), col("term"), col("tf"), col("df"), col("rnk"),
        r6(col("tfidf")).as("tfidf"))
        .orderBy("doc_id", "rnk")
    },
    Some(s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
            |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
            |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
            |sc AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
            |        CAST(tf.tf AS DOUBLE) * ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)) AS tfidf
            |       FROM tf JOIN df USING (term) CROSS JOIN n),
            |r AS (SELECT doc_id, term, tf, df, tfidf,
            |        row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
            |      FROM sc)
            |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, rnk,
            |  ${r6s("tfidf")} AS tfidf
            |FROM r WHERE rnk <= $tfidfK ORDER BY doc_id, rnk""".stripMargin))

  /** Winnowing fingerprints: the selected-minima set replays exactly —
    * 16-bit word-shingle hashes through the proven positional decode,
    * window minima as integer folds, digest over the sorted distinct
    * values.
    */
  /** Shared winnowing CTE chain ending in `s(doc_id, n_grams, sel)`. */
  private val winnowCtes: String = {
    val decode = hexDecode4("h", posFn = "strpos", substrFn = "substr")
    s"""w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |h AS (SELECT doc_id,
       |  CASE WHEN len(w) >= 3
       |  THEN list_transform(list_transform(range(1, len(w) - 1),
       |                        i -> md5(w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])),
       |                      h -> CAST(($decode) AS BIGINT))
       |  ELSE []::BIGINT[] END AS hashes FROM w),
       |s AS (SELECT doc_id, len(hashes) AS n_grams,
       |  list_sort(list_distinct(list_transform(
       |    range(1, greatest(len(hashes) - 3, 1) + 1),
       |    i -> list_aggregate(list_slice(hashes, i, i + 3), 'min')))) AS sel
       |  FROM h)""".stripMargin
  }

  private val textWinnow = CatalogEntry(
    "text_winnow_fingerprint",
    (s, dir) => TextAnalysis.winnowFingerprint(
        QuerySupport.table(s, dir, "documents"))
      .orderBy("doc_id"),
    Some(s"""WITH $winnowCtes
            |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
            |  CAST(CASE WHEN n_grams = 0 THEN 0 ELSE len(sel) END AS BIGINT) AS n_selected,
            |  CASE WHEN n_grams = 0 THEN NULL
            |       ELSE md5(array_to_string(list_transform(sel, x -> CAST(x AS VARCHAR)), ','))
            |  END AS winnow_digest
            |FROM s ORDER BY doc_id""".stripMargin))

  /** The MOSS matching step: pairs sharing >= 2 winnowing
    * fingerprints, hot fingerprints (and their chance-collision pools)
    * capped out of pairing on both sides identically.
    */
  private val dedupWinnowCandidates = CatalogEntry(
    "dedup_winnow_candidates",
    (s, dir) => TextAnalysis.winnowCandidates(
        QuerySupport.table(s, dir, "documents"))
      .orderBy("doc_a", "doc_b"),
    Some(s"""WITH $winnowCtes,
            |f AS (SELECT doc_id, unnest(sel) AS fp FROM s WHERE n_grams > 0),
            |stats AS (SELECT fp, count(*) AS n FROM f GROUP BY fp),
            |fk AS (SELECT f.doc_id, f.fp FROM f JOIN stats USING (fp) WHERE stats.n <= 1000),
            |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
            |      FROM fk a JOIN fk b ON a.fp = b.fp AND a.doc_id < b.doc_id
            |      GROUP BY 1, 2)
            |SELECT doc_a, doc_b, CAST(n_shared AS BIGINT) AS n_shared
            |FROM p WHERE n_shared >= 2 ORDER BY doc_a, doc_b""".stripMargin))

  /** Winnow containment: distinct-set sharing with per-side fractions
    * — the asymmetric quote-detection view over the same fingerprint
    * chain, exact integer division both engines.
    */
  private val dedupContainment = CatalogEntry(
    "dedup_containment",
    (s, dir) => TextAnalysis.winnowContainment(
        QuerySupport.table(s, dir, "documents"))
      .orderBy("doc_a", "doc_b"),
    Some(s"""WITH $winnowCtes,
            |sz AS (SELECT doc_id, CAST(len(list_distinct(sel)) AS BIGINT) AS n_fp
            |       FROM s WHERE n_grams > 0),
            |f AS (SELECT doc_id, unnest(list_distinct(sel)) AS fp FROM s WHERE n_grams > 0),
            |stats AS (SELECT fp, count(*) AS n FROM f GROUP BY fp),
            |fk AS (SELECT f.doc_id, f.fp FROM f JOIN stats USING (fp) WHERE stats.n <= 1000),
            |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
            |      FROM fk a JOIN fk b ON a.fp = b.fp AND a.doc_id < b.doc_id
            |      GROUP BY 1, 2)
            |SELECT doc_a, doc_b, CAST(n_shared AS BIGINT) AS n_shared,
            |  sa.n_fp AS n_fp_a, sb.n_fp AS n_fp_b,
            |  CAST(n_shared * 1000000 // sa.n_fp AS BIGINT) AS containment_a_micro,
            |  CAST(n_shared * 1000000 // sb.n_fp AS BIGINT) AS containment_b_micro
            |FROM p JOIN sz sa ON sa.doc_id = p.doc_a
            |JOIN sz sb ON sb.doc_id = p.doc_b
            |WHERE n_shared >= 2 ORDER BY doc_a, doc_b""".stripMargin))

  /** The TIGHTENED containment variant — the scale-path knobs
    * (maxBucket 100, minShared 3) oracled next to the default entry,
    * the same fixed-vs-scaled pairing the kNN-graph kc entries pin:
    * per-bucket pair cost capped at 100², dense boilerplate pairs
    * thresholded out.
    */
  private val dedupContainmentTight = CatalogEntry(
    "dedup_containment_tight",
    (s, dir) => TextAnalysis.winnowContainment(
        QuerySupport.table(s, dir, "documents"),
        minShared = 3, maxBucket = 100)
      .orderBy("doc_a", "doc_b"),
    Some(s"""WITH $winnowCtes,
            |sz AS (SELECT doc_id, CAST(len(list_distinct(sel)) AS BIGINT) AS n_fp
            |       FROM s WHERE n_grams > 0),
            |f AS (SELECT doc_id, unnest(list_distinct(sel)) AS fp FROM s WHERE n_grams > 0),
            |stats AS (SELECT fp, count(*) AS n FROM f GROUP BY fp),
            |fk AS (SELECT f.doc_id, f.fp FROM f JOIN stats USING (fp) WHERE stats.n <= 100),
            |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
            |      FROM fk a JOIN fk b ON a.fp = b.fp AND a.doc_id < b.doc_id
            |      GROUP BY 1, 2)
            |SELECT doc_a, doc_b, CAST(n_shared AS BIGINT) AS n_shared,
            |  sa.n_fp AS n_fp_a, sb.n_fp AS n_fp_b,
            |  CAST(n_shared * 1000000 // sa.n_fp AS BIGINT) AS containment_a_micro,
            |  CAST(n_shared * 1000000 // sb.n_fp AS BIGINT) AS containment_b_micro
            |FROM p JOIN sz sa ON sa.doc_id = p.doc_a
            |JOIN sz sb ON sb.doc_id = p.doc_b
            |WHERE n_shared >= 3 ORDER BY doc_a, doc_b""".stripMargin))

  /** Hashed-n-gram linear classifier: weights derive from the 16-bit
    * md5-prefix bucket (`% mod - shift`), so the exact BIGINT score
    * replays through the same positional hex decode the SimHash oracle
    * already proves engine-identical.
    */
  private val textHashClassifier = CatalogEntry(
    "text_hash_classifier",
    (s, dir) => {
      val t = TextAnalysis.hashClassifier(QuerySupport.table(s, dir, "documents"))
      t.select(col("doc_id"), col("n_feats"), col("score"), col("keep"),
        r6(col("avg_weight")).as("avg_weight"))
        .orderBy("doc_id")
    },
    Some {
      val decode = hexDecode4("h", posFn = "strpos", substrFn = "substr")
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |f AS (SELECT doc_id, list_concat(w,
         |        CASE WHEN len(w) >= 2
         |        THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])
         |        ELSE []::VARCHAR[] END) AS f FROM w),
         |s AS (SELECT doc_id, len(f) AS n_feats,
         |        list_sum(list_transform(list_transform(f, t -> md5(t)),
         |          h -> ($decode) % 21 - 10)) AS score
         |      FROM f)
         |SELECT doc_id, CAST(n_feats AS BIGINT) AS n_feats,
         |  CAST(score AS BIGINT) AS score, (score >= 0) AS keep,
         |  ${r6s("CAST(score AS DOUBLE) / n_feats")} AS avg_weight
         |FROM s ORDER BY doc_id""".stripMargin
    })

  /** The hashed-n-gram classifier TRAINED in-engine (two epochs of
    * exact-integer logistic-loss GD with the hard-sigmoid link — see
    * [[Classifier]]): the oracle unrolls both epochs as chained CTEs
    * over the same (doc, bucket, count) frame, so the driver's hash
    * gate covers the learned weights, the margins, and the
    * training-set audit — not just a scoring pass. Every column is
    * exact (no transcendental on either engine).
    */
  private val textClassifierTrain = CatalogEntry(
    "text_classifier_train",
    (s, dir) => Classifier.trainScores(
        QuerySupport.table(s, dir, "documents"), col("lang") === "en")
      .orderBy("doc_id"),
    Some {
      val decode = hexDecode4("md5(feat)")
      s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |f AS (SELECT doc_id, unnest(w) AS feat FROM tk
         |      UNION ALL
         |      SELECT doc_id, unnest(list_transform(range(1, len(w)),
         |        i -> w[i] || ' ' || w[i + 1])) AS feat FROM tk),
         |fb AS (SELECT doc_id, CAST(($decode) AS BIGINT) AS bucket,
         |        count(*) AS x FROM f GROUP BY 1, 2
         |       UNION ALL
         |       SELECT doc_id, CAST(65536 AS BIGINT), CAST(1 AS BIGINT)
         |       FROM documents),
         |lab AS (SELECT doc_id,
         |        CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
         |e1 AS (SELECT doc_id, CAST(500000 - 1000000 * y AS BIGINT) AS err
         |       FROM lab),
         |g1 AS (SELECT bucket, sum(x * err) AS g
         |       FROM fb JOIN e1 USING (doc_id) GROUP BY bucket),
         |w1 AS (SELECT bucket, -(g // (2 * nd)) AS w FROM g1 CROSS JOIN nn),
         |m2 AS (SELECT doc_id, sum(x * w) AS m
         |       FROM fb JOIN w1 USING (bucket) GROUP BY doc_id),
         |e2 AS (SELECT lab.doc_id,
         |        least(greatest(500000 + m // 4, 0), 1000000) - 1000000 * y AS err
         |       FROM lab JOIN m2 USING (doc_id)),
         |g2 AS (SELECT bucket, sum(x * err) AS g
         |       FROM fb JOIN e2 USING (doc_id) GROUP BY bucket),
         |w2 AS (SELECT bucket, w - (g // (2 * nd)) AS w
         |       FROM w1 JOIN g2 USING (bucket) CROSS JOIN nn),
         |mf AS (SELECT doc_id, CAST(sum(x * w) AS BIGINT) AS margin_micro
         |       FROM fb JOIN w2 USING (bucket) GROUP BY doc_id)
         |SELECT lab.doc_id, CAST(y AS BIGINT) AS y, margin_micro,
         |  CAST(least(greatest(500000 + margin_micro // 4, 0), 1000000)
         |    AS BIGINT) AS p_micro,
         |  (margin_micro >= 0) AS pred,
         |  ((margin_micro >= 0) = (y = 1)) AS correct
         |FROM lab JOIN mf USING (doc_id) ORDER BY doc_id""".stripMargin
    })

  /** The classifier's TRAIN/TEST holdout eval: fit on id % 5 ≠ 0
    * (the same unrolled 2-epoch CTE chain, gradient joins restricted
    * to the train slice), score the holdout with the learned weights
    * (unseen buckets = weight 0 via the left join), and report the
    * exact confusion + integer-micro metrics in one row.
    *
    * On THIS fixture the numbers sit at the base rate by
    * construction: the synthetic corpus draws every language's text
    * from one shared token pool, so `lang` is statistically
    * independent of the features and the Bayes-optimal holdout
    * accuracy IS the base rate — which is precisely what the eval
    * exists to expose before anyone ships such a filter.
    * Learnability of a separable target is pinned in ClassifierSpec
    * (100% train accuracy, planted-vocabulary weight signs).
    */
  private val textClassifierEval = CatalogEntry(
    "text_classifier_eval",
    (s, dir) => Classifier.trainEval(
        QuerySupport.table(s, dir, "documents"), col("lang") === "en"),
    Some {
      val decode = hexDecode4("md5(feat)")
      s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |f AS (SELECT doc_id, unnest(w) AS feat FROM tk
         |      UNION ALL
         |      SELECT doc_id, unnest(list_transform(range(1, len(w)),
         |        i -> w[i] || ' ' || w[i + 1])) AS feat FROM tk),
         |fb AS (SELECT doc_id, CAST(($decode) AS BIGINT) AS bucket,
         |        count(*) AS x FROM f GROUP BY 1, 2
         |       UNION ALL
         |       SELECT doc_id, CAST(65536 AS BIGINT), CAST(1 AS BIGINT)
         |       FROM documents),
         |lab AS (SELECT doc_id,
         |        CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
         |tr AS (SELECT * FROM lab WHERE doc_id % 5 <> 0),
         |te AS (SELECT * FROM lab WHERE doc_id % 5 = 0),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM tr),
         |e1 AS (SELECT doc_id, CAST(500000 - 1000000 * y AS BIGINT) AS err
         |       FROM tr),
         |g1 AS (SELECT bucket, sum(x * err) AS g
         |       FROM fb JOIN e1 USING (doc_id) GROUP BY bucket),
         |w1 AS (SELECT bucket, -(g // (2 * nd)) AS w FROM g1 CROSS JOIN nn),
         |m2 AS (SELECT doc_id, sum(x * w) AS m
         |       FROM fb JOIN w1 USING (bucket) GROUP BY doc_id),
         |e2 AS (SELECT tr.doc_id,
         |        least(greatest(500000 + m // 4, 0), 1000000) - 1000000 * y AS err
         |       FROM tr JOIN m2 USING (doc_id)),
         |g2 AS (SELECT bucket, sum(x * err) AS g
         |       FROM fb JOIN e2 USING (doc_id) GROUP BY bucket),
         |w2 AS (SELECT w1.bucket, w1.w - (g2.g // (2 * nd)) AS w
         |       FROM w1 JOIN g2 USING (bucket) CROSS JOIN nn),
         |mf AS (SELECT doc_id, CAST(sum(x * w) AS BIGINT) AS m
         |       FROM fb JOIN w2 USING (bucket) GROUP BY doc_id),
         |sc AS (SELECT te.doc_id, y, coalesce(mf.m, 0) >= 0 AS p
         |       FROM te LEFT JOIN mf USING (doc_id)),
         |cf AS (SELECT CAST(count(*) AS BIGINT) AS n_test,
         |         CAST(sum(CASE WHEN p AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |         CAST(sum(CASE WHEN p AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |         CAST(sum(CASE WHEN NOT p AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |         CAST(sum(CASE WHEN NOT p AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
         |       FROM sc)
         |SELECT nd AS n_train, n_test, tp, fp, fn, tn,
         |  (tp + tn) * 1000000 // greatest(n_test, 1) AS accuracy_micro,
         |  tp * 1000000 // greatest(tp + fp, 1) AS precision_micro,
         |  tp * 1000000 // greatest(tp + fn, 1) AS recall_micro,
         |  2 * tp * 1000000 // greatest(2 * tp + fp + fn, 1) AS f1_micro
         |FROM cf CROSS JOIN nn""".stripMargin
    })

  /** The classifier's convergence curve (r15 judge next-7): one row
    * per epoch boundary — exact integer L1 loss of the hard-sigmoid
    * link plus sign-of-margin accuracy, so training quality is a
    * hash-gated NUMBER, not an inference from the final weights. The
    * oracle unrolls the same 2-epoch CTE chain as
    * `text_classifier_train` and adds one stats rollup per boundary
    * (epoch 0 is the analytic w = 0 state: every margin 0).
    */
  private val textClassifierCurve = CatalogEntry(
    "text_classifier_curve",
    (s, dir) => Classifier.trainCurve(
        QuerySupport.table(s, dir, "documents"), col("lang") === "en")
      .orderBy("epoch"),
    Some {
      val decode = hexDecode4("md5(feat)")
      s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |f AS (SELECT doc_id, unnest(w) AS feat FROM tk
         |      UNION ALL
         |      SELECT doc_id, unnest(list_transform(range(1, len(w)),
         |        i -> w[i] || ' ' || w[i + 1])) AS feat FROM tk),
         |fb AS MATERIALIZED (SELECT doc_id, CAST(($decode) AS BIGINT) AS bucket,
         |        count(*) AS x FROM f GROUP BY 1, 2
         |       UNION ALL
         |       SELECT doc_id, CAST(65536 AS BIGINT), CAST(1 AS BIGINT)
         |       FROM documents),
         |lab AS MATERIALIZED (SELECT doc_id,
         |        CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
         |e1 AS (SELECT doc_id, CAST(500000 - 1000000 * y AS BIGINT) AS err
         |       FROM lab),
         |g1 AS (SELECT bucket, sum(x * err) AS g
         |       FROM fb JOIN e1 USING (doc_id) GROUP BY bucket),
         |w1 AS MATERIALIZED (SELECT bucket, -(g // (2 * nd)) AS w
         |       FROM g1 CROSS JOIN nn),
         |m2 AS MATERIALIZED (SELECT doc_id, sum(x * w) AS m
         |       FROM fb JOIN w1 USING (bucket) GROUP BY doc_id),
         |e2 AS (SELECT lab.doc_id,
         |        least(greatest(500000 + m // 4, 0), 1000000) - 1000000 * y AS err
         |       FROM lab JOIN m2 USING (doc_id)),
         |g2 AS (SELECT bucket, sum(x * err) AS g
         |       FROM fb JOIN e2 USING (doc_id) GROUP BY bucket),
         |w2 AS (SELECT w1.bucket, w1.w - (g2.g // (2 * nd)) AS w
         |       FROM w1 JOIN g2 USING (bucket) CROSS JOIN nn),
         |mf AS (SELECT doc_id, CAST(sum(x * w) AS BIGINT) AS m
         |       FROM fb JOIN w2 USING (bucket) GROUP BY doc_id),
         |s0 AS (SELECT CAST(0 AS BIGINT) AS epoch,
         |         CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum(abs(500000 - 1000000 * y)) AS BIGINT) AS sum_abs_err,
         |         CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
         |       FROM lab),
         |s1 AS (SELECT CAST(1 AS BIGINT), CAST(count(*) AS BIGINT),
         |         CAST(sum(abs(least(greatest(500000 + m // 4, 0), 1000000)
         |           - 1000000 * y)) AS BIGINT),
         |         CAST(sum(CASE WHEN (m >= 0) = (y = 1) THEN 1 ELSE 0 END) AS BIGINT)
         |       FROM lab JOIN m2 USING (doc_id)),
         |s2 AS (SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT),
         |         CAST(sum(abs(least(greatest(500000 + m // 4, 0), 1000000)
         |           - 1000000 * y)) AS BIGINT),
         |         CAST(sum(CASE WHEN (m >= 0) = (y = 1) THEN 1 ELSE 0 END) AS BIGINT)
         |       FROM lab JOIN mf USING (doc_id))
         |SELECT epoch, n_docs, sum_abs_err,
         |  sum_abs_err // n_docs AS mean_abs_err_micro, n_correct,
         |  n_correct * 1000000 // n_docs AS accuracy_micro
         |FROM (SELECT * FROM s0 UNION ALL SELECT * FROM s1
         |      UNION ALL SELECT * FROM s2) ORDER BY epoch""".stripMargin
    })

  /** Shared 2-epoch classifier-training CTE chain (the
    * text_classifier_train unroll, every multi-referenced frame
    * MATERIALIZED — the r15 driver-gate lesson), ending in
    * `lab(doc_id, y)` and `scored(doc_id, y, margin_micro, p_micro)`.
    */
  private def classifierScoredCtes: String = {
    val decode = hexDecode4("md5(feat)")
    s"""tk AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |f AS (SELECT doc_id, unnest(w) AS feat FROM tk
       |      UNION ALL
       |      SELECT doc_id, unnest(list_transform(range(1, len(w)),
       |        i -> w[i] || ' ' || w[i + 1])) AS feat FROM tk),
       |fb AS MATERIALIZED (SELECT doc_id, CAST(($decode) AS BIGINT) AS bucket,
       |        count(*) AS x FROM f GROUP BY 1, 2
       |       UNION ALL
       |       SELECT doc_id, CAST(65536 AS BIGINT), CAST(1 AS BIGINT)
       |       FROM documents),
       |lab AS MATERIALIZED (SELECT doc_id,
       |        CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
       |e1 AS (SELECT doc_id, CAST(500000 - 1000000 * y AS BIGINT) AS err
       |       FROM lab),
       |g1 AS (SELECT bucket, sum(x * err) AS g
       |       FROM fb JOIN e1 USING (doc_id) GROUP BY bucket),
       |w1 AS MATERIALIZED (SELECT bucket, -(g // (2 * nd)) AS w
       |       FROM g1 CROSS JOIN nn),
       |m2 AS (SELECT doc_id, sum(x * w) AS m
       |       FROM fb JOIN w1 USING (bucket) GROUP BY doc_id),
       |e2 AS (SELECT lab.doc_id,
       |        least(greatest(500000 + m // 4, 0), 1000000) - 1000000 * y AS err
       |       FROM lab JOIN m2 USING (doc_id)),
       |g2 AS (SELECT bucket, sum(x * err) AS g
       |       FROM fb JOIN e2 USING (doc_id) GROUP BY bucket),
       |w2 AS (SELECT w1.bucket, w1.w - (g2.g // (2 * nd)) AS w
       |       FROM w1 JOIN g2 USING (bucket) CROSS JOIN nn),
       |mf AS (SELECT doc_id, CAST(sum(x * w) AS BIGINT) AS margin_micro
       |       FROM fb JOIN w2 USING (bucket) GROUP BY doc_id),
       |scored AS MATERIALIZED (SELECT lab.doc_id, y, margin_micro,
       |        CAST(least(greatest(500000 + margin_micro // 4, 0), 1000000)
       |          AS BIGINT) AS p_micro
       |       FROM lab JOIN mf USING (doc_id))""".stripMargin
  }

  /** Tie-aware exact ROC-AUC over the trained margins — see
    * [[Classifier.aucFromScores]]: the corpus collapses to the
    * distinct-score frame in one doc-grain pass, only that bounded
    * frame rides the rank window, and the doubled-rank trick keeps
    * every column an exact BIGINT (gini derives from the floored
    * auc so both engines quantize identically).
    */
  private val textClassifierAuc = CatalogEntry(
    "text_classifier_auc",
    (s, dir) => Classifier.trainAuc(
        QuerySupport.table(s, dir, "documents"), col("lang") === "en"),
    Some(s"""WITH $classifierScoredCtes,
            |gr AS (SELECT margin_micro AS s, count(*) AS c, sum(y) AS p
            |       FROM scored GROUP BY 1),
            |wn AS (SELECT c, p,
            |        coalesce(sum(c) OVER (ORDER BY s
            |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
            |          0) AS cb
            |       FROM gr),
            |ag AS (SELECT CAST(sum(p) AS BIGINT) AS n_pos,
            |         CAST(sum(c - p) AS BIGINT) AS n_neg,
            |         CAST(count(*) AS BIGINT) AS n_score_groups,
            |         CAST(sum(p * (2 * cb + c + 1)) AS BIGINT) AS r2
            |       FROM wn),
            |au AS (SELECT n_pos, n_neg, n_score_groups,
            |         CAST(CASE WHEN n_pos = 0 OR n_neg = 0 THEN 500000
            |           ELSE (r2 - n_pos * (n_pos + 1)) * 1000000
            |             // (2 * n_pos * n_neg) END AS BIGINT) AS auc_ppm
            |       FROM ag)
            |SELECT n_pos, n_neg, n_score_groups, auc_ppm,
            |  CAST(2 * auc_ppm - 1000000 AS BIGINT) AS gini_ppm
            |FROM au""".stripMargin))

  /** Precision/recall operating-point sweep over the trained
    * hard-sigmoid probabilities — see [[Classifier.prSweep]]: one
    * scored pass, |thresholds| broadcast literal rows, exact integer
    * confusion + metrics per threshold.
    */
  private val textClassifierPrSweep = CatalogEntry(
    "text_classifier_pr_sweep",
    (s, dir) => Classifier.trainPrSweep(
        QuerySupport.table(s, dir, "documents"), col("lang") === "en"),
    Some {
      val ths = LlmDataParams.prSweepThresholdsPpm.mkString(", ")
      s"""WITH $classifierScoredCtes,
         |th AS (SELECT unnest([$ths]) AS threshold_ppm),
         |cf AS (SELECT threshold_ppm,
         |         CAST(sum(CASE WHEN p_micro >= threshold_ppm AND y = 1
         |           THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |         CAST(sum(CASE WHEN p_micro >= threshold_ppm AND y = 0
         |           THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |         CAST(sum(CASE WHEN p_micro < threshold_ppm AND y = 1
         |           THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |         CAST(sum(CASE WHEN p_micro < threshold_ppm AND y = 0
         |           THEN 1 ELSE 0 END) AS BIGINT) AS tn
         |       FROM scored CROSS JOIN th GROUP BY threshold_ppm)
         |SELECT CAST(threshold_ppm AS BIGINT) AS threshold_ppm,
         |  tp, fp, fn, tn,
         |  tp * 1000000 // greatest(tp + fp, 1) AS precision_micro,
         |  tp * 1000000 // greatest(tp + fn, 1) AS recall_micro,
         |  2 * tp * 1000000 // greatest(2 * tp + fp + fn, 1) AS f1_micro
         |FROM cf ORDER BY threshold_ppm""".stripMargin
    })

  /** Holdout ROC-AUC: the trainEval split (fit on id % 5 ≠ 0), the
    * held-out slice ranked with the learned weights, the doubled-rank
    * exact AUC on the distinct-margin frame — read against
    * `text_classifier_auc` for the overfit gap.
    */
  private val textClassifierAucHoldout = CatalogEntry(
    "text_classifier_auc_holdout",
    (s, dir) => Classifier.trainAucHoldout(
        QuerySupport.table(s, dir, "documents"), col("lang") === "en"),
    Some {
      val decode = hexDecode4("md5(feat)")
      s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |f AS (SELECT doc_id, unnest(w) AS feat FROM tk
         |      UNION ALL
         |      SELECT doc_id, unnest(list_transform(range(1, len(w)),
         |        i -> w[i] || ' ' || w[i + 1])) AS feat FROM tk),
         |fb AS MATERIALIZED (SELECT doc_id, CAST(($decode) AS BIGINT) AS bucket,
         |        count(*) AS x FROM f GROUP BY 1, 2
         |       UNION ALL
         |       SELECT doc_id, CAST(65536 AS BIGINT), CAST(1 AS BIGINT)
         |       FROM documents),
         |lab AS MATERIALIZED (SELECT doc_id,
         |        CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
         |tr AS (SELECT * FROM lab WHERE doc_id % 5 <> 0),
         |te AS (SELECT * FROM lab WHERE doc_id % 5 = 0),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM tr),
         |e1 AS (SELECT doc_id, CAST(500000 - 1000000 * y AS BIGINT) AS err
         |       FROM tr),
         |g1 AS (SELECT bucket, sum(x * err) AS g
         |       FROM fb JOIN e1 USING (doc_id) GROUP BY bucket),
         |w1 AS MATERIALIZED (SELECT bucket, -(g // (2 * nd)) AS w
         |       FROM g1 CROSS JOIN nn),
         |m2 AS (SELECT doc_id, sum(x * w) AS m
         |       FROM fb JOIN w1 USING (bucket) GROUP BY doc_id),
         |e2 AS (SELECT tr.doc_id,
         |        least(greatest(500000 + m // 4, 0), 1000000) - 1000000 * y AS err
         |       FROM tr JOIN m2 USING (doc_id)),
         |g2 AS (SELECT bucket, sum(x * err) AS g
         |       FROM fb JOIN e2 USING (doc_id) GROUP BY bucket),
         |w2 AS (SELECT w1.bucket, w1.w - (g2.g // (2 * nd)) AS w
         |       FROM w1 JOIN g2 USING (bucket) CROSS JOIN nn),
         |mf AS (SELECT doc_id, CAST(sum(x * w) AS BIGINT) AS m
         |       FROM fb JOIN w2 USING (bucket) GROUP BY doc_id),
         |sc AS (SELECT te.doc_id, y, coalesce(mf.m, 0) AS s
         |       FROM te LEFT JOIN mf USING (doc_id)),
         |gr AS (SELECT s, count(*) AS c, sum(y) AS p FROM sc GROUP BY 1),
         |wn AS (SELECT c, p,
         |        coalesce(sum(c) OVER (ORDER BY s
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |          0) AS cb
         |       FROM gr),
         |ag AS (SELECT CAST(sum(p) AS BIGINT) AS n_pos,
         |         CAST(sum(c - p) AS BIGINT) AS n_neg,
         |         CAST(count(*) AS BIGINT) AS n_score_groups,
         |         CAST(sum(p * (2 * cb + c + 1)) AS BIGINT) AS r2
         |       FROM wn),
         |au AS (SELECT n_pos, n_neg, n_score_groups,
         |         CAST(CASE WHEN n_pos = 0 OR n_neg = 0 THEN 500000
         |           ELSE (r2 - n_pos * (n_pos + 1)) * 1000000
         |             // (2 * n_pos * n_neg) END AS BIGINT) AS auc_ppm
         |       FROM ag)
         |SELECT n_pos, n_neg, n_score_groups, auc_ppm,
         |  CAST(2 * auc_ppm - 1000000 AS BIGINT) AS gini_ppm
         |FROM au""".stripMargin
    })

  /** Unigram-LM surprisal: per-vocab-entry micro-nat quantization
    * makes the per-doc total an exact BIGINT sum on both engines; only
    * the final fixed-order divisions are float. `exp` is deliberately
    * absent (1-ulp engine divergence).
    */
  /** Shared unigram-surprisal CTE chain ending in
    * `a(doc_id, n_tokens, s)` — exact integer micro-nat totals.
    */
  private val surprisalCtes: String =
    """t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |c AS (SELECT term, count(*) AS cnt FROM t GROUP BY term),
      |tot AS (SELECT count(*) AS total FROM t),
      |lm AS (SELECT term,
      |        CAST(floor(ln(CAST(tot.total AS DOUBLE) / CAST(c.cnt AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS s_unat
      |       FROM c CROSS JOIN tot),
      |a AS (SELECT t.doc_id, count(*) AS n_tokens, sum(lm.s_unat) AS s
      |      FROM t JOIN lm USING (term) GROUP BY t.doc_id)""".stripMargin

  private val textSurprisal = CatalogEntry(
    "text_unigram_surprisal",
    (s, dir) => {
      val t = TextAnalysis.unigramSurprisal(
        QuerySupport.table(s, dir, "documents"))
      t.select(col("doc_id"), col("n_tokens"), col("surprisal_unats"),
        r6(col("avg_nats")).as("avg_nats"),
        r6(col("bits_per_token")).as("bits_per_token"))
        .orderBy("doc_id")
    },
    Some(s"""WITH $surprisalCtes
            |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
            |  CAST(s AS BIGINT) AS surprisal_unats,
            |  ${r6s("CAST(s AS DOUBLE) / 1000000.0 / n_tokens")} AS avg_nats,
            |  ${r6s("CAST(s AS DOUBLE) / 1000000.0 / n_tokens / ln(2.0)")} AS bits_per_token
            |FROM a ORDER BY doc_id""".stripMargin))

  /** Bigram conditional surprisal: same per-vocab-entry micro-nat
    * quantization as the unigram oracle, with the prefix counts as
    * the MLE denominator.
    */
  private val textBigramSurprisal = CatalogEntry(
    "text_bigram_surprisal",
    (s, dir) => TextAnalysis.bigramSurprisal(
        QuerySupport.table(s, dir, "documents"))
      .select(col("doc_id"), col("n_bigrams"), col("surprisal_unats"),
        r6(col("avg_nats")).as("avg_nats"),
        r6(col("bits_per_bigram")).as("bits_per_bigram"))
      .orderBy("doc_id"),
    Some(s"""WITH wb AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
            |b2 AS (SELECT doc_id,
            |         unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])) AS bg
            |       FROM wb WHERE len(w) >= 2),
            |b3 AS (SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1 FROM b2),
            |cn AS (SELECT bg, w1, count(*) AS cnt FROM b3 GROUP BY bg, w1),
            |pf AS (SELECT w1, count(*) AS pcnt FROM b3 GROUP BY w1),
            |lm AS (SELECT bg,
            |         CAST(floor(ln(CAST(pcnt AS DOUBLE) / CAST(cnt AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS s
            |       FROM cn JOIN pf USING (w1)),
            |a AS (SELECT b3.doc_id, count(*) AS n_bigrams, sum(lm.s) AS s
            |      FROM b3 JOIN lm USING (bg) GROUP BY b3.doc_id)
            |SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
            |  CAST(s AS BIGINT) AS surprisal_unats,
            |  ${r6s("CAST(s AS DOUBLE) / 1000000.0 / n_bigrams")} AS avg_nats,
            |  ${r6s("CAST(s AS DOUBLE) / 1000000.0 / n_bigrams / ln(2.0)")} AS bits_per_bigram
            |FROM a ORDER BY doc_id""".stripMargin))

  /** Per-source KL drift: pico-nat quantized contributions, exact
    * BIGINT per-source sums — the entropy-cell scheme at higher
    * precision because each cell is O(1/vocab).
    */
  private val textSourceKlDrift = CatalogEntry(
    "text_source_kl_drift",
    (s, dir) => TextAnalysis.sourceKlDrift(
        QuerySupport.table(s, dir, "documents"))
      .select(col("source"), col("n_terms"), col("tot_tokens"),
        col("kl_pnats"), r6(col("kl_nats")).as("kl_nats"))
      .orderBy("source"),
    Some(s"""WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS term FROM documents),
            |ts AS (SELECT source, term, count(*) AS cnt FROM t GROUP BY source, term),
            |bs AS (SELECT source, sum(cnt) AS tot_s FROM ts GROUP BY source),
            |bt AS (SELECT term, sum(cnt) AS cnt_t FROM ts GROUP BY term),
            |tot AS (SELECT sum(cnt) AS tot FROM ts),
            |c AS (SELECT ts.source,
            |        CAST(floor(
            |          (CAST(ts.cnt AS DOUBLE) / CAST(bs.tot_s AS DOUBLE))
            |          * ln((CAST(ts.cnt AS DOUBLE) * CAST(tot.tot AS DOUBLE))
            |               / (CAST(bs.tot_s AS DOUBLE) * CAST(bt.cnt_t AS DOUBLE)))
            |          * 1000000000000.0 + 0.5) AS BIGINT) AS c,
            |        bs.tot_s
            |      FROM ts JOIN bt USING (term) JOIN bs USING (source) CROSS JOIN tot)
            |SELECT source, count(*) AS n_terms, CAST(max(tot_s) AS BIGINT) AS tot_tokens,
            |  CAST(sum(c) AS BIGINT) AS kl_pnats,
            |  ${r6s("CAST(sum(c) AS DOUBLE) / 1000000000000.0")} AS kl_nats
            |FROM c GROUP BY source ORDER BY source""".stripMargin))

  /** Per-source corpus health report: micro-nat entropy cells make the
    * per-source sum exact; every other column is counts and
    * fixed-order divisions.
    */
  private val textSourceReport = CatalogEntry(
    "text_source_report",
    (s, dir) => {
      val t = TextAnalysis.sourceReport(QuerySupport.table(s, dir, "documents"))
      t.select(col("source"), col("n_docs"), col("n_tokens"),
        col("n_distinct_texts"), r6(col("dup_frac")).as("dup_frac"),
        r6(col("mean_chars")).as("mean_chars"), col("entropy_unats"),
        r6(col("lang_entropy")).as("lang_entropy"))
        .orderBy("source")
    },
    Some(s"""WITH ps AS (SELECT source, count(*) AS n_docs,
            |    sum(len(string_split(text, ' '))) AS n_tokens,
            |    count(DISTINCT md5(text)) AS n_distinct_texts,
            |    sum(length(text)) AS chars
            |  FROM documents GROUP BY source),
            |lt AS (SELECT d.source,
            |    CAST(floor((CAST(count(*) AS DOUBLE) / CAST(ps.n_docs AS DOUBLE))
            |      * ln(CAST(count(*) AS DOUBLE) / CAST(ps.n_docs AS DOUBLE))
            |      * 1000000.0 + 0.5) AS BIGINT) AS t
            |  FROM documents d JOIN ps USING (source)
            |  GROUP BY d.source, d.lang, ps.n_docs),
            |e AS (SELECT source, -sum(t) AS entropy_unats FROM lt GROUP BY source)
            |SELECT ps.source, CAST(n_docs AS BIGINT) AS n_docs,
            |  CAST(n_tokens AS BIGINT) AS n_tokens,
            |  CAST(n_distinct_texts AS BIGINT) AS n_distinct_texts,
            |  ${r6s("CAST(n_docs - n_distinct_texts AS DOUBLE) / n_docs")} AS dup_frac,
            |  ${r6s("CAST(chars AS DOUBLE) / n_docs")} AS mean_chars,
            |  CAST(entropy_unats AS BIGINT) AS entropy_unats,
            |  ${r6s("CAST(entropy_unats AS DOUBLE) / 1000000.0")} AS lang_entropy
            |FROM ps JOIN e USING (source) ORDER BY ps.source""".stripMargin))

  /** CCNet head/middle/tail perplexity thirds per language: the sort
    * key and the bucket index are exact BIGINT floor-divisions, so the
    * whole labeling replays engine-identically.
    */
  private val textSurprisalBuckets = CatalogEntry(
    "text_surprisal_buckets",
    (s, dir) => TextAnalysis.surprisalBuckets(
        QuerySupport.table(s, dir, "documents"))
      .orderBy("doc_id"),
    Some(s"""WITH $surprisalCtes,
            |b AS (SELECT d.doc_id, d.lang, (a.s * 1000) // a.n_tokens AS munats_per_token
            |      FROM documents d JOIN a ON a.doc_id = d.doc_id),
            |r AS (SELECT doc_id, lang, munats_per_token,
            |        row_number() OVER (PARTITION BY lang ORDER BY munats_per_token, doc_id) AS rnk,
            |        count(*) OVER (PARTITION BY lang) AS n_lang
            |      FROM b)
            |SELECT doc_id, lang, CAST(munats_per_token AS BIGINT) AS munats_per_token,
            |  rnk, n_lang,
            |  (['head', 'middle', 'tail'])[CAST((rnk - 1) * 3 // n_lang AS INT) + 1] AS bucket
            |FROM r ORDER BY doc_id""".stripMargin))

  /** The scale spelling (VERDICT r11 §wrong-2): thresholds from an
    * exact rank over the `doc_id % 4` sample — deterministic integer
    * arithmetic end to end, so unlike the `percentile_approx` sibling
    * it hash-checks against DuckDB like every other catalog query.
    * The sort window runs over the SAMPLE only; the assignment is a
    * broadcast-threshold comparison, no per-language global sort.
    */
  private val textSurprisalBucketsScaled = CatalogEntry(
    "text_surprisal_buckets_scaled",
    (s, dir) => TextAnalysis.surprisalBucketsSampled(
        QuerySupport.table(s, dir, "documents"))
      .orderBy("doc_id"),
    Some(s"""WITH $surprisalCtes,
            |b AS (SELECT d.doc_id, d.lang, (a.s * 1000) // a.n_tokens AS munats_per_token
            |      FROM documents d JOIN a ON a.doc_id = d.doc_id),
            |r AS (SELECT lang, munats_per_token,
            |        row_number() OVER (PARTITION BY lang ORDER BY munats_per_token, doc_id) AS rnk,
            |        count(*) OVER (PARTITION BY lang) AS ns
            |      FROM b WHERE doc_id % 4 = 0),
            |th AS (SELECT lang,
            |         max(CASE WHEN rnk = (ns + 2) // 3 THEN munats_per_token END) AS t1,
            |         max(CASE WHEN rnk = (2 * ns + 2) // 3 THEN munats_per_token END) AS t2
            |       FROM r GROUP BY lang)
            |SELECT b.doc_id, b.lang,
            |  CAST(b.munats_per_token AS BIGINT) AS munats_per_token,
            |  CASE WHEN th.t1 IS NULL THEN 'head'
            |       WHEN b.munats_per_token <= th.t1 THEN 'head'
            |       WHEN b.munats_per_token <= th.t2 THEN 'middle'
            |       ELSE 'tail' END AS bucket
            |FROM b LEFT JOIN th USING (lang) ORDER BY doc_id""".stripMargin))

  /** Composed quality gate: the oracle re-derives all four component
    * chains — Gopher rules, heuristic quality, hashed classifier,
    * sampled surprisal buckets — with renamed CTEs and joins them on
    * doc_id; every conjunct is the exact integer arithmetic its
    * standalone oracle already hash-checks.
    */
  /** The ensemble's CTE chain (all four component branches), shared by
    * the entry below and the composed `curation_pipeline_v2` oracle.
    */
  private lazy val ensembleCtesSql: String = {
      val stops = TextAnalysis.gopherStops.map(s => s"'$s'").mkString(", ")
      val decode = hexDecode4("h", posFn = "strpos", substrFn = "substr")
      s"""gw AS (SELECT doc_id, text, string_split(text, ' ') AS w,
         |             string_split(text, chr(10)) AS l FROM documents),
         |gm AS (SELECT doc_id,
         |        CAST(len(w) AS BIGINT) AS n_words,
         |        COALESCE(list_sum(list_transform(w, x -> len(x))), 0) AS chars,
         |        len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS alpha,
         |        len(text) - len(replace(text, '#', '')) AS hash,
         |        (len(text) - len(replace(text, '...', ''))) // 3 AS ell,
         |        len(l) AS nl,
         |        len(list_filter(l, x -> starts_with(ltrim(x), '-') OR starts_with(ltrim(x), '*') OR starts_with(ltrim(x), '•'))) AS bul,
         |        len(list_filter(l, x -> ends_with(rtrim(x), '...'))) AS elll,
         |        len(list_intersect(list_distinct(w), [$stops])) AS stop
         |      FROM gw),
         |gf AS (SELECT doc_id,
         |        CASE WHEN n_words >= 50 AND n_words <= 100000 THEN 1 ELSE 0 END
         |        + CASE WHEN chars >= 3 * n_words AND chars <= 10 * n_words THEN 1 ELSE 0 END
         |        + CASE WHEN (hash + ell) * 10 < n_words THEN 1 ELSE 0 END
         |        + CASE WHEN bul * 10 < nl * 9 THEN 1 ELSE 0 END
         |        + CASE WHEN elll * 10 < nl * 3 THEN 1 ELSE 0 END
         |        + CASE WHEN alpha * 5 >= n_words * 4 THEN 1 ELSE 0 END
         |        + CASE WHEN stop >= 2 THEN 1 ELSE 0 END AS n_pass
         |      FROM gm),
         |gk AS (SELECT doc_id, CAST(7 - n_pass AS BIGINT) AS gopher_n_failed,
         |         CAST(CASE WHEN n_pass = 7 THEN 1 ELSE 0 END AS BIGINT) AS gopher_keep
         |       FROM gf),
         |qm AS (SELECT doc_id, len(w) AS n_tokens, len(list_distinct(w)) AS n_distinct,
         |        list_sum(list_transform(w, t -> len(t))) AS tot_len,
         |        len(list_filter(w, t -> t IN ${inList(stopwords)})) AS n_stop FROM gw),
         |qq AS (SELECT doc_id,
         |        CAST(floor((0.4 * (n_distinct / n_tokens) + 0.3 * (1.0 - n_stop / n_tokens)
         |          + 0.3 * least(1.0, n_tokens / 50.0)) * 1000000.0 + 0.5) AS BIGINT) AS quality_micro
         |       FROM qm),
         |cf AS (SELECT doc_id, list_concat(w,
         |        CASE WHEN len(w) >= 2
         |        THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])
         |        ELSE []::VARCHAR[] END) AS f FROM gw),
         |cs AS (SELECT doc_id, CAST(list_sum(list_transform(list_transform(f, t -> md5(t)),
         |          h -> ($decode) % 21 - 10)) AS BIGINT) AS cls_score
         |       FROM cf),
         |$surprisalCtes,
         |b AS (SELECT d.doc_id, d.lang, (a.s * 1000) // a.n_tokens AS munats_per_token
         |      FROM documents d JOIN a ON a.doc_id = d.doc_id),
         |r AS (SELECT lang, munats_per_token,
         |        row_number() OVER (PARTITION BY lang ORDER BY munats_per_token, doc_id) AS rnk,
         |        count(*) OVER (PARTITION BY lang) AS ns
         |      FROM b WHERE doc_id % 4 = 0),
         |th AS (SELECT lang,
         |         max(CASE WHEN rnk = (ns + 2) // 3 THEN munats_per_token END) AS t1,
         |         max(CASE WHEN rnk = (2 * ns + 2) // 3 THEN munats_per_token END) AS t2
         |       FROM r GROUP BY lang),
         |bk AS (SELECT b.doc_id,
         |        CASE WHEN th.t1 IS NULL THEN 'head'
         |             WHEN b.munats_per_token <= th.t1 THEN 'head'
         |             WHEN b.munats_per_token <= th.t2 THEN 'middle'
         |             ELSE 'tail' END AS bucket
         |       FROM b LEFT JOIN th USING (lang))""".stripMargin
  }

  private val textQualityEnsemble = CatalogEntry(
    "text_quality_ensemble",
    (s, dir) => TextAnalysis.qualityEnsemble(
        QuerySupport.table(s, dir, "documents"))
      .orderBy("doc_id"),
    Some(s"""WITH $ensembleCtesSql
            |SELECT gk.doc_id, qq.quality_micro, gk.gopher_n_failed, gk.gopher_keep,
            |  cs.cls_score, bk.bucket,
            |  (gk.gopher_keep = 1 AND cs.cls_score >= 0 AND bk.bucket <> 'tail'
            |   AND qq.quality_micro >= 300000) AS keep
            |FROM gk JOIN qq USING (doc_id) JOIN cs USING (doc_id) JOIN bk USING (doc_id)
            |ORDER BY doc_id""".stripMargin))

  /** The composed curation verdict: four already-oracled chains
    * (normalized dedup, ensemble gate, cluster decontamination,
    * mixture draw) stitched into ONE WITH block with disjoint CTE
    * names — the proof the round's gates chain hash-exactly.
    */
  /** The v2 verdict's full WITH body (all four component chains,
    * disjoint CTE names, ending in the four per-doc verdict frames) —
    * shared by `curation_pipeline_v2` and the span-extended
    * `curation_pipeline_v3` oracle.
    */
  private lazy val curationVerdictCtes: String = {
      val sw = shingleWidth
      val cat = (0 until sw).map(o => s"w2[i+$o]").mkString(" || ' ' || ")
      val shingle = s"list_transform(range(1, greatest(len(w2) - ${sw - 2}, 1)), i -> $cat)"
      val md5s = "md5('mix:' || CAST(doc_id AS VARCHAR))"
      val hi = hexDecode4(s"substr($md5s, 1, 4)", posFn = "strpos", substrFn = "substr")
      val lo = hexDecode4(s"substr($md5s, 5, 4)", posFn = "strpos", substrFn = "substr")
      val tw = mixtureTargets.toSeq.sortBy(_._1)
        .map { case (s, w) => s"WHEN '$s' THEN $w" }
        .mkString("CASE source ", " ", " ELSE 0 END")
      val norm = "array_to_string(list_filter(string_split(" +
        "replace(replace(replace(replace(replace(replace(lower(text), " +
        "'.', ''), ',', ''), '!', ''), '?', ''), ';', ''), ':', '')" +
        ", ' '), x -> x != ''), ' ')"
      s"""$clustersCtes,
         |cl AS (SELECT d.doc_id, coalesce(r.root_id, d.doc_id) AS root_id
         |       FROM documents d LEFT JOIN roots r USING (doc_id)),
         |$ensembleCtesSql,
         |ensk AS (SELECT gk.doc_id,
         |           (gk.gopher_keep = 1 AND cs.cls_score >= 0 AND bk.bucket <> 'tail'
         |            AND qq.quality_micro >= 300000) AS quality_keep
         |         FROM gk JOIN qq USING (doc_id) JOIN cs USING (doc_id) JOIN bk USING (doc_id)),
         |nn AS (SELECT doc_id, md5($norm) AS nh FROM documents),
         |ng AS (SELECT nh, min(doc_id) AS keep_id FROM nn GROUP BY nh),
         |d1 AS (SELECT nn.doc_id, nn.doc_id = ng.keep_id AS dedup_keep FROM nn JOIN ng USING (nh)),
         |we AS (SELECT doc_id, string_split(text, ' ') AS w2 FROM documents WHERE doc_id % 97 = 0),
         |eg AS (SELECT DISTINCT unnest($shingle) AS g FROM we),
         |wt AS (SELECT doc_id, string_split(text, ' ') AS w2 FROM documents),
         |tg AS (SELECT DISTINCT doc_id, unnest($shingle) AS g FROM wt),
         |hits AS (SELECT doc_id, count(*) AS n FROM tg JOIN eg USING (g) GROUP BY doc_id),
         |fd AS (SELECT d.doc_id, cl.root_id, (h.n IS NOT NULL) AS contaminated
         |       FROM documents d JOIN cl USING (doc_id) LEFT JOIN hits h USING (doc_id)),
         |decf AS (SELECT doc_id,
         |           max(CASE WHEN contaminated THEN 1 ELSE 0 END)
         |             OVER (PARTITION BY root_id) = 1 AS cluster_contaminated
         |         FROM fd),
         |tk AS (SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
         |ns AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS ns FROM tk GROUP BY source),
         |nt AS (SELECT CAST(sum(ns) AS BIGINT) AS nt FROM ns),
         |rt AS (SELECT source, least(1000000, ($tw) * nt.nt // ns.ns) AS rate_micro FROM ns, nt),
         |mixh AS (SELECT tk.doc_id, rt.rate_micro, ($hi) * 65536 + ($lo) AS hv FROM tk JOIN rt USING (source)),
         |mixk AS (SELECT doc_id, hv * 1000000 < rate_micro * 4294967296 AS mixture_keep FROM mixh)""".stripMargin
  }

  private val curationPipelineV2 = CatalogEntry(
    "curation_pipeline_v2",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents")
      Curation.curationVerdicts(d,
          d.filter(col("doc_id") % 97 === 0).select("doc_id", "text"),
          mixtureTargets)
        .orderBy("doc_id")
    },
    Some(s"""WITH RECURSIVE $curationVerdictCtes
         |SELECT d1.doc_id, d1.dedup_keep, ensk.quality_keep,
         |  NOT decf.cluster_contaminated AS decontam_keep, mixk.mixture_keep,
         |  (d1.dedup_keep AND ensk.quality_keep AND NOT decf.cluster_contaminated
         |   AND mixk.mixture_keep) AS keep
         |FROM d1 JOIN ensk USING (doc_id) JOIN decf USING (doc_id) JOIN mixk USING (doc_id)
         |ORDER BY doc_id""".stripMargin))

  /** The v3 capstone: v2's four gates plus the SPAN-level conjunct
    * (dup-span coverage at or under 50% — Lee et al. 2022's signal
    * that a digest-unique document can still be mostly corpus
    * boilerplate). The span CTEs replay `text_dup_span_coverage`
    * with `sp`-prefixed names; a sub-shingle document covers zero
    * positions and passes, like the operator.
    */
  private val curationPipelineV3 = CatalogEntry(
    "curation_pipeline_v3",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents")
      Curation.curationVerdictsV3(d,
          d.filter(col("doc_id") % 97 === 0).select("doc_id", "text"),
          mixtureTargets)
        .orderBy("doc_id")
    },
    Some {
      val sw = shingleWidth
      val cat = (0 until sw).map(o => s"spw[i+$o]").mkString(" || ' ' || ")
      s"""WITH RECURSIVE $curationVerdictCtes,
         |spwt AS (SELECT doc_id, string_split(text, ' ') AS spw FROM documents),
         |spp AS (SELECT doc_id, spw,
         |          unnest(range(1, greatest(len(spw) - ${sw - 2}, 1))) AS i FROM spwt),
         |spg AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, $cat AS g FROM spp),
         |spocc AS (SELECT g, count(*) AS occ FROM spg GROUP BY g HAVING count(*) >= 2),
         |spd AS (SELECT doc_id, pos FROM spg JOIN spocc USING (g)),
         |spc AS (SELECT doc_id, pos,
         |          lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt FROM spd),
         |spcov AS (SELECT doc_id,
         |            sum(CASE WHEN nxt IS NULL THEN $sw
         |                     ELSE least($sw, nxt - pos) END) AS covered
         |          FROM spc GROUP BY doc_id),
         |spn AS (SELECT doc_id, len(spw) AS n_tokens FROM spwt),
         |spk AS (SELECT spn.doc_id,
         |          coalesce(spcov.covered, 0) * 1000000 // spn.n_tokens <= 500000 AS span_keep
         |        FROM spn LEFT JOIN spcov USING (doc_id))
         |SELECT d1.doc_id, d1.dedup_keep, ensk.quality_keep,
         |  NOT decf.cluster_contaminated AS decontam_keep, mixk.mixture_keep,
         |  spk.span_keep,
         |  (d1.dedup_keep AND ensk.quality_keep AND NOT decf.cluster_contaminated
         |   AND mixk.mixture_keep AND spk.span_keep) AS keep
         |FROM d1 JOIN ensk USING (doc_id) JOIN decf USING (doc_id)
         |  JOIN mixk USING (doc_id) JOIN spk USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    })

  /** The v4 capstone: v3's five gates plus DSIR target-likeness
    * (`logw >= 0`) and n-gram novelty (`>= noveltyGateMicro`); the
    * added CTEs carry `ds`/`nv` prefixes, and sub-shingle documents
    * pass the novelty gate via the `spn` universe LEFT JOIN.
    */
  /** The v4 capstone's full WITH body (the v2/v3 chains plus the
    * span / DSIR / novelty frames) — shared by `curation_pipeline_v4`
    * and the classifier-extended `curation_pipeline_v5` oracle.
    */
  private lazy val curationV4Ctes: String = {
      val sw = shingleWidth
      val cat = (0 until sw).map(o => s"spw[i+$o]").mkString(" || ' ' || ")
      val hx = hexDecode4("md5(dsterm)", posFn = "strpos", substrFn = "substr")
      val b = dsirBuckets
      val nvcat = (0 until sw).map(o => s"nvw2[i+$o]").mkString(" || ' ' || ")
      s"""$curationVerdictCtes,
         |spwt AS (SELECT doc_id, string_split(text, ' ') AS spw FROM documents),
         |spp AS (SELECT doc_id, spw,
         |          unnest(range(1, greatest(len(spw) - ${sw - 2}, 1))) AS i FROM spwt),
         |spg AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, $cat AS g FROM spp),
         |spocc AS (SELECT g, count(*) AS occ FROM spg GROUP BY g HAVING count(*) >= 2),
         |spd AS (SELECT doc_id, pos FROM spg JOIN spocc USING (g)),
         |spc AS (SELECT doc_id, pos,
         |          lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt FROM spd),
         |spcov AS (SELECT doc_id,
         |            sum(CASE WHEN nxt IS NULL THEN $sw
         |                     ELSE least($sw, nxt - pos) END) AS covered
         |          FROM spc GROUP BY doc_id),
         |spn AS (SELECT doc_id, len(spw) AS n_tokens FROM spwt),
         |spk AS (SELECT spn.doc_id,
         |          coalesce(spcov.covered, 0) * 1000000 // spn.n_tokens <= 500000 AS span_keep
         |        FROM spn LEFT JOIN spcov USING (doc_id)),
         |dst AS (SELECT doc_id, lang = '$dsirTargetLang' AS tgt,
         |          unnest(string_split(text, ' ')) AS dsterm FROM documents),
         |dsh AS (SELECT doc_id, tgt, ($hx) % $b AS dsb FROM dst),
         |dsm AS (SELECT dsb, count(*) AS raw_cnt,
         |          sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS tcnt
         |        FROM dsh GROUP BY dsb),
         |dstot AS (SELECT sum(raw_cnt) AS rt, sum(tcnt) AS tt FROM dsm),
         |dslr AS (SELECT dsb, CAST(floor(ln(
         |           (CAST(tcnt + 1 AS DOUBLE) * CAST(rt + $b AS DOUBLE)) /
         |           (CAST(raw_cnt + 1 AS DOUBLE) * CAST(tt + $b AS DOUBLE)))
         |           * 1000000.0 + 0.5) AS BIGINT) AS lr
         |         FROM dsm CROSS JOIN dstot),
         |dsa AS (SELECT doc_id, sum(lr) AS logw
         |        FROM dsh JOIN dslr USING (dsb) GROUP BY doc_id),
         |dsk AS (SELECT doc_id, logw >= 0 AS dsir_keep FROM dsa),
         |nvwt AS (SELECT doc_id, string_split(text, ' ') AS nvw2 FROM documents),
         |nvg AS (SELECT DISTINCT doc_id,
         |          unnest(list_transform(range(1, greatest(len(nvw2) - ${sw - 2}, 1)),
         |            i -> $nvcat)) AS nvgram
         |        FROM nvwt),
         |nvdf AS (SELECT nvgram, count(*) AS df FROM nvg GROUP BY nvgram),
         |nva AS (SELECT nvg.doc_id,
         |          CAST(sum(CASE WHEN nvdf.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |            * 1000000 // count(*) AS nov
         |        FROM nvg JOIN nvdf USING (nvgram) GROUP BY nvg.doc_id),
         |nvk AS (SELECT spn.doc_id,
         |          coalesce(nva.nov >= $noveltyGateMicro, TRUE) AS novelty_keep
         |        FROM spn LEFT JOIN nva USING (doc_id))""".stripMargin
  }

  private val curationPipelineV4 = CatalogEntry(
    "curation_pipeline_v4",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents")
      Curation.curationVerdictsV4(d,
          d.filter(col("doc_id") % 97 === 0).select("doc_id", "text"),
          mixtureTargets, target = col("lang") === dsirTargetLang)
        .orderBy("doc_id")
    },
    Some(s"""WITH RECURSIVE $curationV4Ctes
         |SELECT d1.doc_id, d1.dedup_keep, ensk.quality_keep,
         |  NOT decf.cluster_contaminated AS decontam_keep, mixk.mixture_keep,
         |  spk.span_keep, dsk.dsir_keep, nvk.novelty_keep,
         |  (d1.dedup_keep AND ensk.quality_keep AND NOT decf.cluster_contaminated
         |   AND mixk.mixture_keep AND spk.span_keep AND dsk.dsir_keep
         |   AND nvk.novelty_keep) AS keep
         |FROM d1 JOIN ensk USING (doc_id) JOIN decf USING (doc_id)
         |  JOIN mixk USING (doc_id) JOIN spk USING (doc_id)
         |  JOIN dsk USING (doc_id) JOIN nvk USING (doc_id)
         |ORDER BY doc_id""".stripMargin))

  /** The v5 capstone: v4's seven gates plus the SELF-TRAINED
    * classifier gate — the ensemble keep flag is the weak label for
    * the 2-epoch exact-integer fit (`tc`-prefixed CTEs replay the
    * `text_classifier_train` chain with `tclab` reading `ensk`), and
    * the eighth conjunct is the trained margin's sign.
    */
  /** The 2-epoch classifier-gate CTE chain (the `text_classifier_train`
    * replay with `tclab` reading `ensk`) — shared by the exact and the
    * anchored v5 capstone oracles.
    */
  private lazy val classifierGateCtes: String = {
      val decode = hexDecode4("md5(feat)")
      s"""tctk AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |tcf AS (SELECT doc_id, unnest(w) AS feat FROM tctk
         |        UNION ALL
         |        SELECT doc_id, unnest(list_transform(range(1, len(w)),
         |          i -> w[i] || ' ' || w[i + 1])) AS feat FROM tctk),
         |tcfb AS MATERIALIZED (SELECT doc_id, CAST(($decode) AS BIGINT) AS bucket,
         |          count(*) AS x FROM tcf GROUP BY 1, 2
         |        UNION ALL
         |        SELECT doc_id, CAST(65536 AS BIGINT), CAST(1 AS BIGINT)
         |        FROM documents),
         |tclab AS MATERIALIZED (SELECT doc_id,
         |          CASE WHEN quality_keep THEN 1 ELSE 0 END AS y FROM ensk),
         |tcnn AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
         |tce1 AS (SELECT doc_id, CAST(500000 - 1000000 * y AS BIGINT) AS err
         |         FROM tclab),
         |tcg1 AS (SELECT bucket, sum(x * err) AS g
         |         FROM tcfb JOIN tce1 USING (doc_id) GROUP BY bucket),
         |tcw1 AS MATERIALIZED (SELECT bucket, -(g // (2 * nd)) AS w
         |         FROM tcg1 CROSS JOIN tcnn),
         |tcm2 AS MATERIALIZED (SELECT doc_id, sum(x * w) AS m
         |         FROM tcfb JOIN tcw1 USING (bucket) GROUP BY doc_id),
         |tce2 AS (SELECT tclab.doc_id,
         |          least(greatest(500000 + m // 4, 0), 1000000) - 1000000 * y AS err
         |         FROM tclab JOIN tcm2 USING (doc_id)),
         |tcg2 AS (SELECT bucket, sum(x * err) AS g
         |         FROM tcfb JOIN tce2 USING (doc_id) GROUP BY bucket),
         |tcw2 AS (SELECT tcw1.bucket, tcw1.w - (tcg2.g // (2 * nd)) AS w
         |         FROM tcw1 JOIN tcg2 USING (bucket) CROSS JOIN tcnn),
         |tcmf AS (SELECT doc_id, CAST(sum(x * w) AS BIGINT) AS m
         |         FROM tcfb JOIN tcw2 USING (bucket) GROUP BY doc_id),
         |tck AS (SELECT doc_id, m >= 0 AS clf_keep FROM tcmf)""".stripMargin
  }

  private val curationPipelineV5 = CatalogEntry(
    "curation_pipeline_v5",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents")
      Curation.curationVerdictsV5(d,
          d.filter(col("doc_id") % 97 === 0).select("doc_id", "text"),
          mixtureTargets, target = col("lang") === dsirTargetLang)
        .orderBy("doc_id")
    },
    Some {
      s"""WITH RECURSIVE $curationV4Ctes,
         |$classifierGateCtes
         |SELECT d1.doc_id, d1.dedup_keep, ensk.quality_keep,
         |  NOT decf.cluster_contaminated AS decontam_keep, mixk.mixture_keep,
         |  spk.span_keep, dsk.dsir_keep, nvk.novelty_keep, tck.clf_keep,
         |  (d1.dedup_keep AND ensk.quality_keep AND NOT decf.cluster_contaminated
         |   AND mixk.mixture_keep AND spk.span_keep AND dsk.dsir_keep
         |   AND nvk.novelty_keep AND tck.clf_keep) AS keep
         |FROM d1 JOIN ensk USING (doc_id) JOIN decf USING (doc_id)
         |  JOIN mixk USING (doc_id) JOIN spk USING (doc_id)
         |  JOIN dsk USING (doc_id) JOIN nvk USING (doc_id)
         |  JOIN tck USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    })

  /** The eval-anchored decontamination CTE block (ends in `adec`) —
    * shared by the anchored v5 capstone and the v6 budget capstone.
    */
  private lazy val anchoredDecontamCtes: String =
    s"""eva AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
       |${minhashBandCtes("eva", "ev")},
       |acand AS (SELECT DISTINCT a.doc_id AS t, b.doc_id AS e
       |          FROM bands a JOIN bandsev b ON a.band = b.band AND a.key = b.key
       |            AND a.doc_id <> b.doc_id),
       |dse AS (SELECT doc_id, list_distinct(shev) AS s FROM shev),
       |andp AS (SELECT DISTINCT acand.t AS doc_id
       |         FROM acand JOIN ds x ON x.doc_id = acand.t
       |           JOIN dse y ON y.doc_id = acand.e
       |         WHERE CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
       |               / (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s)))
       |               >= $jaccardThreshold),
       |adec AS (SELECT d.doc_id,
       |           NOT (h.n IS NOT NULL OR nd.doc_id IS NOT NULL) AS decontam_keep
       |         FROM documents d LEFT JOIN hits h USING (doc_id)
       |           LEFT JOIN andp nd USING (doc_id))""".stripMargin

  /** The v5 capstone with the ANCHORED decontamination gate — the
    * production spelling for reuse-heavy corpora (PLANS.md round-18:
    * the cluster chain is 638 s of v4's 724 s at the zipf10
    * saturation point; the anchored verdict is 94 s): decontam_keep
    * becomes NOT(direct gram overlap OR one-hop (train, eval)
    * near-dup), every other gate bit-identical to v5. The multi-hop
    * divergence is spec-pinned in Round18OpsSpec.
    */
  private val curationPipelineV5Anchored = CatalogEntry(
    "curation_pipeline_v5_anchored",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents")
      val ev = d.filter(col("doc_id") % 97 === 0).select("doc_id", "text")
      val anchored = Curation.decontaminateAnchored(d, ev)
        .select(col("doc_id"), (!col("flagged")).as("decontam_keep"))
      Curation.curationVerdictsV5(d, ev, mixtureTargets,
          target = col("lang") === dsirTargetLang,
          decontamVerdict = Some(anchored))
        .orderBy("doc_id")
    },
    Some {
      s"""WITH RECURSIVE $curationV4Ctes,
         |$classifierGateCtes,
         |$anchoredDecontamCtes
         |SELECT d1.doc_id, d1.dedup_keep, ensk.quality_keep,
         |  adec.decontam_keep, mixk.mixture_keep,
         |  spk.span_keep, dsk.dsir_keep, nvk.novelty_keep, tck.clf_keep,
         |  (d1.dedup_keep AND ensk.quality_keep AND adec.decontam_keep
         |   AND mixk.mixture_keep AND spk.span_keep AND dsk.dsir_keep
         |   AND nvk.novelty_keep AND tck.clf_keep) AS keep
         |FROM d1 JOIN ensk USING (doc_id) JOIN adec USING (doc_id)
         |  JOIN mixk USING (doc_id) JOIN spk USING (doc_id)
         |  JOIN dsk USING (doc_id) JOIN nvk USING (doc_id)
         |  JOIN tck USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    })

  /** The v6 budget capstone on the anchored production path: gates
    * first, then the quality-ordered token-budget cut (20k tokens).
    */
  private val curationPipelineV6 = CatalogEntry(
    "curation_pipeline_v6",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents")
      val ev = d.filter(col("doc_id") % 97 === 0).select("doc_id", "text")
      val anchored = Curation.decontaminateAnchored(d, ev)
        .select(col("doc_id"), (!col("flagged")).as("decontam_keep"))
      Curation.curationVerdictsV6(d, ev, mixtureTargets,
          target = col("lang") === dsirTargetLang, tokenBudget = 20000L,
          decontamVerdict = Some(anchored))
        .orderBy("doc_id")
    },
    Some {
      s"""WITH RECURSIVE $curationV4Ctes,
         |$classifierGateCtes,
         |$anchoredDecontamCtes,
         |v5r AS (SELECT d1.doc_id, d1.dedup_keep, ensk.quality_keep,
         |          adec.decontam_keep, mixk.mixture_keep, spk.span_keep,
         |          dsk.dsir_keep, nvk.novelty_keep, tck.clf_keep,
         |          (d1.dedup_keep AND ensk.quality_keep AND adec.decontam_keep
         |           AND mixk.mixture_keep AND spk.span_keep AND dsk.dsir_keep
         |           AND nvk.novelty_keep AND tck.clf_keep) AS gates_keep
         |        FROM d1 JOIN ensk USING (doc_id) JOIN adec USING (doc_id)
         |          JOIN mixk USING (doc_id) JOIN spk USING (doc_id)
         |          JOIN dsk USING (doc_id) JOIN nvk USING (doc_id)
         |          JOIN tck USING (doc_id)),
         |m6 AS (SELECT doc_id, len(w2) AS n_tokens,
         |         len(list_distinct(w2)) AS n_distinct,
         |         len(list_filter(w2, t -> t IN ${inList(stopwords)})) AS n_stop
         |       FROM wt),
         |q6 AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |         CAST(floor((0.4 * (n_distinct / n_tokens)
         |           + 0.3 * (1.0 - n_stop / n_tokens)
         |           + 0.3 * least(1.0, n_tokens / 50.0)) * 1000000.0 + 0.5)
         |           AS BIGINT) AS qm
         |       FROM m6),
         |cum6 AS (SELECT v5r.doc_id,
         |          CAST(SUM(q6.n_tokens)
         |            OVER (ORDER BY q6.qm DESC, v5r.doc_id) AS BIGINT) AS ct
         |        FROM v5r JOIN q6 USING (doc_id) WHERE v5r.gates_keep),
         |bk6 AS (SELECT doc_id, TRUE AS budget_keep FROM cum6 WHERE ct <= 20000)
         |SELECT v5r.doc_id, v5r.dedup_keep, v5r.quality_keep,
         |  v5r.decontam_keep, v5r.mixture_keep, v5r.span_keep, v5r.dsir_keep,
         |  v5r.novelty_keep, v5r.clf_keep, q6.n_tokens,
         |  coalesce(bk6.budget_keep, FALSE) AS budget_keep,
         |  (v5r.gates_keep AND coalesce(bk6.budget_keep, FALSE)) AS keep
         |FROM v5r JOIN q6 USING (doc_id) LEFT JOIN bk6 USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    })

  /** BM25 lexical retrieval: the per-(doc, term) contribution is
    * quantized to integer micro-units before the per-doc sum (the
    * [[TextAnalysis.unigramSurprisal]] replay scheme), so the ranking
    * hash-checks exactly; `ln` on corpus rationals is bit-identical
    * across engines like every other oracle that uses it.
    */
  private val textBm25TopK = CatalogEntry(
    "text_bm25_topk",
    (s, dir) => TextAnalysis.bm25TopK(
        QuerySupport.table(s, dir, "documents"),
        Seq("spark", "merge", "vector"), k = 10)
      .orderBy("rank"),
    Some("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
           |st AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY doc_id),
           |corpus AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) AS tot FROM st),
           |q AS (SELECT unnest(['spark', 'merge', 'vector']) AS term),
           |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM t JOIN q USING (term) GROUP BY term),
           |tf AS (SELECT doc_id, term, count(*) AS tf FROM t JOIN q USING (term) GROUP BY doc_id, term),
           |sc AS (SELECT tf.doc_id,
           |         CAST(floor(
           |           ln((corpus.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
           |           * (tf.tf * 2.2)
           |           / (tf.tf + 1.2 * (0.25 + 0.75 * st.dl / (corpus.tot / corpus.n_docs)))
           |           * 1000000.0 + 0.5) AS BIGINT) AS c
           |       FROM tf JOIN df USING (term) JOIN st USING (doc_id) CROSS JOIN corpus),
           |agg AS (SELECT doc_id, count(*) AS n_hit_terms, sum(c) AS bm25_micro
           |        FROM sc GROUP BY doc_id)
           |SELECT CAST(row_number() OVER (ORDER BY bm25_micro DESC, doc_id) AS INT) AS rank,
           |  doc_id, n_hit_terms, CAST(bm25_micro AS BIGINT) AS bm25_micro
           |FROM agg ORDER BY bm25_micro DESC, doc_id LIMIT 10""".stripMargin))

  /** Zipf exponent of the corpus unigram distribution: top-1000-type
    * least squares on (ln rank, ln count), per-term products micro-
    * quantized then exact BIGINT sums, slope one fixed-shape double
    * expression over those integers (bit-identical across engines).
    */
  private val textZipfFit = CatalogEntry(
    "text_zipf_fit",
    (s, dir) => TextAnalysis.zipfFit(
        QuerySupport.table(s, dir, "documents"), topN = 1000)
      .select(col("n_types_fit"), col("n_types_total"), col("n_tokens"),
        r6(col("alpha")).as("alpha")),
    Some(s"""WITH t AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
            |c AS (SELECT term, count(*) AS c FROM t GROUP BY term),
            |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_types_total,
            |               CAST(sum(c) AS BIGINT) AS n_tokens FROM c),
            |h AS (SELECT c, term, row_number() OVER (ORDER BY c DESC, term) AS r
            |      FROM (SELECT * FROM c ORDER BY c DESC, term LIMIT 1000)),
            |q AS (SELECT
            |        CAST(floor(ln(CAST(r AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS qx,
            |        CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS qy,
            |        CAST(floor(ln(CAST(r AS DOUBLE)) * ln(CAST(c AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS qxy,
            |        CAST(floor(ln(CAST(r AS DOUBLE)) * ln(CAST(r AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS qxx
            |      FROM h),
            |sm AS (SELECT count(*) AS n, sum(qx) AS sx, sum(qy) AS sy,
            |         sum(qxy) AS sxy, sum(qxx) AS sxx FROM q)
            |SELECT CAST(n AS BIGINT) AS n_types_fit, n_types_total, n_tokens,
            |  ${r6s("""-((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) * 1000000.0 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            |     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) * 1000000.0 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))""")} AS alpha
            |FROM sm, tot""".stripMargin))

  /** Top-k vocabulary token coverage — exact under frequency ties
    * because it computes from the count-of-counts frame (tied terms
    * contribute identical counts, so only HOW MANY the cutoff takes
    * matters); the oracle replays the same cumulative-before window
    * over the bounded frame.
    */
  private val textVocabHeadCoverage = CatalogEntry(
    "text_vocab_head_coverage",
    (s, dir) => TextAnalysis.vocabHeadCoverage(
        QuerySupport.table(s, dir, "documents"))
      .orderBy("top_k"),
    Some("""WITH t AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
           |v AS (SELECT term, count(*) AS c FROM t GROUP BY term),
           |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total_tokens,
           |               CAST(count(*) AS BIGINT) AS n_types FROM v),
           |cc AS (SELECT c, count(*) AS n_terms FROM v GROUP BY c),
           |cum AS (SELECT c, n_terms, coalesce(sum(n_terms) OVER
           |          (ORDER BY c DESC ROWS BETWEEN UNBOUNDED PRECEDING
           |           AND 1 PRECEDING), 0) AS cum_before FROM cc),
           |k AS (SELECT unnest([100, 1000, 10000]::BIGINT[]) AS top_k),
           |j AS (SELECT k.top_k,
           |        sum(least(n_terms, greatest(k.top_k - cum_before, 0))) AS n_types_used,
           |        sum(least(n_terms, greatest(k.top_k - cum_before, 0)) * c) AS covered_tokens
           |      FROM cum CROSS JOIN k GROUP BY k.top_k)
           |SELECT top_k, CAST(n_types_used AS BIGINT) AS n_types_used,
           |  CAST(covered_tokens AS BIGINT) AS covered_tokens,
           |  total_tokens, n_types,
           |  CAST(covered_tokens * 1000000 // greatest(total_tokens, 1) AS BIGINT) AS coverage_ppm
           |FROM j CROSS JOIN tot ORDER BY top_k""".stripMargin))

  /** Heaps'-law vocabulary-growth fit over per-doc (tokens, types)
    * points: micro-quantized log terms, one fixed-shape double
    * slope/intercept over the exact sums (the zipf_fit discipline).
    */
  private val textHeapsFit = CatalogEntry(
    "text_heaps_fit",
    (s, dir) => TextAnalysis.heapsFit(
        QuerySupport.table(s, dir, "documents"))
      .select(col("n_docs_fit"), r6(col("beta")).as("beta"),
        r6(col("k")).as("k")),
    Some {
      val betaSql =
        """((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) * 1000000.0
          |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          |  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) * 1000000.0
          |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))""".stripMargin
      s"""WITH w AS (SELECT string_split(text, ' ') AS w FROM documents),
         |p AS (SELECT CAST(len(w) AS BIGINT) AS nt,
         |        CAST(len(list_distinct(w)) AS BIGINT) AS nd FROM w),
         |q AS (SELECT
         |        CAST(floor(ln(CAST(nt AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS qx,
         |        CAST(floor(ln(CAST(nd AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS qy,
         |        CAST(floor(ln(CAST(nt AS DOUBLE)) * ln(CAST(nd AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS qxy,
         |        CAST(floor(ln(CAST(nt AS DOUBLE)) * ln(CAST(nt AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS qxx
         |      FROM p WHERE nt >= 1 AND nd >= 1),
         |sm AS (SELECT count(*) AS n, sum(qx) AS sx, sum(qy) AS sy,
         |         sum(qxy) AS sxy, sum(qxx) AS sxx FROM q)
         |SELECT CAST(n AS BIGINT) AS n_docs_fit,
         |  ${r6s(betaSql)} AS beta,
         |  ${r6s(s"""exp((CAST(sy AS DOUBLE) - $betaSql * CAST(sx AS DOUBLE))
         |    / (CAST(n AS DOUBLE) * 1000000.0))""")} AS k
         |FROM sm""".stripMargin
    })

  /** BATCH BM25 (VERDICT r12 next-3): ~a hundred queries — the first
    * six tokens of every 53rd document under a FIXED id band, so the
    * query COUNT stays constant across scale factors while the corpus
    * grows — scored in one corpus pass, top-5 per query. Per-term
    * contributions quantize exactly as the single-query oracle; the
    * per-query ranked window replays as row_number PARTITION BY.
    */
  private val textBm25Batch = CatalogEntry(
    "text_bm25_batch",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents")
      val q = d.filter(col("doc_id") % 53 === 0 && col("doc_id") < 5000)
        .select(col("doc_id").as("query_id"),
          slice(split(col("text"), " "), 1, 6).as("query_terms"))
      TextAnalysis.bm25TopKBatch(d, q, k = 5)
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH $bm25BatchCtes
            |SELECT * FROM rk WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin))

  /** Shared DuckDB CTE chain for the batch-BM25 family: the fixed
    * query derivation, the one-pass corpus stats, per-(doc, term)
    * micro-quantized contributions, and the per-query ranking `rk`.
    */
  private lazy val bm25BatchCtes: String =
    """q AS (SELECT doc_id AS query_id, list_slice(string_split(text, ' '), 1, 6) AS qts
      |           FROM documents WHERE doc_id % 53 = 0 AND doc_id < 5000),
      |qt AS (SELECT DISTINCT query_id, unnest(qts) AS term FROM q),
      |t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |st AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY doc_id),
      |corpus AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) AS tot FROM st),
      |v AS (SELECT DISTINCT term FROM qt),
      |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM t JOIN v USING (term) GROUP BY term),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM t JOIN v USING (term) GROUP BY doc_id, term),
      |sc AS (SELECT tf.doc_id, tf.term, CAST(floor(
      |         ln((corpus.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
      |         * (tf.tf * 2.2)
      |         / (tf.tf + 1.2 * (0.25 + 0.75 * st.dl / (corpus.tot / corpus.n_docs)))
      |         * 1000000.0 + 0.5) AS BIGINT) AS c
      |       FROM tf JOIN df USING (term) JOIN st USING (doc_id) CROSS JOIN corpus),
      |agg AS (SELECT qt.query_id, sc.doc_id, count(*) AS n_hit_terms, sum(sc.c) AS bm25_micro
      |        FROM sc JOIN qt USING (term) GROUP BY qt.query_id, sc.doc_id),
      |rk AS (SELECT query_id,
      |         CAST(row_number() OVER (PARTITION BY query_id
      |              ORDER BY bm25_micro DESC, doc_id) AS INT) AS rank,
      |         doc_id, CAST(n_hit_terms AS BIGINT) AS n_hit_terms,
      |         CAST(bm25_micro AS BIGINT) AS bm25_micro
      |       FROM agg)""".stripMargin

  /** The per-query eval CTE chain on top of [[bm25BatchCtes]]:
    * known-item relevance (each query's source document is its one
    * relevant doc), BM25 top-10 as the judged run, exact-integer
    * metrics. `pq` ends the chain.
    */
  private lazy val retrievalEvalCtes: String =
    bm25BatchCtes + """,
      |topk AS (SELECT * FROM rk WHERE rank <= 10),
      |rel AS (SELECT query_id, query_id AS doc_id FROM q),
      |h AS (SELECT rel.query_id, topk.rank
      |      FROM rel LEFT JOIN topk ON rel.query_id = topk.query_id
      |       AND rel.doc_id = topk.doc_id),
      |pq AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_relevant,
      |         CAST(count(rank) AS BIGINT) AS n_found,
      |         CAST(min(rank) AS BIGINT) AS first_rank
      |       FROM h GROUP BY query_id),
      |ev AS (SELECT query_id, n_relevant, n_found, first_rank,
      |         CASE WHEN first_rank IS NOT NULL THEN 1000000 // first_rank
      |              ELSE 0 END AS rr_micro,
      |         coalesce(first_rank = 1, FALSE) AS hit1,
      |         coalesce(first_rank <= 5, FALSE) AS hit_at_k
      |       FROM pq)""".stripMargin

  /** Batch query-likelihood CTE chain ending in `qrk` — the QL twin
    * of [[bm25BatchCtes]] over the same known-item query frame.
    */
  private lazy val qlBatchCtes: String =
    """q AS (SELECT doc_id AS query_id, list_slice(string_split(text, ' '), 1, 6) AS qts
      |           FROM documents WHERE doc_id % 53 = 0 AND doc_id < 5000),
      |qt AS (SELECT DISTINCT query_id, unnest(qts) AS term FROM q),
      |t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |st AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY doc_id),
      |corpus AS (SELECT CAST(sum(dl) AS BIGINT) AS tot FROM st),
      |v AS (SELECT DISTINCT term FROM qt),
      |cf AS (SELECT term, count(*) AS cf FROM t JOIN v USING (term) GROUP BY term),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM t JOIN v USING (term) GROUP BY doc_id, term),
      |cand AS (SELECT DISTINCT qt.query_id, tf.doc_id FROM tf JOIN qt USING (term)),
      |fr AS (SELECT cand.query_id, cand.doc_id, qt2.term, cf.cf, coalesce(tf.tf, 0) AS tf
      |       FROM cand JOIN qt qt2 ON qt2.query_id = cand.query_id
      |         JOIN cf ON cf.term = qt2.term
      |         LEFT JOIN tf ON tf.doc_id = cand.doc_id AND tf.term = qt2.term),
      |sc AS (SELECT fr.query_id, fr.doc_id,
      |         CAST(floor(ln(
      |           (CAST(fr.tf AS DOUBLE) + 2000.0 * CAST(fr.cf AS DOUBLE) / CAST(corpus.tot AS DOUBLE))
      |           / (CAST(st.dl AS DOUBLE) + 2000.0)) * 1000000.0 + 0.5) AS BIGINT) AS c,
      |         CASE WHEN fr.tf > 0 THEN 1 ELSE 0 END AS hit
      |       FROM fr JOIN st USING (doc_id) CROSS JOIN corpus),
      |agg AS (SELECT query_id, doc_id, CAST(sum(hit) AS BIGINT) AS n_hit_terms,
      |          CAST(sum(c) AS BIGINT) AS ql_micro
      |        FROM sc GROUP BY query_id, doc_id),
      |qrk AS (SELECT query_id,
      |          CAST(row_number() OVER (PARTITION BY query_id
      |               ORDER BY ql_micro DESC, doc_id) AS INT) AS rank,
      |          doc_id, n_hit_terms, ql_micro
      |        FROM agg)""".stripMargin

  /** Known-item eval of the BATCH QL run — the second ranker plugged
    * into the same eval harness (an A/B a retrieval stack actually
    * runs: lexical-probabilistic vs language-model ranking on the
    * same relevance).
    */
  private val retrievalEvalQl = CatalogEntry(
    "retrieval_eval_ql",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents")
      val q = d.filter(col("doc_id") % 53 === 0 && col("doc_id") < 5000)
        .select(col("doc_id").as("query_id"),
          slice(split(col("text"), " "), 1, 6).as("query_terms"))
      TextAnalysis.retrievalEval(
          TextAnalysis.queryLikelihoodTopKBatch(d, q, k = 10),
          q.select(col("query_id"), col("query_id").as("doc_id")), k = 5)
        .orderBy("query_id")
    },
    Some(s"""WITH $qlBatchCtes,
            |topk AS (SELECT * FROM qrk WHERE rank <= 10),
            |rel AS (SELECT query_id, query_id AS doc_id FROM q),
            |h AS (SELECT rel.query_id, topk.rank
            |      FROM rel LEFT JOIN topk ON rel.query_id = topk.query_id
            |       AND rel.doc_id = topk.doc_id),
            |pq AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_relevant,
            |         CAST(count(rank) AS BIGINT) AS n_found,
            |         CAST(min(rank) AS BIGINT) AS first_rank
            |       FROM h GROUP BY query_id),
            |ev AS (SELECT query_id, n_relevant, n_found, first_rank,
            |         CASE WHEN first_rank IS NOT NULL THEN 1000000 // first_rank
            |              ELSE 0 END AS rr_micro,
            |         coalesce(first_rank = 1, FALSE) AS hit1,
            |         coalesce(first_rank <= 5, FALSE) AS hit_at_k
            |       FROM pq)
            |SELECT * FROM ev ORDER BY query_id""".stripMargin))

  /** Spark side of the known-item eval: BM25 top-10 judged against
    * "the query's source doc is relevant" — the self-retrieval eval a
    * retrieval stack smoke-tests with (first-6-token queries are not
    * guaranteed rank 1 on a boilerplate-heavy corpus, so the metrics
    * are non-trivial).
    */
  private def knownItemEval(s: SparkSession, dir: String): DataFrame = {
    val d = QuerySupport.table(s, dir, "documents")
    val q = d.filter(col("doc_id") % 53 === 0 && col("doc_id") < 5000)
      .select(col("doc_id").as("query_id"),
        slice(split(col("text"), " "), 1, 6).as("query_terms"))
    TextAnalysis.retrievalEval(
      TextAnalysis.bm25TopKBatch(d, q, k = 10),
      q.select(col("query_id"), col("query_id").as("doc_id")), k = 5)
  }

  private val retrievalEvalKnownItem = CatalogEntry(
    "retrieval_eval_known_item",
    (s, dir) => knownItemEval(s, dir).orderBy("query_id"),
    Some(s"""WITH $retrievalEvalCtes
            |SELECT * FROM ev ORDER BY query_id""".stripMargin))

  /** One-row macro rollup: MRR / hit rates as exact integer division
    * of exact sums — order-free, hash-replayable.
    */
  private val retrievalEvalMacro = CatalogEntry(
    "retrieval_eval_macro",
    (s, dir) => TextAnalysis.retrievalEvalMacro(knownItemEval(s, dir)),
    Some(s"""WITH $retrievalEvalCtes
            |SELECT CAST(count(*) AS BIGINT) AS n_queries,
            |  CAST(sum(rr_micro) // count(*) AS BIGINT) AS mrr_micro,
            |  CAST(sum(CASE WHEN hit1 THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS hit1_micro,
            |  CAST(sum(CASE WHEN hit_at_k THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS hit_at_k_micro,
            |  CAST(sum(CASE WHEN n_found > 0 THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS found_micro
            |FROM ev""".stripMargin))

  /** Recall@k curve over the known-item run: hit rate at each
    * configured cutoff from the one ranking pass, exact and monotone.
    */
  private val retrievalRecallCurve = CatalogEntry(
    "retrieval_recall_curve",
    (s, dir) => TextAnalysis.retrievalRecallCurve(
      knownItemEval(s, dir), LlmDataParams.recallCurveKs),
    Some {
      val ks = LlmDataParams.recallCurveKs.mkString(", ")
      s"""WITH $retrievalEvalCtes,
         |kk AS (SELECT unnest([$ks]) AS k)
         |SELECT CAST(kk.k AS BIGINT) AS k,
         |  CAST(count(*) AS BIGINT) AS n_queries,
         |  CAST(sum(CASE WHEN first_rank IS NOT NULL AND first_rank <= kk.k
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
         |  CAST(sum(CASE WHEN first_rank IS NOT NULL AND first_rank <= kk.k
         |    THEN 1 ELSE 0 END) * 1000000
         |    // greatest(count(*), 1) AS BIGINT) AS hit_rate_micro
         |FROM ev CROSS JOIN kk GROUP BY kk.k ORDER BY k""".stripMargin
    })

  /** Per-α effective-sample-size of the temperature mixture: the
    * sweep's trade-off number — ESS moments collapse to the
    * |sources| frame, weights normalized per α before squaring.
    */
  private val sampleTemperatureEss = CatalogEntry(
    "sample_temperature_ess",
    (s, dir) => Curation.temperatureEss(
        QuerySupport.table(s, dir, "documents"))
      .select(col("alpha_micro"), col("n_sources"), col("n_tokens_total"),
        r6(col("ess")).as("ess"), r6(col("ess_ratio")).as("ess_ratio")),
    Some(s"""WITH per AS (SELECT source,
           |        CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
           |      FROM documents GROUP BY source),
           |rows_ AS (
           |  SELECT CAST(1000000 AS BIGINT) AS alpha_micro, source, n_tokens,
           |         n_tokens AS weight FROM per
           |  UNION ALL
           |  SELECT CAST(500000 AS BIGINT), source, n_tokens,
           |         CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000 + 0.5)
           |           AS BIGINT) FROM per
           |  UNION ALL
           |  SELECT CAST(250000 AS BIGINT), source, n_tokens,
           |         CAST(floor(sqrt(sqrt(CAST(n_tokens AS DOUBLE))) * 1000000 + 0.5)
           |           AS BIGINT) FROM per),
           |u AS (SELECT alpha_micro, source, n_tokens,
           |        weight * 1000000 // greatest(n_tokens, 1) AS uu
           |      FROM rows_),
           |mx AS (SELECT alpha_micro, max(uu) AS mxu FROM u GROUP BY 1),
           |w AS (SELECT u.alpha_micro, n_tokens,
           |        uu * 1000 // greatest(mx.mxu, 1) AS ww
           |      FROM u JOIN mx USING (alpha_micro)),
           |m AS (SELECT alpha_micro, count(*) AS n_sources,
           |        sum(n_tokens) AS nt, sum(n_tokens * ww) AS s1,
           |        sum(n_tokens * ww * ww) AS s2
           |      FROM w GROUP BY 1),
           |e AS (SELECT *, CASE WHEN s2 <= 0 THEN 0.0 ELSE
           |        CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
           |          / CAST(s2 AS DOUBLE) END AS ess FROM m)
           |SELECT alpha_micro, CAST(n_sources AS BIGINT) AS n_sources,
           |  CAST(nt AS BIGINT) AS n_tokens_total,
           |  ${r6s("ess")} AS ess,
           |  ${r6s("CASE WHEN nt = 0 THEN 0.0 ELSE ess / CAST(nt AS DOUBLE) END")} AS ess_ratio
           |FROM e ORDER BY alpha_micro DESC""".stripMargin))

  /** Graded nDCG@10 over the known-item run: gain 3 for the known
    * item (2^2−1), 1 for docs hitting ≥ 4 of the ≤ 6 query terms,
    * else 0; per-rank discounted terms micro-quantize once (the BM25
    * ln discipline), ideal is the run-local re-rank.
    */
  private val retrievalNdcg = CatalogEntry(
    "retrieval_ndcg",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents")
      val q = d.filter(col("doc_id") % 53 === 0 && col("doc_id") < 5000)
        .select(col("doc_id").as("query_id"),
          slice(split(col("text"), " "), 1, 6).as("query_terms"))
      TextAnalysis.ndcgAtK(
          TextAnalysis.bm25TopKBatch(d, q, k = 10),
          gain = when(col("doc_id") === col("query_id"), 3L)
            .when(col("n_hit_terms") >= 4L, 1L).otherwise(0L),
          k = 10)
        .orderBy("query_id")
    },
    Some(s"""WITH $bm25BatchCtes,
            |topk AS (SELECT * FROM rk WHERE rank <= 10),
            |g AS (SELECT query_id, rank,
            |        CASE WHEN doc_id = query_id THEN 3
            |             WHEN n_hit_terms >= 4 THEN 1 ELSE 0 END AS g
            |      FROM topk),
            |ir AS (SELECT *, row_number() OVER (PARTITION BY query_id
            |          ORDER BY g DESC, rank) AS irnk FROM g),
            |dterms AS (SELECT query_id, g,
            |        CAST(floor(g * 1000000.0 * ln(2.0) / ln(rank + 1.0) + 0.5)
            |          AS BIGINT) AS dt,
            |        CAST(floor(g * 1000000.0 * ln(2.0) / ln(irnk + 1.0) + 0.5)
            |          AS BIGINT) AS it
            |      FROM ir),
            |pq AS (SELECT query_id,
            |         CAST(sum(CASE WHEN g > 0 THEN 1 ELSE 0 END) AS BIGINT)
            |           AS n_rel_in_run,
            |         CAST(sum(dt) AS BIGINT) AS dcg_micro,
            |         CAST(sum(it) AS BIGINT) AS idcg_micro
            |       FROM dterms GROUP BY query_id)
            |SELECT query_id, n_rel_in_run, dcg_micro, idcg_micro,
            |  CASE WHEN idcg_micro > 0
            |       THEN dcg_micro * 1000000 // idcg_micro ELSE 0 END
            |    AS ndcg_micro
            |FROM pq ORDER BY query_id""".stripMargin))

  /** MAP@10 over the known-item run with the same graded-to-binary
    * relevance pool as [[retrievalNdcg]] (known item ∪ strong term
    * hits); precision@rank quantizes per hit, the AP divides by the
    * run-local relevant count.
    */
  private val retrievalMap = CatalogEntry(
    "retrieval_map",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents")
      val q = d.filter(col("doc_id") % 53 === 0 && col("doc_id") < 5000)
        .select(col("doc_id").as("query_id"),
          slice(split(col("text"), " "), 1, 6).as("query_terms"))
      TextAnalysis.mapAtK(
          TextAnalysis.bm25TopKBatch(d, q, k = 10),
          rel = col("doc_id") === col("query_id") || col("n_hit_terms") >= 4L,
          k = 10)
        .orderBy("query_id")
    },
    Some(s"""WITH $bm25BatchCtes,
            |topk AS (SELECT * FROM rk WHERE rank <= 10),
            |g AS (SELECT query_id, rank,
            |        (doc_id = query_id OR n_hit_terms >= 4) AS rel
            |      FROM topk),
            |cu AS (SELECT *, sum(CASE WHEN rel THEN 1 ELSE 0 END)
            |          OVER (PARTITION BY query_id ORDER BY rank
            |                ROWS UNBOUNDED PRECEDING) AS cum
            |       FROM g)
            |SELECT query_id,
            |  CAST(sum(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT)
            |    AS n_rel_in_run,
            |  CAST(coalesce(sum(CASE WHEN rel THEN cum * 1000000 // rank END), 0)
            |    // greatest(sum(CASE WHEN rel THEN 1 ELSE 0 END), 1)
            |    AS BIGINT) AS ap_micro
            |FROM cu GROUP BY query_id ORDER BY query_id""".stripMargin))

  /** Per-source quality percentile: the CDF computes at
    * (source × micro-score) grain — no doc-grain window — and joins
    * back; value-rank ties share a percentile.
    */
  private val textQualityPercentile = CatalogEntry(
    "text_quality_percentile",
    (s, dir) => TextAnalysis.qualityPercentileBySource(
        QuerySupport.table(s, dir, "documents"))
      .orderBy("doc_id"),
    Some(s"""WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
            |m AS (SELECT doc_id, source, len(w) AS n_tokens,
            |        len(list_distinct(w)) AS n_distinct,
            |        len(list_filter(w, t -> t IN ${inList(stopwords)})) AS n_stop
            |      FROM w),
            |s AS (SELECT doc_id, source,
            |        CAST(floor((0.4 * (n_distinct / n_tokens)
            |          + 0.3 * (1.0 - n_stop / n_tokens)
            |          + 0.3 * least(1.0, n_tokens / 50.0)) * 1000000.0 + 0.5)
            |          AS BIGINT) AS q_micro
            |      FROM m),
            |d AS (SELECT source, q_micro, count(*) AS c FROM s GROUP BY 1, 2),
            |cm AS (SELECT source, q_micro,
            |         sum(c) OVER (PARTITION BY source ORDER BY q_micro) AS cum_le
            |       FROM d),
            |t AS (SELECT source, count(*) AS n_source FROM s GROUP BY 1)
            |SELECT s.doc_id, s.source, s.q_micro,
            |  CAST(cum_le AS BIGINT) AS cum_le,
            |  CAST(n_source AS BIGINT) AS n_source,
            |  CAST(cum_le * 1000000 // n_source AS BIGINT) AS pct_micro
            |FROM s JOIN cm USING (source, q_micro) JOIN t USING (source)
            |ORDER BY doc_id""".stripMargin))

  /** Hashed-TF doc clustering: the doc-vector subquery feeds the SAME
    * Lloyd CTE chain as the embedding k-means (generalized source +
    * width; init LCG strides embDim — see kmeansCtesFrom).
    */
  private val textDocClusters = CatalogEntry(
    "text_doc_clusters",
    (s, dir) => TextAnalysis.docClusters(
        QuerySupport.table(s, dir, "documents"))
      .orderBy("doc_id"),
    Some {
      val hx = hexDecode4("md5(t)", posFn = "strpos", substrFn = "substr")
      val docVecSql =
        s"""SELECT vec_id, list_transform(rv, x -> x / nn) AS v FROM (
           |    SELECT doc_id AS vec_id, rv,
           |      sqrt(list_sum(list_transform(rv, x -> x * x))) AS nn FROM (
           |      SELECT doc_id, list_transform(range(0, $docTfDim), d ->
           |        CAST(len(list_filter(string_split(text, ' '),
           |          t -> ($hx) % $docTfDim = d)) AS DOUBLE)) AS rv
           |      FROM documents)) WHERE nn > 0""".stripMargin
      s"""WITH ${kmeansCtesFrom(docVecSql, docClusterK, docTfDim)},
         |a2 AS (SELECT DISTINCT ON (vec_id) vec_id, CAST(j + 1 AS INT) AS bucket
         |  FROM d2 ORDER BY vec_id, score DESC, j)
         |SELECT vec_id AS doc_id, bucket FROM a2 ORDER BY doc_id""".stripMargin
    })

  /** Per-source topic diversity over the doc clustering: exact
    * micro-nat entropy (charEntropy quantization) + effective cluster
    * count; the oracle replays the whole Lloyd chain and the rollup.
    */
  private val textClusterDiversity = CatalogEntry(
    "text_cluster_diversity",
    (s, dir) => TextAnalysis.clusterDiversity(
        QuerySupport.table(s, dir, "documents"))
      .orderBy("source"),
    Some {
      val hx = hexDecode4("md5(t)", posFn = "strpos", substrFn = "substr")
      val docVecSql =
        s"""SELECT vec_id, list_transform(rv, x -> x / nn) AS v FROM (
           |    SELECT doc_id AS vec_id, rv,
           |      sqrt(list_sum(list_transform(rv, x -> x * x))) AS nn FROM (
           |      SELECT doc_id, list_transform(range(0, $docTfDim), d ->
           |        CAST(len(list_filter(string_split(text, ' '),
           |          t -> ($hx) % $docTfDim = d)) AS DOUBLE)) AS rv
           |      FROM documents)) WHERE nn > 0""".stripMargin
      s"""WITH ${kmeansCtesFrom(docVecSql, docClusterK, docTfDim)},
         |a2 AS (SELECT DISTINCT ON (vec_id) vec_id, CAST(j + 1 AS INT) AS bucket
         |  FROM d2 ORDER BY vec_id, score DESC, j),
         |sc AS (SELECT d.source, a.bucket, CAST(count(*) AS BIGINT) AS c
         |       FROM documents d JOIN a2 a ON a.vec_id = d.doc_id GROUP BY 1, 2),
         |sn AS (SELECT source, bucket, c,
         |         CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS n FROM sc),
         |st AS (SELECT source, c, n,
         |         CAST(floor(c * ln(CAST(n AS DOUBLE) / c) * 1000000 + 0.5)
         |           AS BIGINT) AS t
         |       FROM sn),
         |ag AS (SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
         |         CAST(count(*) AS BIGINT) AS n_clusters,
         |         CAST(sum(t) AS BIGINT) AS h
         |       FROM st GROUP BY source)
         |SELECT source, n_docs, n_clusters,
         |  CAST(h // n_docs AS BIGINT) AS entropy_micro,
         |  CAST(floor(exp(CAST(h // n_docs AS DOUBLE) / 1000000)
         |    * 1000000 + 0.5) AS BIGINT) AS effective_clusters_micro
         |FROM ag ORDER BY source""".stripMargin
    })

  /** Cohen's kappa between the classifier verdict and the quality
    * gate: exact confusion counts, chance correction in double from
    * those counts.
    */
  private val textAgreementKappa = CatalogEntry(
    "text_agreement_kappa",
    (s, dir) => TextAnalysis.agreementKappa(
        QuerySupport.table(s, dir, "documents"))
      .select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
        r6(col("po")).as("po"), r6(col("pe")).as("pe"),
        r6(col("kappa")).as("kappa")),
    Some {
      val decode = hexDecode4("h", posFn = "strpos", substrFn = "substr")
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |f AS (SELECT doc_id, list_concat(w,
         |        CASE WHEN len(w) >= 2
         |        THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])
         |        ELSE []::VARCHAR[] END) AS f FROM w),
         |s AS (SELECT doc_id,
         |        list_sum(list_transform(list_transform(f, t -> md5(t)),
         |          h -> ($decode) % 21 - 10)) >= 0 AS a
         |      FROM f),
         |m AS (SELECT doc_id, len(w) AS n_tokens,
         |        len(list_distinct(w)) AS n_distinct,
         |        len(list_filter(w, t -> t IN ${inList(stopwords)})) AS n_stop
         |      FROM w),
         |ql AS (SELECT doc_id,
         |         CAST(floor((0.4 * (n_distinct / n_tokens)
         |           + 0.3 * (1.0 - n_stop / n_tokens)
         |           + 0.3 * least(1.0, n_tokens / 50.0)) * 1000000.0 + 0.5)
         |           AS BIGINT) >= $calibGateMicro AS b
         |       FROM m),
         |c AS (SELECT count(*) AS n,
         |        sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS n11,
         |        sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS n10,
         |        sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS n01,
         |        sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS n00
         |      FROM s JOIN ql USING (doc_id)),
         |k AS (SELECT *, CAST(n11 + n00 AS DOUBLE) / n AS po,
         |        (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
         |          + CAST(n01 + n00 AS DOUBLE) * (n10 + n00))
         |          / (CAST(n AS DOUBLE) * n) AS pe
         |      FROM c)
         |SELECT CAST(n AS BIGINT) AS n, CAST(n11 AS BIGINT) AS n11,
         |  CAST(n10 AS BIGINT) AS n10, CAST(n01 AS BIGINT) AS n01,
         |  CAST(n00 AS BIGINT) AS n00,
         |  ${r6s("po")} AS po, ${r6s("pe")} AS pe,
         |  ${r6s("CASE WHEN pe < 1.0 THEN (po - pe) / (1.0 - pe) ELSE 0.0 END")} AS kappa
         |FROM k""".stripMargin
    })

  /** Source-concentration Gini: the sorted-array identity over the
    * source-count-sized token frame, exact integer numerator.
    */
  private val textSourceGini = CatalogEntry(
    "text_source_gini",
    (s, dir) => TextAnalysis.sourceGini(
      QuerySupport.table(s, dir, "documents")),
    Some("""WITH p AS (SELECT source,
           |        sum(len(string_split(text, ' '))) AS n_tokens
           |      FROM documents GROUP BY source),
           |r AS (SELECT source, n_tokens,
           |        row_number() OVER (ORDER BY n_tokens, source) AS i FROM p),
           |a AS (SELECT CAST(count(*) AS BIGINT) AS n_sources,
           |        CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           |        CAST(sum((2 * i - 1) * n_tokens) AS BIGINT) AS wsum
           |      FROM r),
           |h AS (SELECT *, wsum - n_sources * total_tokens AS num,
           |        n_sources * total_tokens AS den FROM a),
           |m AS (SELECT *, num * 1000 // den AS mil FROM h)
           |SELECT n_sources, total_tokens,
           |  CAST(mil * 1000 + (num * 1000 - mil * den) * 1000 // den
           |    AS BIGINT) AS gini_micro
           |FROM m""".stripMargin))

  /** k-anonymity over (lang, source, length-bucket): one aggregate to
    * quasi-id grain, at-risk groups below k=5.
    */
  private val privacyKAnonymity = CatalogEntry(
    "privacy_k_anonymity",
    (s, dir) => Curation.kAnonymity(
        QuerySupport.table(s, dir, "documents")
          .select(col("lang"), col("source"),
            expr("n_chars div 100").as("len_bucket")),
        Seq("lang", "source", "len_bucket"), k = 5)
      .orderBy("lang", "source", "len_bucket"),
    Some("""SELECT lang, source, n_chars // 100 AS len_bucket,
           |  CAST(count(*) AS BIGINT) AS n_rows, count(*) < 5 AS at_risk
           |FROM documents GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin))

  /** l-diversity over (source, length-bucket) with `lang` sensitive:
    * the grain k-anonymity misses — a big group whose members all
    * share the sensitive value still leaks it.
    */
  private val privacyLDiversity = CatalogEntry(
    "privacy_l_diversity",
    (s, dir) => Curation.lDiversity(
        QuerySupport.table(s, dir, "documents")
          .select(col("lang"), col("source"),
            expr("n_chars div 100").as("len_bucket")),
        Seq("source", "len_bucket"), sensitiveCol = "lang", minL = 3)
      .orderBy("source", "len_bucket"),
    Some("""WITH g AS (SELECT source, n_chars // 100 AS len_bucket, lang,
           |        count(*) AS c
           |      FROM documents GROUP BY 1, 2, 3)
           |SELECT source, len_bucket, CAST(sum(c) AS BIGINT) AS n_rows,
           |  CAST(count(*) AS BIGINT) AS l_distinct,
           |  count(*) < 3 AS at_risk
           |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Snapshot diff: v2 derives deterministically from documents
    * (drop %10=3, edit %10=7, add %10=1 under shifted ids) so both
    * engines diff the same two corpora.
    */
  private val curationSnapshotDiff = CatalogEntry(
    "curation_snapshot_diff",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents")
      val v2 = d.filter(col("doc_id") % 10 =!= 3)
        .withColumn("text",
          when(col("doc_id") % 10 === 7, concat(col("text"), lit(" v2")))
            .otherwise(col("text")))
        .unionByName(d.filter(col("doc_id") % 10 === 1)
          .withColumn("doc_id", col("doc_id") + 1000000))
      Curation.corpusDiff(d, v2).orderBy("doc_id")
    },
    Some("""WITH v1 AS (SELECT doc_id, md5(text) AS dg FROM documents),
           |v2 AS (SELECT doc_id,
           |         md5(CASE WHEN doc_id % 10 = 7 THEN text || ' v2'
           |             ELSE text END) AS dg
           |       FROM documents WHERE doc_id % 10 <> 3
           |       UNION ALL
           |       SELECT doc_id + 1000000, md5(text) FROM documents
           |       WHERE doc_id % 10 = 1),
           |j AS (SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
           |        CASE WHEN v1.dg IS NULL THEN 'added'
           |             WHEN v2.dg IS NULL THEN 'removed'
           |             WHEN v1.dg <> v2.dg THEN 'changed' END AS status
           |      FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
           |SELECT doc_id, status FROM j WHERE status IS NOT NULL
           |ORDER BY doc_id""".stripMargin))

  /** Hard negatives for retriever training (DPR): top-ranked BM25
    * results minus the relevance set, re-ranked per query — the
    * anti-join replays as LEFT JOIN ... IS NULL.
    */
  private val retrievalHardNegatives = CatalogEntry(
    "retrieval_hard_negatives",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents")
      val q = d.filter(col("doc_id") % 53 === 0 && col("doc_id") < 5000)
        .select(col("doc_id").as("query_id"),
          slice(split(col("text"), " "), 1, 6).as("query_terms"))
      TextAnalysis.hardNegatives(
          TextAnalysis.bm25TopKBatch(d, q, k = 10),
          q.select(col("query_id"), col("query_id").as("doc_id")), k = 5)
        .orderBy("query_id", "neg_rank")
    },
    Some(s"""WITH $bm25BatchCtes,
            |topk AS (SELECT * FROM rk WHERE rank <= 10),
            |rel AS (SELECT query_id, query_id AS doc_id FROM q),
            |neg AS (SELECT t.query_id, t.doc_id, t.rank FROM topk t
            |        LEFT JOIN rel r ON r.query_id = t.query_id
            |          AND r.doc_id = t.doc_id
            |        WHERE r.query_id IS NULL),
            |rn AS (SELECT query_id, doc_id, rank, row_number() OVER
            |         (PARTITION BY query_id ORDER BY rank) AS neg_rank
            |       FROM neg)
            |SELECT query_id, CAST(neg_rank AS BIGINT) AS neg_rank, doc_id,
            |  CAST(rank AS BIGINT) AS orig_rank
            |FROM rn WHERE neg_rank <= 5
            |ORDER BY query_id, neg_rank""".stripMargin))

  /** Calibration bins: classifier mean-weight bins (exact floor-div
    * bin ids, negative-safe) vs the micro-gated quality label; per-bin
    * sums exact, ratios float only at the edge.
    */
  private val textCalibrationBins = CatalogEntry(
    "text_calibration_bins",
    (s, dir) => TextAnalysis.calibrationBins(
        QuerySupport.table(s, dir, "documents"))
      .select(col("bin"), col("n_docs"), col("n_pos"), col("sum_score"),
        col("sum_feats"), r6(col("mean_weight")).as("mean_weight"),
        r6(col("pos_rate")).as("pos_rate"),
        r6(col("confidence")).as("confidence"), r6(col("gap")).as("gap"))
      .orderBy("bin"),
    Some {
      val decode = hexDecode4("h", posFn = "strpos", substrFn = "substr")
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |f AS (SELECT doc_id, list_concat(w,
         |        CASE WHEN len(w) >= 2
         |        THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])
         |        ELSE []::VARCHAR[] END) AS f FROM w),
         |s AS (SELECT doc_id, len(f) AS n_feats,
         |        list_sum(list_transform(list_transform(f, t -> md5(t)),
         |          h -> ($decode) % 21 - 10)) AS score
         |      FROM f),
         |m AS (SELECT doc_id, len(w) AS n_tokens,
         |        len(list_distinct(w)) AS n_distinct,
         |        len(list_filter(w, t -> t IN ${inList(stopwords)})) AS n_stop
         |      FROM w),
         |ql AS (SELECT doc_id,
         |         CAST(floor((0.4 * (n_distinct / n_tokens)
         |           + 0.3 * (1.0 - n_stop / n_tokens)
         |           + 0.3 * least(1.0, n_tokens / 50.0)) * 1000000.0 + 0.5)
         |           AS BIGINT) >= $calibGateMicro AS label
         |       FROM m),
         |j AS (SELECT s.doc_id, s.n_feats, s.score, ql.label
         |      FROM s JOIN ql USING (doc_id)),
         |b AS (SELECT (score - (((score % (2 * n_feats)) + 2 * n_feats)
         |          % (2 * n_feats))) // (2 * n_feats) AS bin,
         |        count(*) AS n_docs,
         |        sum(CASE WHEN label THEN 1 ELSE 0 END) AS n_pos,
         |        sum(score) AS sum_score, sum(n_feats) AS sum_feats
         |      FROM j GROUP BY 1)
         |SELECT CAST(bin AS BIGINT) AS bin, CAST(n_docs AS BIGINT) AS n_docs,
         |  CAST(n_pos AS BIGINT) AS n_pos,
         |  CAST(sum_score AS BIGINT) AS sum_score,
         |  CAST(sum_feats AS BIGINT) AS sum_feats,
         |  ${r6s("CAST(sum_score AS DOUBLE) / sum_feats")} AS mean_weight,
         |  ${r6s("CAST(n_pos AS DOUBLE) / n_docs")} AS pos_rate,
         |  ${r6s("(CAST(sum_score AS DOUBLE) / sum_feats + 10.0) / 20.0")} AS confidence,
         |  ${r6s("abs(CAST(n_pos AS DOUBLE) / n_docs - (CAST(sum_score AS DOUBLE) / sum_feats + 10.0) / 20.0)")} AS gap
         |FROM b ORDER BY bin""".stripMargin
    })

  /** The LEXICAL ⊕ DENSE hybrid — the composition a real retrieval
    * stack ships: the same fixed query set scored by batch BM25 over
    * `documents` AND by exact cosine over the query docs' `embeddings`
    * rows (ids align across the two tables by construction of the
    * testdata), fused per query with the catalog's micro-quantized
    * RRF. The lexical list may contain the query's own document while
    * the dense retriever excludes self (its contract) — an asymmetry
    * both engines replay identically. Cost is two already-oracled
    * retrieval passes plus a fusion over top-k-bounded frames.
    */
  private val retrievalHybridBatch = CatalogEntry(
    "retrieval_hybrid_batch",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents")
      val q = d.filter(col("doc_id") % 53 === 0 && col("doc_id") < 5000)
        .select(col("doc_id").as("query_id"),
          slice(split(col("text"), " "), 1, 6).as("query_terms"))
      val lexical = TextAnalysis.bm25TopKBatch(d, q, k = 10)
        .select(col("query_id"), col("doc_id").as("neighbor_id"),
          col("rank").as("rnk"))
      val e = AnnSearch.vectors(QuerySupport.table(s, dir, "embeddings"))
      val dense = AnnSearch.bruteForceTopK(
          e, e.filter(col("vec_id") % 53 === 0 && col("vec_id") < 5000), 10)
        .select("query_id", "neighbor_id", "rnk")
      AnnSearch.rrfFuse(Seq(lexical, dense), topK = 10)
        .orderBy("query_id", "rnk")
    },
    Some(s"""WITH $bm25BatchCtes,
            |lex AS (SELECT query_id, doc_id AS neighbor_id, rank AS rnk
            |        FROM rk WHERE rank <= 10),
            |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
            |p AS (SELECT qd.vec_id AS query_id, c.vec_id AS neighbor_id,
            |        list_sum(list_transform(range(1, len(qd.v) + 1), i -> qd.v[i] * c.v[i])) / (qd.nrm * c.nrm) AS cos
            |      FROM n qd JOIN n c ON c.vec_id <> qd.vec_id
            |      WHERE qd.vec_id % 53 = 0 AND qd.vec_id < 5000),
            |den AS (SELECT query_id, neighbor_id, rnk FROM (
            |         SELECT query_id, neighbor_id,
            |           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
            |         FROM p) WHERE rnk <= 10),
            |u AS (SELECT query_id, neighbor_id,
            |        CAST(floor(1000000.0 / (60 + rnk) + 0.5) AS BIGINT) AS c
            |      FROM (SELECT * FROM lex UNION ALL SELECT * FROM den)),
            |f AS (SELECT query_id, neighbor_id, sum(c) AS rrf_micro, count(*) AS n_lists
            |      FROM u GROUP BY query_id, neighbor_id),
            |rr AS (SELECT query_id, neighbor_id,
            |         CAST(row_number() OVER (PARTITION BY query_id
            |              ORDER BY rrf_micro DESC, neighbor_id) AS INT) AS rnk,
            |         CAST(n_lists AS BIGINT) AS n_lists,
            |         CAST(rrf_micro AS BIGINT) AS rrf_micro FROM f)
            |SELECT * FROM rr WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin))

  /** The hybrid with the INDEX-backed dense side — at corpus scale
    * the exact-cosine dense pass of [[retrievalHybridBatch]] is the
    * one piece that cannot ship (it is a brute-force scan per query);
    * this entry swaps in the IVF index the repo already oracles
    * (`ann_ivf_topk`: two-probe bucket equi-join + exact re-rank
    * within candidates), keeping the identical BM25 lexical side and
    * the identical micro-quantized RRF fusion. Whenever the index's
    * per-query top-k equals the exact top-k, the fused ranking is
    * equal BY CONSTRUCTION (fusion sees only ranks) — spec-pinned,
    * with the recall delta measured through the existing `ann_recall`
    * machinery (VERDICT r13 §next-6).
    */
  /** The fused ANN-hybrid frame (shared by the ranking entry and its
    * known-item eval). */
  private def hybridAnnFused(s: SparkSession, dir: String): DataFrame = {
    val d = QuerySupport.table(s, dir, "documents")
    val q = d.filter(col("doc_id") % 53 === 0 && col("doc_id") < 5000)
      .select(col("doc_id").as("query_id"),
        slice(split(col("text"), " "), 1, 6).as("query_terms"))
    val lexical = TextAnalysis.bm25TopKBatch(d, q, k = 10)
      .select(col("query_id"), col("doc_id").as("neighbor_id"),
        col("rank").as("rnk"))
    val dense = AnnSearch.ivfTopK(QuerySupport.table(s, dir, "embeddings"),
        col("vec_id") % 53 === 0 && col("vec_id") < 5000, 10)
      .select("query_id", "neighbor_id", "rnk")
    AnnSearch.rrfFuse(Seq(lexical, dense), topK = 10)
  }

  /** The fused ANN-hybrid oracle WITH body, ending in `rr`. */
  private lazy val hybridAnnCtes: String =
    s"""$bm25BatchCtes,
       |${ivfRankCtes("a", "vec_id % 53 = 0 AND vec_id < 5000")},
       |lex AS (SELECT query_id, doc_id AS neighbor_id, rank AS rnk
       |        FROM rk WHERE rank <= 10),
       |den AS (SELECT query_id, neighbor_id, rnk FROM ar WHERE rnk <= 10),
       |u AS (SELECT query_id, neighbor_id,
       |        CAST(floor(1000000.0 / (60 + rnk) + 0.5) AS BIGINT) AS c
       |      FROM (SELECT * FROM lex UNION ALL SELECT * FROM den)),
       |f AS (SELECT query_id, neighbor_id, sum(c) AS rrf_micro, count(*) AS n_lists
       |      FROM u GROUP BY query_id, neighbor_id),
       |rr AS (SELECT query_id, neighbor_id,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |              ORDER BY rrf_micro DESC, neighbor_id) AS INT) AS rnk,
       |         CAST(n_lists AS BIGINT) AS n_lists,
       |         CAST(rrf_micro AS BIGINT) AS rrf_micro FROM f)""".stripMargin

  /** RM3-lite pseudo-relevance feedback: the oracle replays the full
    * two-pass chain — first retrieval (the shared [[bm25BatchCtes]]),
    * feedback-term mining (feedback tf x corpus idf, one integer
    * quantization, original terms anti-joined away), term-ranked
    * expansion, and the second retrieval over the expanded per-query
    * term sets.
    */
  private val retrievalPrfExpand = CatalogEntry(
    "retrieval_prf_expand",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents")
      val q = d.filter(col("doc_id") % 53 === 0 && col("doc_id") < 5000)
        .select(col("doc_id").as("query_id"),
          slice(split(col("text"), " "), 1, 6).as("query_terms"))
      TextAnalysis.bm25PrfExpand(d, q, k = 5)
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH $bm25BatchCtes,
            |fb AS (SELECT query_id, doc_id FROM rk WHERE rank <= $prfFbDocs),
            |ft AS (SELECT fb.query_id, t.term, count(*) AS fbtf
            |       FROM t JOIN fb ON t.doc_id = fb.doc_id GROUP BY 1, 2),
            |fv AS (SELECT DISTINCT term FROM ft),
            |fdf AS (SELECT term, count(DISTINCT doc_id) AS df
            |        FROM t JOIN fv USING (term) GROUP BY term),
            |fsc AS (SELECT ft.query_id, ft.term, CAST(floor(
            |          ln((corpus.n_docs - fdf.df + 0.5) / (fdf.df + 0.5) + 1.0)
            |          * ft.fbtf * 1000000.0 + 0.5) AS BIGINT) AS s
            |        FROM ft JOIN fdf USING (term) CROSS JOIN corpus),
            |fnew AS (SELECT * FROM fsc ANTI JOIN qt USING (query_id, term)),
            |fsel AS (SELECT query_id, term FROM (
            |           SELECT *, row_number() OVER (PARTITION BY query_id
            |                ORDER BY s DESC, term) AS rn FROM fnew)
            |         WHERE rn <= $prfFbTerms),
            |qt2 AS (SELECT query_id, term FROM qt
            |        UNION SELECT query_id, term FROM fsel),
            |v2 AS (SELECT DISTINCT term FROM qt2),
            |df2 AS (SELECT term, count(DISTINCT doc_id) AS df
            |        FROM t JOIN v2 USING (term) GROUP BY term),
            |tf2 AS (SELECT doc_id, term, count(*) AS tf
            |        FROM t JOIN v2 USING (term) GROUP BY doc_id, term),
            |sc2 AS (SELECT tf2.doc_id, tf2.term, CAST(floor(
            |          ln((corpus.n_docs - df2.df + 0.5) / (df2.df + 0.5) + 1.0)
            |          * (tf2.tf * 2.2)
            |          / (tf2.tf + 1.2 * (0.25 + 0.75 * st.dl / (corpus.tot / corpus.n_docs)))
            |          * 1000000.0 + 0.5) AS BIGINT) AS c
            |        FROM tf2 JOIN df2 USING (term) JOIN st ON st.doc_id = tf2.doc_id
            |        CROSS JOIN corpus),
            |agg2 AS (SELECT qt2.query_id, sc2.doc_id, count(*) AS n_hit_terms,
            |           sum(sc2.c) AS bm25_micro
            |         FROM sc2 JOIN qt2 USING (term) GROUP BY 1, 2),
            |nx AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_expansion_terms
            |       FROM fsel GROUP BY query_id),
            |rk2 AS (SELECT query_id,
            |          CAST(row_number() OVER (PARTITION BY query_id
            |               ORDER BY bm25_micro DESC, doc_id) AS INT) AS rank,
            |          doc_id, CAST(n_hit_terms AS BIGINT) AS n_hit_terms,
            |          CAST(bm25_micro AS BIGINT) AS bm25_micro
            |        FROM agg2)
            |SELECT rk2.query_id, rk2.rank, rk2.doc_id, rk2.n_hit_terms,
            |  rk2.bm25_micro, coalesce(nx.n_expansion_terms, 0) AS n_expansion_terms
            |FROM rk2 LEFT JOIN nx ON rk2.query_id = nx.query_id
            |WHERE rk2.rank <= 5 ORDER BY rk2.query_id, rk2.rank""".stripMargin))

  private val retrievalHybridAnn = CatalogEntry(
    "retrieval_hybrid_ann",
    (s, dir) => hybridAnnFused(s, dir).orderBy("query_id", "rnk"),
    Some(s"""WITH $hybridAnnCtes
            |SELECT * FROM rr WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin))

  /** Known-item eval of the PRODUCTION retriever (the ANN-backed
    * hybrid): the end-to-end answer to "what did swapping the exact
    * dense side for the index cost in MRR/hit-rate terms", measured
    * through the same exact-integer eval machinery as
    * `retrieval_eval_known_item` — compare the two entries' rows for
    * the delta.
    */
  private val retrievalEvalHybridAnn = CatalogEntry(
    "retrieval_eval_hybrid_ann",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents")
      val q = d.filter(col("doc_id") % 53 === 0 && col("doc_id") < 5000)
        .select(col("doc_id").as("query_id"))
      TextAnalysis.retrievalEval(
          hybridAnnFused(s, dir).select(col("query_id"),
            col("neighbor_id").as("doc_id"), col("rnk").as("rank")),
          q.select(col("query_id"), col("query_id").as("doc_id")), k = 5)
        .orderBy("query_id")
    },
    Some(s"""WITH $hybridAnnCtes,
            |topk AS (SELECT * FROM rr WHERE rnk <= 10),
            |rel AS (SELECT query_id, query_id AS doc_id FROM q),
            |h AS (SELECT rel.query_id, topk.rnk
            |      FROM rel LEFT JOIN topk ON rel.query_id = topk.query_id
            |       AND rel.doc_id = topk.neighbor_id),
            |pq AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_relevant,
            |         CAST(count(rnk) AS BIGINT) AS n_found,
            |         CAST(min(rnk) AS BIGINT) AS first_rank
            |       FROM h GROUP BY query_id)
            |SELECT query_id, n_relevant, n_found, first_rank,
            |  CASE WHEN first_rank IS NOT NULL THEN 1000000 // first_rank
            |       ELSE 0 END AS rr_micro,
            |  coalesce(first_rank = 1, FALSE) AS hit1,
            |  coalesce(first_rank <= 5, FALSE) AS hit_at_k
            |FROM pq ORDER BY query_id""".stripMargin))

  /** Overlapping token chunking: stride-24 windows of 32 tokens, one
    * shuffle-free explode — start offsets, sizes, and texts are pure
    * integer/slice arithmetic, identical in both engines.
    */
  private val textChunkOverlap = CatalogEntry(
    "text_chunk_overlap",
    (s, dir) => TextAnalysis.chunkTokens(
        QuerySupport.table(s, dir, "documents"), size = 32, stride = 24)
      .orderBy("doc_id", "chunk_idx"),
    Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           |s AS (SELECT doc_id, w, unnest(range(0, greatest(len(w), 1), 24)) AS start_token FROM w)
           |SELECT doc_id, CAST(start_token // 24 AS BIGINT) AS chunk_idx,
           |  CAST(start_token AS BIGINT) AS start_token,
           |  CAST(least(32, len(w) - start_token) AS BIGINT) AS n_chunk_tokens,
           |  array_to_string(list_slice(w, start_token + 1, start_token + 32), ' ') AS chunk_text
           |FROM s ORDER BY doc_id, chunk_idx""".stripMargin))

  // ----------------------------------------------------------- skew tools

  /** The salted plans are correctness-equivalent to their unsalted
    * counterparts (salting only changes the exchange shape), so the
    * oracle for each is the PLAIN group-by / join. Values are floored
    * to integers first: integer sums are order-insensitive, so the
    * two-stage partial merge hashes identically to DuckDB's
    * single-pass aggregate.
    */
  private val skewSaltedAgg = CatalogEntry(
    "skew_salted_agg",
    (s, dir) => {
      val ev = QuerySupport.table(s, dir, "events").select(
        // ~3/4 of all rows land on one hot key — the shape AQE can't
        // split without salting (a single oversized group, not an
        // oversized partition).
        when(col("user_id") % 4 =!= 0, lit("HOT")).otherwise(col("event_type")).as("k"),
        floor(col("value") * 1000).cast("long").as("v"))
      SkewTools.saltedSum(ev, Seq("k"), "v").orderBy("k")
    },
    Some("""SELECT CASE WHEN user_id % 4 <> 0 THEN 'HOT' ELSE event_type END AS k,
           |  CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_v,
           |  COUNT(*) AS cnt
           |FROM events GROUP BY 1 ORDER BY k""".stripMargin))

  private val skewSaltedJoin = CatalogEntry(
    "skew_salted_join",
    (s, dir) => {
      val big = QuerySupport.table(s, dir, "events").select(
        col("event_id"), (col("user_id") % 50).as("k"),
        floor(col("value") * 1000).cast("long").as("v"))
      val dim = s.range(0, 40).select(
        col("id").as("k"), concat(lit("G"), col("id").cast("string")).as("tag"))
      SkewTools.saltedBroadcastJoin(big, dim, "k")
        .select("event_id", "k", "v", "tag").orderBy("event_id")
    },
    Some("""SELECT event_id, user_id % 50 AS k,
           |  CAST(floor(value * 1000) AS BIGINT) AS v,
           |  'G' || CAST(user_id % 50 AS VARCHAR) AS tag
           |FROM events WHERE user_id % 50 < 40 ORDER BY event_id""".stripMargin))

  /** Duplicated-span coverage (Lee et al. 2022): positions covered by
    * a shingle occurring >= 2 times corpus-wide (occurrence count, not
    * document frequency), interval-unioned per document via the same
    * lead-capped window on both engines.
    */
  private val textDupSpanCoverage = CatalogEntry(
    "text_dup_span_coverage",
    (s, dir) => Dedup.dupSpanCoverage(QuerySupport.table(s, dir, "documents"))
      // explicit final select in the ORACLE's column order (ADVICE r13
      // #4): the driver compares by name, but a positional consumer
      // must not silently mis-pair the same-typed BIGINT columns
      .select("doc_id", "n_tokens", "n_dup_starts", "covered_tokens",
        "coverage_micro")
      .orderBy("doc_id"),
    Some {
      val sw = shingleWidth
      val cat = (0 until sw).map(o => s"w[i+$o]").mkString(" || ' ' || ")
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |p AS (SELECT doc_id, w,
         |        unnest(range(1, greatest(len(w) - ${sw - 2}, 1))) AS i FROM w),
         |g AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, $cat AS g FROM p),
         |occ AS (SELECT g, count(*) AS occ FROM g GROUP BY g HAVING count(*) >= 2),
         |d AS (SELECT doc_id, pos FROM g JOIN occ USING (g)),
         |c AS (SELECT doc_id, pos,
         |        lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt FROM d),
         |cov AS (SELECT doc_id,
         |          sum(CASE WHEN nxt IS NULL THEN $sw
         |                   ELSE least($sw, nxt - pos) END) AS covered_tokens,
         |          count(*) AS n_dup_starts
         |        FROM c GROUP BY doc_id),
         |n AS (SELECT doc_id, len(w) AS n_tokens FROM w)
         |SELECT n.doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST(coalesce(n_dup_starts, 0) AS BIGINT) AS n_dup_starts,
         |  CAST(coalesce(covered_tokens, 0) AS BIGINT) AS covered_tokens,
         |  CAST(coalesce(covered_tokens, 0) * 1000000 // n_tokens AS BIGINT)
         |    AS coverage_micro
         |FROM n LEFT JOIN cov USING (doc_id) ORDER BY doc_id""".stripMargin
    })

  /** Corpus-wide duplicated-line removal (no first-occurrence
    * protection — chrome, not content): the oracle replays the line
    * occurrence count and the ordered reassembly.
    */
  private val textLineDedup = CatalogEntry(
    "text_line_dedup",
    (s, dir) => Dedup.lineDedup(QuerySupport.table(s, dir, "documents"))
      .orderBy("doc_id"),
    Some("""WITH w0 AS (SELECT doc_id, string_split(text, chr(10)) AS w FROM documents),
           |li AS (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i FROM w0),
           |l AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS ln, w[i] AS line FROM li),
           |hot AS (SELECT line, count(*) AS occ FROM l GROUP BY line
           |        HAVING count(*) > 1),
           |j AS (SELECT l.doc_id, l.ln, l.line, hot.line IS NOT NULL AS dropped
           |      FROM l LEFT JOIN hot ON l.line = hot.line)
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
           |  CAST(sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
           |  coalesce(string_agg(CASE WHEN NOT dropped THEN line END, chr(10)
           |    ORDER BY ln), '') AS text_clean
           |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  /** Duplicated-span removal with first-occurrence protection: the
    * oracle replays the gram first-occurrence window, the running
    * coverage max, and the ordered string_agg reassembly.
    */
  private val textDupSpanRemoval = CatalogEntry(
    "text_dup_span_removal",
    (s, dir) => Dedup.dupSpanRemoval(QuerySupport.table(s, dir, "documents"))
      .orderBy("doc_id"),
    Some {
      val sw = shingleWidth
      val cat = (0 until sw).map(o => s"w[i+$o]").mkString(" || ' ' || ")
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |p AS (SELECT doc_id, w,
         |        unnest(range(1, greatest(len(w) - ${sw - 2}, 1))) AS i FROM w),
         |g AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, $cat AS g FROM p),
         |f AS (SELECT *, row_number() OVER (PARTITION BY g
         |                                   ORDER BY doc_id, pos) AS rn FROM g),
         |s AS (SELECT doc_id, pos FROM f WHERE rn > 1),
         |ti AS (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i FROM w),
         |tok AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, w[i] AS token FROM ti),
         |j AS (SELECT t.doc_id, t.pos, t.token, s.pos IS NOT NULL AS is_start
         |      FROM tok t LEFT JOIN s ON t.doc_id = s.doc_id AND t.pos = s.pos),
         |c AS (SELECT *, max(CASE WHEN is_start THEN pos + $sw END)
         |        OVER (PARTITION BY doc_id ORDER BY pos
         |              ROWS UNBOUNDED PRECEDING) AS cov_end
         |      FROM j),
         |k AS (SELECT *, cov_end IS NULL OR pos >= cov_end AS keep FROM c)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
         |  coalesce(string_agg(CASE WHEN keep THEN token END, ' ' ORDER BY pos), '')
         |    AS text_clean
         |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin
    })

  /** Deterministic HLL distinct-estimate audit: the oracle replays the
    * md5-derived 64-register sketch digit-for-digit (bucket, capped
    * leading-zero rank, integer max-combine, one pre-scaled integer
    * division) next to the exact distinct count — both engines agree
    * on every intermediate because no float ever enters an aggregate.
    */
  private val textVocabHll = CatalogEntry(
    "text_vocab_hll",
    (s, dir) => TextAnalysis.vocabHllAudit(
      QuerySupport.table(s, dir, "documents")),
    Some {
      val d = "(strpos('0123456789abcdef', substr(st, 1, 1)) - 1)"
      val hv = hexDecode4("h", posFn = "strpos", substrFn = "substr")
      s"""WITH t AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
         |hh AS (SELECT md5(token) AS h FROM t),
         |sx AS (SELECT ($hv) % 64 AS b, ltrim(substr(h, 5, 28), '0') AS st FROM hh),
         |rr AS (SELECT b, CASE WHEN st = '' THEN 30
         |         ELSE least(30, (28 - length(st)) * 4 +
         |           (CASE WHEN $d >= 8 THEN 0 WHEN $d >= 4 THEN 1
         |                 WHEN $d >= 2 THEN 2 ELSE 3 END) + 1) END AS rho
         |       FROM sx),
         |bk AS (SELECT b, max(rho) AS mr FROM rr GROUP BY b),
         |zz AS (SELECT CAST(count(*) AS BIGINT) AS nb,
         |         CAST(coalesce(sum(1::BIGINT << (30 - mr)), 0) AS BIGINT) AS zp
         |       FROM bk),
         |ex AS (SELECT CAST(count(DISTINCT token) AS BIGINT) AS exact_distinct FROM t),
         |zs AS (SELECT nb, zp + (64 - nb) * (1::BIGINT << 30) AS z_scaled FROM zz),
         |es AS (SELECT nb, z_scaled,
         |         (1890844672::BIGINT * (1::BIGINT << 30)) // (650790 * z_scaled)
         |           AS est_distinct
         |       FROM zs)
         |SELECT CAST(64 AS BIGINT) AS m, nb AS n_buckets_seen, z_scaled,
         |  est_distinct, exact_distinct,
         |  abs(est_distinct - exact_distinct) * 1000000
         |    // greatest(exact_distinct, 1) AS abs_err_micro
         |FROM es CROSS JOIN ex""".stripMargin
    })

  /** Per-source HLL + register-max union: the oracle replays the
    * per-source sketch and merges registers the same way; the union
    * row equaling the whole-corpus sketch is the mergeability
    * property the spec pins.
    */
  /** The direct per-source HLL oracle chain — shared VERBATIM by the
    * direct entry and the shard-merge entry below: the merge entry's
    * hash equality against this SAME SQL is the mergeability PROOF
    * (shard registers max-merged == registers of the whole corpus).
    */
  private lazy val hllSourcesOracleSql: String = {
      val d = "(strpos('0123456789abcdef', substr(st, 1, 1)) - 1)"
      val hv = hexDecode4("h", posFn = "strpos", substrFn = "substr")
      s"""WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
         |hh AS (SELECT source, md5(token) AS h FROM t),
         |sx AS (SELECT source, ($hv) % 64 AS b, ltrim(substr(h, 5, 28), '0') AS st FROM hh),
         |rr AS (SELECT source, b, CASE WHEN st = '' THEN 30
         |         ELSE least(30, (28 - length(st)) * 4 +
         |           (CASE WHEN $d >= 8 THEN 0 WHEN $d >= 4 THEN 1
         |                 WHEN $d >= 2 THEN 2 ELSE 3 END) + 1) END AS rho
         |       FROM sx),
         |bk AS (SELECT source, b, max(rho) AS mr FROM rr GROUP BY source, b),
         |es AS (SELECT source, CAST(count(*) AS BIGINT) AS nb,
         |         CAST(coalesce(sum(1::BIGINT << (30 - mr)), 0) AS BIGINT) AS zp
         |       FROM bk GROUP BY source),
         |un AS (SELECT b, max(mr) AS mr FROM bk GROUP BY b),
         |eu AS (SELECT CAST(count(*) AS BIGINT) AS nb,
         |         CAST(coalesce(sum(1::BIGINT << (30 - mr)), 0) AS BIGINT) AS zp
         |       FROM un),
         |al AS (SELECT source, nb, zp FROM es
         |       UNION ALL SELECT '__union', nb, zp FROM eu),
         |zz AS (SELECT source, nb AS n_buckets_seen,
         |         zp + (64 - nb) * (1::BIGINT << 30) AS z_scaled FROM al)
         |SELECT source, n_buckets_seen, z_scaled,
         |  (1890844672::BIGINT * (1::BIGINT << 30)) // (650790 * z_scaled)
         |    AS est_distinct
         |FROM zz ORDER BY source""".stripMargin
  }

  private val textVocabHllSources = CatalogEntry(
    "text_vocab_hll_sources",
    (s, dir) => TextAnalysis.vocabHllBySource(
        QuerySupport.table(s, dir, "documents"))
      .orderBy("source"),
    Some(hllSourcesOracleSql))

  /** Shard-merge mergeability PROOF under the hash gate: the Spark
    * side sketches four DISJOINT doc_id shards independently and
    * max-merges their registers; the oracle is the direct whole-corpus
    * chain above, verbatim — row/hash equality IS the claim "per-shard
    * sketches combine associatively to the whole-corpus sketch"
    * (the property every 100 TB rollup rests on), checked end-to-end
    * by the driver instead of asserted in a spec.
    */
  private val textVocabHllShardMerge = CatalogEntry(
    "text_vocab_hll_shard_merge",
    (s, dir) => TextAnalysis.vocabHllShardMerge(
        QuerySupport.table(s, dir, "documents"))
      .orderBy("source"),
    Some(hllSourcesOracleSql))

  /** First BPE merge candidates: the oracle replays the
    * vocabulary-weighted char-pair count and the deterministic cut.
    */
  private val textBpeMerges = CatalogEntry(
    "text_bpe_merges",
    (s, dir) => TextAnalysis.bpeFirstMerges(
        QuerySupport.table(s, dir, "documents"))
      .orderBy("rank"),
    Some("""WITH t AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
           |v AS (SELECT w, count(*) AS f FROM t WHERE len(w) >= 2 GROUP BY w),
           |p AS (SELECT substr(w, i, 1) AS ch_a, substr(w, i + 1, 1) AS ch_b, f
           |      FROM (SELECT w, f, unnest(range(1, len(w))) AS i FROM v)),
           |c AS (SELECT ch_a, ch_b, CAST(sum(f) AS BIGINT) AS n_pairs
           |      FROM p GROUP BY ch_a, ch_b),
           |r AS (SELECT *, row_number() OVER (ORDER BY n_pairs DESC, ch_a, ch_b)
           |        AS rank FROM c)
           |SELECT ch_a, ch_b, n_pairs, CAST(rank AS BIGINT) AS rank
           |FROM r WHERE rank <= 50 ORDER BY rank""".stripMargin))

  /** Tokenizer application under the hash gate (VERDICT r14 §next-7):
    * [[TextAnalysis.bpeEncodeStats]] with the FIXED literal merge
    * table ([[LlmDataParams.bpeFixedMerges]] — the five merges
    * training learns on this corpus), so the encode pass is one-query
    * SQL: the oracle replays each greedy leftmost-non-overlapping
    * merge fold as a `list_reduce` over the space-joined spelling
    * (tail symbol = a ∧ incoming = b → fuse; the string tail test
    * `acc = a OR ends_with(acc, ' ' || a)` is exactly the fold's
    * last-SYMBOL equality, since symbols never contain spaces). The
    * data-dependent training path stays the spec-only [[TextAnalysis
    * .bpeTrain]] surface.
    */
  private val textBpeFertility = CatalogEntry(
    "text_bpe_fertility",
    (s, dir) => TextAnalysis.bpeEncodeStats(
        QuerySupport.table(s, dir, "documents"), bpeFixedMerges)
      .orderBy("lang"),
    Some {
      def esc(x: String) = x.replace("'", "''")
      val folds = bpeFixedMerges.zipWithIndex.map { case ((a, b), i) =>
        val ab = esc(a + b)
        s"""s${i + 1} AS (SELECT lang, f, list_reduce(string_split(e, ' '),
           |  (acc, x) -> CASE WHEN (acc = '${esc(a)}'
           |      OR ends_with(acc, ' ' || '${esc(a)}')) AND x = '${esc(b)}'
           |    THEN substr(acc, 1, len(acc) - ${a.length}) || '$ab'
           |    ELSE acc || ' ' || x END) AS e FROM s$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH wd AS (SELECT lang, unnest(string_split(text, ' ')) AS w
         |      FROM documents),
         |vc AS (SELECT lang, w, count(*) AS f FROM wd GROUP BY 1, 2),
         |s0 AS (SELECT lang, f, CASE WHEN len(w) = 0 THEN ''
         |        ELSE array_to_string(
         |          list_transform(range(1, len(w) + 1), i -> w[i]), ' ')
         |        END AS e FROM vc),
         |$folds
         |SELECT lang, CAST(sum(f) AS BIGINT) AS n_words,
         |  CAST(sum(f * len(string_split(e, ' '))) AS BIGINT) AS n_tokens,
         |  CAST(sum(f * len(string_split(e, ' '))) * 1000000 // sum(f)
         |    AS BIGINT) AS fertility_micro
         |FROM s${bpeFixedMerges.size} GROUP BY lang ORDER BY lang""".stripMargin
    })

  /** KMV cross-source vocabulary overlap: the oracle replays the
    * bottom-k sketch cut, the union bottom-k estimator, and the exact
    * hash-grain Jaccard audit digit-for-digit (md5 16-bit decode,
    * integer micro division).
    */
  private val textVocabKmvOverlap = CatalogEntry(
    "text_vocab_kmv_overlap",
    (s, dir) => TextAnalysis.vocabKmvOverlap(
        QuerySupport.table(s, dir, "documents"))
      .orderBy("source_a", "source_b"),
    Some {
      val sw = shingleWidth
      val cat = (0 until sw).map(o => s"w[i+$o]").mkString(" || ' ' || ")
      val hv = hexDecode4("hh", posFn = "strpos", substrFn = "substr")
      val k = kmvK
      s"""WITH w AS (SELECT source, string_split(text, ' ') AS w FROM documents),
         |p AS (SELECT source, w,
         |        unnest(range(1, greatest(len(w) - ${sw - 2}, 1))) AS i FROM w),
         |g AS (SELECT source, $cat AS g FROM p),
         |h0 AS (SELECT source, md5(g) AS hh FROM g),
         |hh AS (SELECT DISTINCT source, CAST($hv AS BIGINT) AS h FROM h0),
         |sk AS (SELECT source, h FROM (
         |         SELECT source, h,
         |           row_number() OVER (PARTITION BY source ORDER BY h) AS rn
         |         FROM hh) WHERE rn <= $k),
         |sr AS (SELECT DISTINCT source FROM sk),
         |pr AS (SELECT a.source AS source_a, b.source AS source_b
         |       FROM sr a JOIN sr b ON a.source < b.source),
         |ab AS (SELECT source_a, source_b, h, 1 AS ina, 0 AS inb
         |       FROM pr JOIN sk ON sk.source = pr.source_a
         |       UNION ALL
         |       SELECT source_a, source_b, h, 0 AS ina, 1 AS inb
         |       FROM pr JOIN sk ON sk.source = pr.source_b),
         |mg AS (SELECT source_a, source_b, h, max(ina) AS ina, max(inb) AS inb
         |       FROM ab GROUP BY 1, 2, 3),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY source_a, source_b
         |                                    ORDER BY h) AS rn FROM mg),
         |es AS (SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS k_eff,
         |         CAST(coalesce(sum(ina * inb), 0) AS BIGINT) AS n_common_in_k
         |       FROM rk WHERE rn <= $k GROUP BY 1, 2),
         |ix AS (SELECT a.source AS source_a, b.source AS source_b,
         |         CAST(count(*) AS BIGINT) AS n_intersect
         |       FROM hh a JOIN hh b ON a.h = b.h AND a.source < b.source
         |       GROUP BY 1, 2),
         |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM hh
         |       GROUP BY source),
         |fin AS (SELECT es.source_a, es.source_b, es.k_eff, es.n_common_in_k,
         |          es.n_common_in_k * 1000000 // es.k_eff AS jaccard_est_micro,
         |          coalesce(ix.n_intersect, 0) AS n_intersect,
         |          za.n + zb.n - coalesce(ix.n_intersect, 0) AS n_union
         |        FROM es
         |        LEFT JOIN ix ON es.source_a = ix.source_a
         |                    AND es.source_b = ix.source_b
         |        JOIN sz za ON za.source = es.source_a
         |        JOIN sz zb ON zb.source = es.source_b)
         |SELECT source_a, source_b, k_eff, n_common_in_k, jaccard_est_micro,
         |  n_intersect, n_union,
         |  n_intersect * 1000000 // n_union AS exact_jaccard_micro,
         |  abs(jaccard_est_micro - n_intersect * 1000000 // n_union)
         |    AS abs_err_micro
         |FROM fin ORDER BY source_a, source_b""".stripMargin
    })

  /** Count-Min audit: the oracle rebuilds the depth x width cell grid
    * from the same 'cms{j}:'-salted md5 decode and reads each token
    * back as its min cell; est >= exact is structural on both engines.
    */
  private val textCmsAudit = CatalogEntry(
    "text_cms_audit",
    (s, dir) => TextAnalysis.cmsAudit(
        QuerySupport.table(s, dir, "documents"))
      .orderBy("token"),
    Some {
      val hv = hexDecode4("hh", posFn = "strpos", substrFn = "substr")
      s"""WITH t AS (SELECT unnest(string_split(text, ' ')) AS token
         |           FROM documents),
         |r AS (SELECT token, unnest(range(0, $cmsDepth)) AS j FROM t),
         |hc AS (SELECT token, j,
         |         md5('cms' || CAST(j AS VARCHAR) || ':' || token) AS hh
         |       FROM r),
         |cl AS (SELECT token, j, ($hv) % $cmsWidth AS cell FROM hc),
         |cnt AS (SELECT j, cell, CAST(count(*) AS BIGINT) AS n FROM cl
         |        GROUP BY 1, 2),
         |ex AS (SELECT token, CAST(count(*) AS BIGINT) AS n_exact FROM t
         |       GROUP BY token),
         |tc AS (SELECT DISTINCT token, j, cell FROM cl),
         |es AS (SELECT token, min(n) AS n_cms_est
         |       FROM tc JOIN cnt USING (j, cell) GROUP BY token)
         |SELECT ex.token, ex.n_exact, es.n_cms_est,
         |  (es.n_cms_est - ex.n_exact) * 1000000
         |    // greatest(ex.n_exact, 1) AS overest_micro
         |FROM ex JOIN es USING (token) ORDER BY token""".stripMargin
    })

  /** Truncation-duplicate pairs over a corpus with injected exact
    * copies (1 in 5) and 15-token truncations (1 in 7): docs divisible
    * by 35 form 3-member prefix buckets, so maxBucket = 2 exercises
    * the star-expansion path next to the exact pair path; the oracle
    * replicates both branches and the boundary-aware prefix verify.
    */
  private val dedupPrefix = CatalogEntry(
    "dedup_prefix",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents").select("doc_id", "text")
      val corpus = d
        .union(d.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
        .union(d.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 2000000).as("doc_id"),
            expr("concat_ws(' ', slice(split(text, ' '), 1, 15))").as("text")))
      Dedup.prefixDups(corpus, maxBucket = 2).orderBy("doc_a", "doc_b")
    },
    Some(s"""WITH corpus AS (
            |  SELECT doc_id, text FROM documents
            |  UNION ALL
            |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
            |  WHERE doc_id % 5 = 0
            |  UNION ALL
            |  SELECT doc_id + 2000000 AS doc_id,
            |    array_to_string(list_slice(string_split(text, ' '), 1, 15), ' ')
            |      AS text
            |  FROM documents WHERE doc_id % 7 = 0),
            |w AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM corpus),
            |ky AS (SELECT doc_id, text,
            |         array_to_string(list_slice(w, 1, $prefixKeyTokens), ' ') AS pk
            |       FROM w WHERE len(w) >= $prefixKeyTokens),
            |st AS (SELECT pk, count(*) AS n, min(doc_id) AS rep FROM ky
            |       GROUP BY pk),
            |kk AS (SELECT ky.doc_id, ky.text, ky.pk, st.n, st.rep
            |       FROM ky JOIN st USING (pk)),
            |cand AS (
            |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            |         a.text AS ta, b.text AS tb
            |  FROM kk a JOIN kk b ON a.pk = b.pk AND a.doc_id < b.doc_id
            |  WHERE a.n <= 2
            |  UNION ALL
            |  SELECT kk.rep AS doc_a, kk.doc_id AS doc_b,
            |         r.text AS ta, kk.text AS tb
            |  FROM kk JOIN ky r ON r.doc_id = kk.rep
            |  WHERE kk.n > 2 AND kk.doc_id <> kk.rep),
            |rel AS (SELECT doc_a, doc_b,
            |  CASE WHEN ta = tb THEN 'equal'
            |       WHEN length(ta) < length(tb)
            |         AND starts_with(tb, ta || ' ') THEN 'prefix_a_of_b'
            |       WHEN length(tb) < length(ta)
            |         AND starts_with(ta, tb || ' ') THEN 'prefix_b_of_a'
            |  END AS relation,
            |  CAST(length(ta) AS BIGINT) AS n_chars_a,
            |  CAST(length(tb) AS BIGINT) AS n_chars_b
            |  FROM cand)
            |SELECT doc_a, doc_b, relation, n_chars_a, n_chars_b
            |FROM rel WHERE relation IS NOT NULL
            |ORDER BY doc_a, doc_b""".stripMargin))

  /** Top-50 PMI collocations, min pair count 5: one rational argument
    * into `ln`, micro-nat quantization per pair, deterministic
    * (pmi desc, pair) ranking on both engines.
    */
  private val textCollocations = CatalogEntry(
    "text_collocations",
    (s, dir) => TextAnalysis.collocationsTopK(
        QuerySupport.table(s, dir, "documents"))
      .orderBy("rank"),
    Some("""WITH w AS (SELECT string_split(text, ' ') AS w FROM documents),
           |u AS (SELECT unnest(w) AS token FROM w),
           |uc AS (SELECT token, count(*) AS c FROM u GROUP BY token),
           |pp AS (SELECT w[i] AS tok_a, w[i + 1] AS tok_b
           |       FROM (SELECT w, unnest(range(1, len(w))) AS i FROM w
           |             WHERE len(w) >= 2)),
           |pc AS (SELECT tok_a, tok_b, count(*) AS n_pair FROM pp
           |       GROUP BY tok_a, tok_b HAVING count(*) >= 5),
           |tt AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uc),
           |tp AS (SELECT CAST(sum(n_pair) AS BIGINT) AS np FROM pc),
           |sc AS (SELECT pc.tok_a, pc.tok_b, CAST(pc.n_pair AS BIGINT) AS n_pair,
           |         CAST(a.c AS BIGINT) AS n_a, CAST(b.c AS BIGINT) AS n_b,
           |         CAST(floor(ln((CAST(pc.n_pair AS DOUBLE) * tt.n * tt.n)
           |           / (CAST(a.c AS DOUBLE) * b.c * tp.np)) * 1000000 + 0.5)
           |           AS BIGINT) AS pmi_micro
           |       FROM pc JOIN uc a ON a.token = pc.tok_a
           |         JOIN uc b ON b.token = pc.tok_b
           |         CROSS JOIN tt CROSS JOIN tp),
           |rk AS (SELECT *, row_number() OVER (ORDER BY pmi_micro DESC,
           |         tok_a, tok_b) AS rank FROM sc)
           |SELECT tok_a, tok_b, n_pair, n_a, n_b, pmi_micro,
           |  CAST(rank AS BIGINT) AS rank
           |FROM rk WHERE rank <= 50 ORDER BY rank""".stripMargin))

  /** Shared DSIR oracle CTE chain ending in
    * `a(doc_id, n_feats, s)` — hashed-unigram buckets, the add-one
    * smoothed target/raw models, per-bucket micro-nat log ratios, and
    * the exact per-doc BIGINT weight sum (mirrors Dsir.dsirWeights).
    */
  private val dsirCtes: String = {
    val b = dsirBuckets
    val hx = hexDecode4("md5(term)", posFn = "strpos", substrFn = "substr")
    s"""t AS (SELECT doc_id, lang = '$dsirTargetLang' AS tgt,
       |        unnest(string_split(text, ' ')) AS term FROM documents),
       |h AS (SELECT doc_id, tgt, ($hx) % $b AS b FROM t),
       |m AS (SELECT b, count(*) AS raw_cnt,
       |        sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS tcnt
       |      FROM h GROUP BY b),
       |tot AS (SELECT sum(raw_cnt) AS rt, sum(tcnt) AS tt FROM m),
       |lr AS (SELECT b, CAST(floor(ln(
       |         (CAST(tcnt + 1 AS DOUBLE) * CAST(rt + $b AS DOUBLE)) /
       |         (CAST(raw_cnt + 1 AS DOUBLE) * CAST(tt + $b AS DOUBLE)))
       |         * 1000000.0 + 0.5) AS BIGINT) AS lr
       |       FROM m CROSS JOIN tot),
       |a AS (SELECT doc_id, count(*) AS n_feats, sum(lr) AS s
       |      FROM h JOIN lr USING (b) GROUP BY doc_id)""".stripMargin
  }

  /** DSIR importance weights (Xie et al. 2023): hashed-unigram
    * target/raw models with per-bucket micro-nat quantized log ratios,
    * so each document's weight is an exact BIGINT replayed by the
    * oracle.
    */
  private val textDsirWeights = CatalogEntry(
    "text_dsir_weights",
    (s, dir) => Dsir.dsirWeights(QuerySupport.table(s, dir, "documents"),
        target = col("lang") === dsirTargetLang)
      .select(col("doc_id"), col("n_feats"), col("logw_unats"),
        r6(col("avg_logw")).as("avg_logw"))
      .orderBy("doc_id"),
    Some(s"""WITH $dsirCtes
            |SELECT doc_id, CAST(n_feats AS BIGINT) AS n_feats,
            |  CAST(s AS BIGINT) AS logw_unats,
            |  ${r6s("CAST(s AS DOUBLE) / 1000000.0 / n_feats")} AS avg_logw
            |FROM a ORDER BY doc_id""".stripMargin))

  /** DSIR Gumbel-top-k resample: the deterministic id-digest uniform
    * feeds the double-ln Gumbel key, micro-nat quantized, and the
    * top-k cut replays as a rank window over `logw + gumbel`.
    */
  private val sampleDsir = CatalogEntry(
    "sample_dsir",
    (s, dir) => Dsir.dsirResample(QuerySupport.table(s, dir, "documents"),
        target = col("lang") === dsirTargetLang)
      .orderBy("rank"),
    Some {
      val md5s = "md5('dsir:' || CAST(doc_id AS VARCHAR))"
      val hi = hexDecode4(s"substr($md5s, 1, 4)", posFn = "strpos", substrFn = "substr")
      val lo = hexDecode4(s"substr($md5s, 5, 4)", posFn = "strpos", substrFn = "substr")
      s"""WITH $dsirCtes,
         |g AS (SELECT doc_id, n_feats, s,
         |        CAST(floor(-ln(-ln(((($hi) * 65536 + ($lo)) + 1) / 4294967297.0))
         |          * 1000000.0 + 0.5) AS BIGINT) AS gum
         |      FROM a),
         |k AS (SELECT doc_id, n_feats, s, gum, s + gum AS key FROM g),
         |rk AS (SELECT *, row_number() OVER (ORDER BY key DESC, doc_id)
         |         AS rank FROM k)
         |SELECT CAST(rank AS BIGINT) AS rank, doc_id,
         |  CAST(n_feats AS BIGINT) AS n_feats, CAST(s AS BIGINT) AS logw_unats,
         |  gum AS gumbel_unats, CAST(key AS BIGINT) AS key_unats
         |FROM rk WHERE rank <= $dsirK ORDER BY rank""".stripMargin
    })

  /** Neyman-allocation stratified sample: exact integer stratum
    * stats, double s_h/quotas from them, largest-remainder rounding
    * (ties on the stratum key), bottom-k hash draw per stratum.
    */
  private val sampleNeyman = CatalogEntry(
    "sample_neyman",
    (s, dir) => Sampling.sampleNeyman(
        QuerySupport.table(s, dir, "documents")
          .withColumn("__tok", size(split(col("text"), " ")).cast("long")),
        stratumCol = "lang", idCol = "doc_id", valueCol = "__tok",
        totalK = 60)
      .orderBy("stratum", "rank"),
    Some {
      val md5s = "md5('nsamp:' || CAST(doc_id AS VARCHAR))"
      val hi = hexDecode4(s"substr($md5s, 1, 4)", posFn = "strpos", substrFn = "substr")
      val lo = hexDecode4(s"substr($md5s, 5, 4)", posFn = "strpos", substrFn = "substr")
      s"""WITH d AS (SELECT lang AS st, doc_id,
         |        CAST(len(string_split(text, ' ')) AS BIGINT) AS v
         |      FROM documents),
         |s AS (SELECT st, count(*) AS n, sum(v) AS sv, sum(v * v) AS svv
         |      FROM d GROUP BY st),
         |w AS (SELECT st, n, CASE WHEN n >= 2
         |        THEN CAST(n AS DOUBLE)
         |          * sqrt((svv - CAST(sv AS DOUBLE) * sv / n) / (n - 1))
         |        ELSE 0.0 END AS wh FROM s),
         |tw AS (SELECT sum(wh) AS tww FROM w),
         |q AS (SELECT st, CASE WHEN tww > 0 THEN 60 * wh / tww
         |        ELSE 0.0 END AS quota FROM w CROSS JOIN tw),
         |b AS (SELECT st, quota, CAST(floor(quota) AS BIGINT) AS base FROM q),
         |tb AS (SELECT sum(base) AS sb FROM b),
         |r AS (SELECT st, base, row_number() OVER
         |        (ORDER BY quota - floor(quota) DESC, st) AS rr FROM b),
         |a AS (SELECT r.st, base + CASE WHEN rr <= 60 - tb.sb
         |        THEN 1 ELSE 0 END AS k_h FROM r CROSS JOIN tb),
         |dd AS (SELECT DISTINCT st, doc_id FROM d),
         |hh AS (SELECT st, doc_id, ($hi) * 65536 + ($lo) AS h FROM dd),
         |rk AS (SELECT st, doc_id, h, row_number() OVER
         |        (PARTITION BY st ORDER BY h, doc_id) AS rank FROM hh)
         |SELECT rk.st AS stratum, CAST(a.k_h AS BIGINT) AS k_h,
         |  rk.doc_id AS id, CAST(h AS BIGINT) AS h, CAST(rank AS BIGINT) AS rank
         |FROM rk JOIN a ON a.st = rk.st WHERE rank <= a.k_h
         |ORDER BY stratum, rank""".stripMargin
    })

  /** Bottom-k priority sample per group: the mergeable uniform sample
    * whose streaming twin is pinned row-identical by spec; the oracle
    * replays the distinct projection, the md5 draw, and the (h, id)
    * rank cut.
    */
  private val samplePriorityGroup = CatalogEntry(
    "sample_priority_group",
    (s, dir) => Sampling.prioritySamplePerGroup(
        QuerySupport.table(s, dir, "documents"),
        groupCol = "lang", idCol = "doc_id", k = 20)
      .orderBy("group", "rank"),
    Some {
      val md5s = "md5('psamp:' || CAST(id AS VARCHAR))"
      val hi = hexDecode4(s"substr($md5s, 1, 4)", posFn = "strpos", substrFn = "substr")
      val lo = hexDecode4(s"substr($md5s, 5, 4)", posFn = "strpos", substrFn = "substr")
      s"""WITH d AS (SELECT DISTINCT lang AS grp, doc_id AS id FROM documents),
         |h AS (SELECT grp, id, ($hi) * 65536 + ($lo) AS h FROM d),
         |r AS (SELECT grp, id, h,
         |        row_number() OVER (PARTITION BY grp ORDER BY h, id) AS rank
         |      FROM h)
         |SELECT grp AS "group", id, CAST(h AS BIGINT) AS h,
         |  CAST(rank AS BIGINT) AS rank
         |FROM r WHERE rank <= 20 ORDER BY "group", rank""".stripMargin
    })

  /** Exact-k weighted sample without replacement (A-ES): the oracle
    * replays the md5-uniform draw, the single ln-on-rational key
    * quantization, and the (key, id) rank cut.
    */
  private val sampleWeighted = CatalogEntry(
    "sample_weighted",
    (s, dir) => Sampling.sampleWeightedTopK(
        QuerySupport.table(s, dir, "documents")
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("w")),
        idCol = "doc_id", weightCol = "w", k = 100)
      .orderBy("rank"),
    Some {
      val md5s = "md5('wsamp:' || CAST(doc_id AS VARCHAR))"
      val hi = hexDecode4(s"substr($md5s, 1, 4)", posFn = "strpos", substrFn = "substr")
      val lo = hexDecode4(s"substr($md5s, 5, 4)", posFn = "strpos", substrFn = "substr")
      s"""WITH d AS (SELECT doc_id,
         |        CAST(len(string_split(text, ' ')) AS BIGINT) AS weight,
         |        ($hi) * 65536 + ($lo) AS hv
         |      FROM documents),
         |kk AS (SELECT doc_id, weight,
         |         CAST(floor(-ln((hv + 1) / 4294967296.0)
         |           * 1000000000000.0 / weight) AS BIGINT) AS key_pico
         |       FROM d WHERE weight > 0),
         |rk AS (SELECT *, row_number() OVER (ORDER BY key_pico, doc_id)
         |         AS rank FROM kk)
         |SELECT doc_id, weight, key_pico, CAST(rank AS BIGINT) AS rank
         |FROM rk WHERE rank <= 100 ORDER BY rank""".stripMargin
    })

  /** Daily-active-users by HLL sketch with exact audit: 64 integer
    * registers per day instead of a per-day distinct-user shuffle;
    * the oracle replays the sketch per bucket digit-for-digit.
    */
  private val eventsDauHll = CatalogEntry(
    "events_dau_hll",
    (s, dir) => {
      val raw = QuerySupport.table(s, dir, "events")
      val ev = raw
        .select(col("user_id"), QuerySupport.tsMicros(raw).as("t_us"))
        .select(col("user_id"),
          graft.enrich.TimeSeriesOps.floorDivCol("t_us", 86400000000L)
            .as("day"))
      TextAnalysis.hllDistinctByGroup(ev,
          groupCol = "day", valueCol = "user_id")
        .orderBy("group")
    },
    Some {
      val d = "(strpos('0123456789abcdef', substr(st, 1, 1)) - 1)"
      val hv = hexDecode4("h", posFn = "strpos", substrFn = "substr")
      s"""WITH t AS (SELECT epoch_us(ts) // 86400000000 AS grp,
         |        CAST(user_id AS VARCHAR) AS token FROM events),
         |hh AS (SELECT grp, md5(token) AS h FROM t),
         |sx AS (SELECT grp, ($hv) % 64 AS b, ltrim(substr(h, 5, 28), '0') AS st FROM hh),
         |rr AS (SELECT grp, b, CASE WHEN st = '' THEN 30
         |         ELSE least(30, (28 - length(st)) * 4 +
         |           (CASE WHEN $d >= 8 THEN 0 WHEN $d >= 4 THEN 1
         |                 WHEN $d >= 2 THEN 2 ELSE 3 END) + 1) END AS rho
         |       FROM sx),
         |bk AS (SELECT grp, b, max(rho) AS mr FROM rr GROUP BY grp, b),
         |es AS (SELECT grp, CAST(count(*) AS BIGINT) AS nb,
         |         CAST(coalesce(sum(1::BIGINT << (30 - mr)), 0) AS BIGINT) AS zp
         |       FROM bk GROUP BY grp),
         |ex AS (SELECT grp, CAST(count(DISTINCT token) AS BIGINT) AS exact_distinct
         |       FROM t GROUP BY grp),
         |zz AS (SELECT grp, nb AS n_buckets_seen,
         |         zp + (64 - nb) * (1::BIGINT << 30) AS z_scaled FROM es),
         |ee AS (SELECT grp, n_buckets_seen, z_scaled,
         |         (1890844672::BIGINT * (1::BIGINT << 30)) // (650790 * z_scaled)
         |           AS est_distinct
         |       FROM zz)
         |SELECT ee.grp AS "group", n_buckets_seen, z_scaled, est_distinct,
         |  exact_distinct,
         |  abs(est_distinct - exact_distinct) * 1000000
         |    // greatest(exact_distinct, 1) AS abs_err_micro
         |FROM ee JOIN ex USING (grp) ORDER BY "group"""".stripMargin
    })

  /** Rolling 7-day distinct users by HLL register merge: the oracle
    * replays the per-day sketch, the trailing register-wise max, and
    * the replicate-and-distinct exact audit.
    */
  private val eventsWauRolling = CatalogEntry(
    "events_wau_rolling",
    (s, dir) => {
      val raw = QuerySupport.table(s, dir, "events")
      val ev = raw
        .select(col("user_id"), QuerySupport.tsMicros(raw).as("t_us"))
        .select(col("user_id"),
          graft.enrich.TimeSeriesOps.floorDivCol("t_us", 86400000000L)
            .as("day"))
      TextAnalysis.hllDistinctRolling(ev,
          groupCol = "day", valueCol = "user_id", windowSize = 7)
        .orderBy("group")
    },
    Some {
      val d = "(strpos('0123456789abcdef', substr(st, 1, 1)) - 1)"
      val hv = hexDecode4("h", posFn = "strpos", substrFn = "substr")
      s"""WITH t AS (SELECT epoch_us(ts) // 86400000000 AS grp,
         |        CAST(user_id AS VARCHAR) AS token FROM events),
         |hh AS (SELECT grp, md5(token) AS h FROM t),
         |sx AS (SELECT grp, ($hv) % 64 AS b, ltrim(substr(h, 5, 28), '0') AS st FROM hh),
         |rr AS (SELECT grp, b, CASE WHEN st = '' THEN 30
         |         ELSE least(30, (28 - length(st)) * 4 +
         |           (CASE WHEN $d >= 8 THEN 0 WHEN $d >= 4 THEN 1
         |                 WHEN $d >= 2 THEN 2 ELSE 3 END) + 1) END AS rho
         |       FROM sx),
         |bk AS (SELECT grp, b, max(rho) AS mr FROM rr GROUP BY grp, b),
         |dy AS (SELECT DISTINCT grp AS d FROM t),
         |bk7 AS (SELECT dy.d AS grp, b, max(mr) AS mr FROM bk
         |        JOIN dy ON bk.grp BETWEEN dy.d - 6 AND dy.d GROUP BY dy.d, b),
         |es AS (SELECT grp, CAST(count(*) AS BIGINT) AS nb,
         |         CAST(coalesce(sum(1::BIGINT << (30 - mr)), 0) AS BIGINT) AS zp
         |       FROM bk7 GROUP BY grp),
         |ud AS (SELECT DISTINCT grp, token FROM t),
         |ex AS (SELECT dy.d AS grp, CAST(count(DISTINCT token) AS BIGINT)
         |         AS exact_distinct
         |       FROM ud JOIN dy ON ud.grp BETWEEN dy.d - 6 AND dy.d
         |       GROUP BY dy.d),
         |zz AS (SELECT grp, nb AS n_buckets_seen,
         |         zp + (64 - nb) * (1::BIGINT << 30) AS z_scaled FROM es),
         |ee AS (SELECT grp, n_buckets_seen, z_scaled,
         |         (1890844672::BIGINT * (1::BIGINT << 30)) // (650790 * z_scaled)
         |           AS est_distinct
         |       FROM zz)
         |SELECT ee.grp AS "group", n_buckets_seen, z_scaled, est_distinct,
         |  exact_distinct,
         |  abs(est_distinct - exact_distinct) * 1000000
         |    // greatest(exact_distinct, 1) AS abs_err_micro
         |FROM ee JOIN ex USING (grp) ORDER BY "group"""".stripMargin
    })

  /** Poisson-bootstrap replicate means of per-doc token count: B
    * replicates in one scan; the oracle replays every md5 draw,
    * threshold count, and weighted sum from the shared constants.
    */
  private val textBootstrapMeans = CatalogEntry(
    "text_bootstrap_means",
    (s, dir) => TextAnalysis.bootstrapMeans(
        QuerySupport.table(s, dir, "documents")
          .withColumn("n_tokens", size(split(col("text"), " ")).cast("long")))
      .orderBy("rep"),
    Some {
      val reps = bootstrapReps
      val wSel = (1 to reps).map { b =>
        val md5s = s"md5('boot$b:' || CAST(doc_id AS VARCHAR))"
        val hi = hexDecode4(s"substr($md5s, 1, 4)", posFn = "strpos", substrFn = "substr")
        val lo = hexDecode4(s"substr($md5s, 5, 4)", posFn = "strpos", substrFn = "substr")
        val u = s"((($hi) * 65536 + ($lo)) * 1000000) // 4294967296"
        val w = poissonCumMicro
          .map(t => s"(CASE WHEN ($u) >= $t THEN 1 ELSE 0 END)")
          .mkString(" + ")
        s"($w) AS w$b"
      }.mkString(", ")
      val aggSel = (1 to reps).map(b =>
        s"CAST(sum(w$b) AS BIGINT) AS sw$b, " +
          s"CAST(sum(w$b * x) AS BIGINT) AS sx$b").mkString(", ")
      val unions = (0 to reps).map(b =>
        s"SELECT $b AS rep, sw$b AS sum_w, sx$b AS sum_wx FROM a")
        .mkString(" UNION ALL ")
      s"""WITH d AS (SELECT doc_id,
         |        CAST(len(string_split(text, ' ')) AS BIGINT) AS x
         |      FROM documents),
         |w AS (SELECT doc_id, x, $wSel FROM d),
         |a AS (SELECT CAST(count(*) AS BIGINT) AS sw0,
         |        CAST(sum(x) AS BIGINT) AS sx0, $aggSel FROM w),
         |u AS ($unions)
         |SELECT CAST(rep AS BIGINT) AS rep, sum_w, sum_wx,
         |  sum_wx * 1000000 // greatest(sum_w, 1) AS mean_micro
         |FROM u ORDER BY rep""".stripMargin
    })

  /** Per-source Poisson-bootstrap replicate means: same shared draws
    * as the corpus-wide pass, grouped — one scan, 2B+2 sums per
    * source.
    */
  private val textBootstrapBySource = CatalogEntry(
    "text_bootstrap_by_source",
    (s, dir) => TextAnalysis.bootstrapMeansByGroup(
        QuerySupport.table(s, dir, "documents")
          .withColumn("n_tokens", size(split(col("text"), " ")).cast("long")),
        groupCol = "source")
      .orderBy("group", "rep"),
    Some {
      val reps = bootstrapReps
      val wSel = (1 to reps).map { b =>
        val md5s = s"md5('boot$b:' || CAST(doc_id AS VARCHAR))"
        val hi = hexDecode4(s"substr($md5s, 1, 4)", posFn = "strpos", substrFn = "substr")
        val lo = hexDecode4(s"substr($md5s, 5, 4)", posFn = "strpos", substrFn = "substr")
        val u = s"((($hi) * 65536 + ($lo)) * 1000000) // 4294967296"
        val w = poissonCumMicro
          .map(t => s"(CASE WHEN ($u) >= $t THEN 1 ELSE 0 END)")
          .mkString(" + ")
        s"($w) AS w$b"
      }.mkString(", ")
      val aggSel = (1 to reps).map(b =>
        s"CAST(sum(w$b) AS BIGINT) AS sw$b, " +
          s"CAST(sum(w$b * x) AS BIGINT) AS sx$b").mkString(", ")
      val unions = (0 to reps).map(b =>
        s"SELECT grp, $b AS rep, sw$b AS sum_w, sx$b AS sum_wx FROM a")
        .mkString(" UNION ALL ")
      s"""WITH d AS (SELECT doc_id, source AS grp,
         |        CAST(len(string_split(text, ' ')) AS BIGINT) AS x
         |      FROM documents),
         |w AS (SELECT doc_id, grp, x, $wSel FROM d),
         |a AS (SELECT grp, CAST(count(*) AS BIGINT) AS sw0,
         |        CAST(sum(x) AS BIGINT) AS sx0, $aggSel FROM w GROUP BY grp),
         |u AS ($unions)
         |SELECT grp AS "group", CAST(rep AS BIGINT) AS rep, sum_w, sum_wx,
         |  sum_wx * 1000000 // greatest(sum_w, 1) AS mean_micro
         |FROM u ORDER BY "group", rep""".stripMargin
    })

  /** Two-pass Misra-Gries exact heavy hitters: the oracle is the plain
    * exact top-k — the operator's whole claim is that its bounded-
    * memory path returns exactly this, or fails loudly.
    */
  private val textHeavyHitters = CatalogEntry(
    "text_heavy_hitters",
    (s, dir) => TextAnalysis.heavyHittersExact(
        QuerySupport.table(s, dir, "documents"), k = 50)
      .orderBy("rank"),
    Some("""WITH w AS (SELECT string_split(text, ' ') AS w FROM documents),
           |t AS (SELECT unnest(w) AS token FROM w),
           |c AS (SELECT token, count(*) AS n_occurrences FROM t GROUP BY token),
           |r AS (SELECT *, row_number() OVER (ORDER BY n_occurrences DESC, token)
           |        AS rank FROM c)
           |SELECT token, CAST(n_occurrences AS BIGINT) AS n_occurrences,
           |       CAST(rank AS BIGINT) AS rank
           |FROM r WHERE rank <= 50 ORDER BY rank""".stripMargin))

  /** Pairwise Jensen-Shannon divergence between per-source unigram
    * distributions: only shared-vocabulary terms evaluate (the
    * p·ln(1+q/p) identity), micro-nat quantized exact BIGINT sums,
    * disjoint pairs report exactly ln2 off the broadcast pair spine.
    */
  private val textSourceJsDivergence = CatalogEntry(
    "text_source_js_divergence",
    (s, dir) => TextAnalysis.sourceJsDivergence(
        QuerySupport.table(s, dir, "documents"))
      .select(col("src_a"), col("src_b"), col("n_tokens_a"),
        col("n_tokens_b"), col("n_shared_terms"), col("jsd_micro_nats"),
        r6(col("jsd_nats")).as("jsd_nats"))
      .orderBy("src_a", "src_b"),
    Some(s"""WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS term
            |      FROM documents),
            |ts AS (SELECT source, term, count(*) AS cnt FROM t GROUP BY 1, 2),
            |tot AS (SELECT source, sum(cnt) AS n_tok FROM ts GROUP BY source),
            |p AS (SELECT a.source AS src_a, b.source AS src_b,
            |        a.cnt AS ca, b.cnt AS cb, ta.n_tok AS na, tb.n_tok AS nb
            |      FROM ts a JOIN ts b ON a.term = b.term AND a.source < b.source
            |      JOIN tot ta ON ta.source = a.source
            |      JOIN tot tb ON tb.source = b.source),
            |q AS (SELECT src_a, src_b,
            |        CAST(floor(ca * ln(1.0 + (CAST(cb AS DOUBLE) * CAST(na AS DOUBLE))
            |          / (CAST(ca AS DOUBLE) * CAST(nb AS DOUBLE)))
            |          * 1000000.0 + 0.5) AS BIGINT) AS ta,
            |        CAST(floor(cb * ln(1.0 + (CAST(ca AS DOUBLE) * CAST(nb AS DOUBLE))
            |          / (CAST(cb AS DOUBLE) * CAST(na AS DOUBLE)))
            |          * 1000000.0 + 0.5) AS BIGINT) AS tb
            |      FROM p),
            |g AS (SELECT src_a, src_b, count(*) AS n_shared,
            |        sum(ta) AS sa, sum(tb) AS sb
            |      FROM q GROUP BY 1, 2),
            |sp AS (SELECT a.source AS src_a, b.source AS src_b,
            |         a.n_tok AS n_tokens_a, b.n_tok AS n_tokens_b
            |       FROM tot a JOIN tot b ON a.source < b.source),
            |f AS (SELECT sp.src_a, sp.src_b,
            |        CAST(sp.n_tokens_a AS BIGINT) AS n_tokens_a,
            |        CAST(sp.n_tokens_b AS BIGINT) AS n_tokens_b,
            |        CAST(coalesce(g.n_shared, 0) AS BIGINT) AS n_shared_terms,
            |        CAST(693147 - coalesce(g.sa, 0) // (2 * sp.n_tokens_a)
            |          - coalesce(g.sb, 0) // (2 * sp.n_tokens_b) AS BIGINT)
            |          AS jsd_micro_nats
            |      FROM sp LEFT JOIN g ON g.src_a = sp.src_a AND g.src_b = sp.src_b)
            |SELECT src_a, src_b, n_tokens_a, n_tokens_b, n_shared_terms,
            |  jsd_micro_nats,
            |  ${r6s("CAST(jsd_micro_nats AS DOUBLE) / 1000000.0")} AS jsd_nats
            |FROM f ORDER BY src_a, src_b""".stripMargin))

  /** Edit-distance verification of the LSH candidate pairs on the
    * ASCII-projected 200-char prefix — DELETION of non-ASCII (not
    * replacement) is what makes DuckDB's byte-Levenshtein equal
    * Spark's codepoint-Levenshtein (scaladoc: Dedup.editVerify).
    */
  private def editVerifyOracleSql(pred: String): String =
    s"""WITH $minhashCtes,
       |pr AS (SELECT doc_id,
       |         substr(regexp_replace(text, '[^ -~]', '', 'g'), 1, 200) AS p
       |       FROM documents),
       |j AS (SELECT c.doc_a, c.doc_b, a.p AS pa, b.p AS pb
       |      FROM cand c JOIN pr a ON a.doc_id = c.doc_a
       |      JOIN pr b ON b.doc_id = c.doc_b$pred),
       |d AS (SELECT doc_a, doc_b, CAST(length(pa) AS BIGINT) AS len_a,
       |        CAST(length(pb) AS BIGINT) AS len_b,
       |        CAST(CASE WHEN levenshtein(pa, pb) > 40 THEN -1
       |          ELSE levenshtein(pa, pb) END AS BIGINT) AS edit_dist
       |      FROM j),
       |sm AS (SELECT *, CASE WHEN edit_dist < 0 THEN -1
       |         ELSE 1000000 - edit_dist * 1000000
       |           // greatest(greatest(len_a, len_b), 1) END AS sim_ppm
       |       FROM d)
       |SELECT doc_a, doc_b, len_a, len_b, edit_dist,
       |  CAST(sim_ppm AS BIGINT) AS sim_ppm,
       |  sim_ppm >= 800000 AS is_match
       |FROM sm ORDER BY doc_a, doc_b""".stripMargin

  /** Edit verify's production path at scale: the audit family's
    * shared 25% digest pair cut ahead of the banded DP.
    */
  private val dedupEditVerifySampled = CatalogEntry(
    "dedup_edit_verify_sampled",
    (s, dir) => Dedup.editVerify(
        QuerySupport.table(s, dir, "documents").select("doc_id", "text"),
        samplePpm = 250000L)
      .orderBy("doc_a", "doc_b"),
    Some(editVerifyOracleSql(auditSamplePred)))

  private val dedupEditVerify = CatalogEntry(
    "dedup_edit_verify",
    (s, dir) => Dedup.editVerify(
        QuerySupport.table(s, dir, "documents").select("doc_id", "text"))
      .orderBy("doc_a", "doc_b"),
    Some(editVerifyOracleSql("")))

  /** t-closeness over (source, length-bucket) with `lang` sensitive —
    * the third rung after k-anonymity and l-diversity: all-integer
    * total-variation distance per group, absent sensitive values
    * folded in analytically (scaladoc: Curation.tCloseness).
    */
  private val privacyTCloseness = CatalogEntry(
    "privacy_t_closeness",
    (s, dir) => Curation.tCloseness(
        QuerySupport.table(s, dir, "documents")
          .select(col("lang"), col("source"),
            expr("n_chars div 100").as("len_bucket")),
        Seq("source", "len_bucket"), sensitiveCol = "lang", tPpm = 300000L)
      .orderBy("source", "len_bucket"),
    Some("""WITH c AS (SELECT source, n_chars // 100 AS len_bucket, lang,
           |        count(*) AS c
           |      FROM documents GROUP BY 1, 2, 3),
           |g AS (SELECT lang, sum(c) AS cv FROM c GROUP BY lang),
           |gr AS (SELECT source, len_bucket, sum(c) AS ng FROM c GROUP BY 1, 2),
           |t AS (SELECT sum(c) AS n FROM c),
           |q AS (SELECT c.source, c.len_bucket, c.c, g.cv, gr.ng, t.n
           |      FROM c JOIN g USING (lang)
           |      JOIN gr USING (source, len_bucket) CROSS JOIN t),
           |a AS (SELECT source, len_bucket, max(ng) AS n_rows,
           |        count(*) AS n_sensitive_values, max(n) AS n,
           |        sum(abs(c * n - cv * ng)) AS ts, sum(cv) AS present
           |      FROM q GROUP BY 1, 2),
           |v AS (SELECT source, len_bucket, n_rows, n_sensitive_values,
           |        (ts + n_rows * (n - present)) * 1000000
           |          // (2 * n_rows * n) AS tvd_ppm
           |      FROM a)
           |SELECT source, len_bucket, CAST(n_rows AS BIGINT) AS n_rows,
           |  CAST(n_sensitive_values AS BIGINT) AS n_sensitive_values,
           |  CAST(tvd_ppm AS BIGINT) AS tvd_ppm, tvd_ppm > 300000 AS at_risk
           |FROM v ORDER BY source, len_bucket""".stripMargin))

  /** Recall@k in the int8-dequantized space vs float truth — scores
    * the exact artifact emb_quantize_int8 ships (codes round-trip
    * through its q_csv on both engines).
    */
  private val annInt8Recall = CatalogEntry(
    "ann_int8_recall",
    (s, dir) => AnnSearch.int8Recall(QuerySupport.table(s, dir, "embeddings"),
        col("vec_id") < annQueryIds, ivfK)
      .select(col("query_id"), col("n_hits"), r6(col("recall")).as("recall"))
      .orderBy("query_id"),
    Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            |n AS MATERIALIZED (SELECT vec_id, v,
            |      sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
            |bp AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            |        list_sum(list_transform(range(1, len(q.v) + 1),
            |          i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm) AS cos
            |      FROM n q JOIN n c ON c.vec_id <> q.vec_id
            |      WHERE q.vec_id < $annQueryIds),
            |bt AS MATERIALIZED (SELECT query_id, neighbor_id FROM (
            |        SELECT query_id, neighbor_id, row_number() OVER (
            |          PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
            |        FROM bp) WHERE rnk <= $ivfK),
            |sc AS (SELECT vec_id, v,
            |        list_max(list_transform(v, x -> abs(x))) AS scale FROM e),
            |dq AS (SELECT vec_id, list_transform(v, x ->
            |        CAST(CAST(CASE WHEN scale = 0.0 THEN 0.0
            |          ELSE floor(x * 127.0 / scale + 0.5) END AS BIGINT) AS DOUBLE)
            |        * scale / 127.0) AS v
            |      FROM sc),
            |n8 AS MATERIALIZED (SELECT vec_id, v,
            |      sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM dq),
            |ap AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            |        list_sum(list_transform(range(1, len(q.v) + 1),
            |          i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm) AS cos
            |      FROM n8 q JOIN n8 c ON c.vec_id <> q.vec_id
            |      WHERE q.vec_id < $annQueryIds),
            |at AS (SELECT query_id, neighbor_id FROM (
            |        SELECT query_id, neighbor_id, row_number() OVER (
            |          PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
            |        FROM ap) WHERE rnk <= $ivfK),
            |h AS (SELECT bt.query_id, count(*) AS h
            |      FROM bt JOIN at ON at.query_id = bt.query_id
            |        AND at.neighbor_id = bt.neighbor_id
            |      GROUP BY 1),
            |qs AS (SELECT DISTINCT query_id FROM bt)
            |SELECT qs.query_id, CAST(coalesce(h.h, 0) AS BIGINT) AS n_hits,
            |  ${r6s(s"coalesce(h.h, 0) / $ivfK.0")} AS recall
            |FROM qs LEFT JOIN h USING (query_id) ORDER BY query_id""".stripMargin))

  /** IVF recall@k curve for k in {1,3,5}: one shared brute truth and
    * one shared IVF ranking at kmax, each k cuts the same two rank
    * columns — exact integer micro recall per depth.
    */
  private val annRecallCurve = CatalogEntry(
    "ann_recall_curve",
    (s, dir) => AnnSearch.ivfRecallCurve(
        QuerySupport.table(s, dir, "embeddings"),
        col("vec_id") < annQueryIds, Seq(1, 3, 5))
      .orderBy("k"),
    Some {
      val kmax = 5
      val dots = (0 until ivfCentroids).map { k =>
        val lit = latticeTerms(0L, k).mkString(", ")
        s"list_sum(list_transform(range(1, len(v) + 1), i -> v[i] * ([$lit])[i]))"
      }.mkString(",\n  ")
      val masked = s"list_transform(range(1, ${ivfCentroids + 1}), i -> CASE WHEN i = b1 THEN -1e18 ELSE dots[i] END)"
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |n AS MATERIALIZED (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
         |bp AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |        list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm) AS cos
         |      FROM n q JOIN n c ON c.vec_id <> q.vec_id WHERE q.vec_id < $annQueryIds),
         |br AS MATERIALIZED (SELECT query_id, neighbor_id,
         |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
         |      FROM bp QUALIFY rnk <= $kmax),
         |d AS (SELECT vec_id, v, nrm, [$dots] AS dots FROM n),
         |a AS MATERIALIZED (SELECT vec_id, v, nrm, dots, list_position(dots, list_aggregate(dots, 'max')) AS b1 FROM d),
         |q AS (SELECT vec_id, v, nrm, b1,
         |        list_position($masked, list_aggregate($masked, 'max')) AS b2
         |      FROM a WHERE vec_id < $annQueryIds),
         |pr AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, unnest([b1, b2]) AS bucket FROM q),
         |cand AS (SELECT p.query_id, c.vec_id AS neighbor_id,
         |          list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * c.v[i])) / (qn * c.nrm) AS cos
         |         FROM pr p JOIN a c ON c.b1 = p.bucket AND c.vec_id <> p.query_id),
         |ir AS MATERIALIZED (SELECT query_id, neighbor_id,
         |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
         |      FROM cand QUALIFY rnk <= $kmax),
         |ks AS (SELECT unnest([1, 3, 5]) AS k),
         |nq AS (SELECT count(DISTINCT query_id) AS nq FROM br),
         |hits AS (SELECT ks.k, count(*) AS sum_hits
         |         FROM br JOIN ir USING (query_id, neighbor_id) CROSS JOIN ks
         |         WHERE br.rnk <= ks.k AND ir.rnk <= ks.k
         |         GROUP BY ks.k)
         |SELECT CAST(ks.k AS BIGINT) AS k, CAST(nq.nq AS BIGINT) AS n_queries,
         |  CAST(coalesce(hits.sum_hits, 0) AS BIGINT) AS sum_hits,
         |  CAST(coalesce(hits.sum_hits, 0) * 1000000
         |    // greatest(nq.nq * ks.k, 1) AS BIGINT) AS recall_micro
         |FROM ks LEFT JOIN hits USING (k) CROSS JOIN nq ORDER BY k""".stripMargin
    })

  /** Centroid-grain silhouette of the learned k-means clustering:
    * ordered-fold Euclidean distances against the exact (sum, count)
    * centroid state, per-vector score quantized once to micro, exact
    * per-bucket integer means (scaladoc: AnnSearch.kmeansSilhouette).
    */
  private val annKmeansSilhouette = CatalogEntry(
    "ann_kmeans_silhouette",
    (s, dir) => AnnSearch.kmeansSilhouette(
        QuerySupport.table(s, dir, "embeddings"))
      .orderBy("bucket"),
    Some(s"""WITH $kmeansCtes,
            |a2 AS (SELECT DISTINCT ON (vec_id) vec_id, CAST(j + 1 AS INT) AS bucket
            |  FROM d2 ORDER BY vec_id, score DESC, j),
            |cl AS (SELECT j, list(s ORDER BY i) AS sl, max(c) AS c
            |  FROM s1f GROUP BY j),
            |ds AS (SELECT v.vec_id, CAST(cl.j + 1 AS INT) AS jb,
            |    sqrt(list_sum(list_transform(range(1, $embDim + 1), i ->
            |      (CAST(v.vi[i] AS DOUBLE) - CAST(cl.sl[i] AS DOUBLE) / CAST(cl.c AS DOUBLE))
            |      * (CAST(v.vi[i] AS DOUBLE) - CAST(cl.sl[i] AS DOUBLE) / CAST(cl.c AS DOUBLE))))) AS dist
            |  FROM n v CROSS JOIN cl),
            |ab AS (SELECT ds.vec_id, a2.bucket,
            |    max(CASE WHEN ds.jb = a2.bucket THEN dist END) AS a,
            |    min(CASE WHEN ds.jb <> a2.bucket THEN dist END) AS b
            |  FROM ds JOIN a2 USING (vec_id) GROUP BY 1, 2),
            |sil AS (SELECT bucket, CASE WHEN greatest(a, b) <= 0.0 THEN 0
            |    ELSE CAST(floor((b - a) / greatest(a, b) * 1000000.0 + 0.5) AS BIGINT)
            |    END AS sil
            |  FROM ab)
            |SELECT bucket, CAST(count(*) AS BIGINT) AS n_vecs,
            |  CAST(sum(sil) // count(*) AS BIGINT) AS mean_sil_micro
            |FROM sil GROUP BY bucket ORDER BY bucket""".stripMargin))

  /** Lognormal fit of document lengths: milli-nat log moments (exact
    * BIGINT), count-of-counts median rank pick, predicted-vs-observed
    * median — the third corpus-shape law next to Zipf and Heaps.
    */
  private val textLengthLognormal = CatalogEntry(
    "text_length_lognormal",
    (s, dir) => TextAnalysis.lengthLognormalFit(
      QuerySupport.table(s, dir, "documents")),
    Some("""WITH l AS (SELECT len(string_split(text, ' ')) AS t FROM documents
           |      WHERE len(string_split(text, ' ')) >= 1),
           |h AS (SELECT t, count(*) AS m,
           |        CAST(floor(ln(CAST(t AS DOUBLE)) * 1000.0 + 0.5) AS BIGINT) AS lq
           |      FROM l GROUP BY t),
           |md AS (SELECT min(t) AS median_obs FROM (
           |        SELECT t, sum(m) OVER (ORDER BY t
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           |          sum(m) OVER () AS n
           |        FROM h) WHERE cum * 2 >= n),
           |mo AS (SELECT sum(m) AS n_docs, sum(lq * m) AS sl,
           |         sum(lq * lq * m) AS sl2 FROM h),
           |f AS (SELECT n_docs, sl // n_docs AS mu_milli,
           |        CAST(floor(sqrt((CAST(n_docs AS DOUBLE) * CAST(sl2 AS DOUBLE)
           |          - CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE))
           |          / (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE))) + 0.5)
           |          AS BIGINT) AS sigma_milli
           |      FROM mo)
           |SELECT CAST(n_docs AS BIGINT) AS n_docs,
           |  CAST(mu_milli AS BIGINT) AS mu_milli, sigma_milli,
           |  CAST(median_obs AS BIGINT) AS median_obs,
           |  CAST(floor(exp(CAST(mu_milli AS DOUBLE) / 1000.0) + 0.5) AS BIGINT)
           |    AS median_pred
           |FROM f, md""".stripMargin))

  /** Per-user activity Gini from the count-of-counts histogram: the
    * sourceGini closed form per equal-activity run — the unbounded
    * population is never sorted.
    */
  private val eventsActivityGini = CatalogEntry(
    "events_activity_gini",
    (s, dir) => TextAnalysis.activityGini(
      QuerySupport.table(s, dir, "events"), "user_id"),
    Some("""WITH per AS (SELECT user_id, count(*) AS c FROM events GROUP BY 1),
           |coc AS (SELECT c, count(*) AS m FROM per GROUP BY c),
           |cum AS (SELECT c, m, coalesce(sum(m) OVER (ORDER BY c
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
           |        FROM coc),
           |a AS (SELECT sum(m) AS n_users, sum(c * m) AS total_events,
           |        sum(c * m * (2 * s + m)) AS wsum FROM cum),
           |g AS (SELECT n_users, total_events,
           |        wsum - n_users * total_events AS num,
           |        n_users * total_events AS den FROM a),
           |h AS (SELECT *, num * 1000 // den AS mm FROM g)
           |SELECT CAST(n_users AS BIGINT) AS n_users,
           |  CAST(total_events AS BIGINT) AS total_events,
           |  CAST(mm * 1000 + (num * 1000 - mm * den) * 1000 // den AS BIGINT)
           |    AS gini_micro
           |FROM h""".stripMargin))

  /** Lorenz-curve decile table: activityGini's count-of-counts plan
    * unpacked into 10 cumulative-share points — the population is
    * never sorted, decile boundaries land whole equal-activity runs
    * under the ≥ rule, every column exact BIGINT.
    */
  private val eventsLorenzDeciles = CatalogEntry(
    "events_lorenz_deciles",
    (s, dir) => TextAnalysis.lorenzDeciles(
      QuerySupport.table(s, dir, "events"), "user_id"),
    Some("""WITH per AS (SELECT user_id, count(*) AS c FROM events GROUP BY 1),
           |coc AS (SELECT c, count(*) AS m FROM per GROUP BY c),
           |cum AS (SELECT c, m,
           |          sum(m) OVER (ORDER BY c
           |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS su,
           |          sum(c * m) OVER (ORDER BY c
           |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS se
           |        FROM coc),
           |tot AS (SELECT max(su) AS nu, max(se) AS ne FROM cum),
           |dec AS (SELECT unnest(range(1, 11)) AS decile),
           |hit AS (SELECT decile, min(su) AS cum_users FROM cum, tot, dec
           |        WHERE su * 10 >= nu * decile GROUP BY decile),
           |pick AS (SELECT decile, cum_users,
           |          (SELECT min(se) FROM cum WHERE cum.su = hit.cum_users)
           |            AS cum_events
           |        FROM hit)
           |SELECT CAST(decile AS BIGINT) AS decile,
           |  CAST(cum_users AS BIGINT) AS cum_users,
           |  CAST(cum_events AS BIGINT) AS cum_events,
           |  CAST(cum_events * 1000000 // tot.ne AS BIGINT) AS cum_events_ppm
           |FROM pick, tot ORDER BY decile""".stripMargin))

  /** Quality-signal redundancy audit: Spearman rank correlation
    * between the heuristic quality score and unigram surprisal —
    * the number a curation stack reads before stacking two filters
    * (a |ρ| near 1 says the second gate re-litigates the first; near
    * 0 says it measures something new). Both signals are already
    * exact integers at doc grain (quality_micro, surprisal micro-nat
    * totals), so the doubled-midrank Spearman plan
    * ([[graft.clean.Profiler.spearmanMatrix]]) applies verbatim:
    * value-grain rank windows, one rank-attach join per signal, one
    * exact moment aggregate, fixed IEEE quotient.
    */
  private val textQualityRankCorr = CatalogEntry(
    "text_quality_rank_corr",
    (s, dir) => {
      val d = QuerySupport.table(s, dir, "documents")
      val q = TextAnalysis.qualityScore(d)
        .select(col("doc_id"),
          expr("cast(floor(quality * 1000000 + 0.5) as bigint)")
            .as("quality_micro"))
      val su = TextAnalysis.unigramSurprisal(d)
        .select(col("doc_id"), col("surprisal_unats"))
      graft.clean.Profiler.spearmanMatrix(q.join(su, "doc_id"),
          Seq(("quality_micro", 1L), ("surprisal_unats", 1L)))
        .select(col("col_a"), col("col_b"), col("n_rows"),
          r6(col("rho")).as("rho"))
    },
    Some(s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
            |mq AS (SELECT doc_id, len(w) AS n_tokens,
            |        len(list_distinct(w)) AS n_distinct,
            |        len(list_filter(w, t -> t IN ${inList(LlmDataParams.stopwords)})) AS n_stop
            |      FROM w),
            |qv AS (SELECT doc_id,
            |        CAST(floor((0.4 * (n_distinct / n_tokens)
            |          + 0.3 * (1.0 - n_stop / n_tokens)
            |          + 0.3 * least(1.0, n_tokens / 50.0)) * 1000000.0 + 0.5)
            |          AS BIGINT) AS qm
            |      FROM mq),
            |$surprisalCtes,
            |j0 AS MATERIALIZED (SELECT qv.qm, a.s AS su
            |      FROM qv JOIN a USING (doc_id)),
            |rc_a AS (SELECT qm AS v, count(*) AS cnt FROM j0 GROUP BY 1),
            |rw_a AS (SELECT v, 2 * coalesce(sum(cnt) OVER (ORDER BY v
            |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            |          + cnt + 1 AS r2 FROM rc_a),
            |rc_b AS (SELECT su AS v, count(*) AS cnt FROM j0 GROUP BY 1),
            |rw_b AS (SELECT v, 2 * coalesce(sum(cnt) OVER (ORDER BY v
            |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            |          + cnt + 1 AS r2 FROM rc_b),
            |j AS (SELECT rw_a.r2 AS r_a, rw_b.r2 AS r_b
            |      FROM j0 JOIN rw_a ON j0.qm = rw_a.v
            |        JOIN rw_b ON j0.su = rw_b.v),
            |m AS (SELECT count(*) AS n, sum(r_a) AS sa, sum(r_b) AS sb,
            |        sum(r_a * r_a) AS paa, sum(r_a * r_b) AS pab,
            |        sum(r_b * r_b) AS pbb FROM j),
            |u AS (SELECT n,
            |        CAST(n AS DOUBLE) * CAST(pab AS DOUBLE)
            |          - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE) AS num,
            |        CAST(n AS DOUBLE) * CAST(paa AS DOUBLE)
            |          - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) AS va,
            |        CAST(n AS DOUBLE) * CAST(pbb AS DOUBLE)
            |          - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) AS vb
            |      FROM m)
            |SELECT 'quality_micro' AS col_a, 'surprisal_unats' AS col_b,
            |  CAST(n AS BIGINT) AS n_rows,
            |  ${r6s("CASE WHEN va <= 0 OR vb <= 0 THEN 0.0 ELSE num / sqrt(va * vb) END")} AS rho
            |FROM u""".stripMargin))

  /** Kish effective-sample-size audit of quality-weighted sampling:
    * exact BIGINT weight moments from one rollup, fixed IEEE
    * quotient — the importance-sampling diagnostic for every
    * weighted sampler in the catalog.
    */
  private val sampleEssAudit = CatalogEntry(
    "sample_ess_audit",
    (s, dir) => {
      val q = TextAnalysis.qualityScore(
          QuerySupport.table(s, dir, "documents"))
        .select(col("doc_id"),
          expr("cast(floor(quality * 1000000 + 0.5) as bigint)")
            .as("quality_micro"))
      Sampling.essAudit(q, "quality_micro")
        .select(col("n_rows"), col("n_pos"), col("sum_w"), col("sum_w2"),
          r6(col("ess")).as("ess"), r6(col("ess_ratio")).as("ess_ratio"))
    },
    Some(s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
            |mq AS (SELECT doc_id, len(w) AS n_tokens,
            |        len(list_distinct(w)) AS n_distinct,
            |        len(list_filter(w, t -> t IN ${inList(LlmDataParams.stopwords)})) AS n_stop
            |      FROM w),
            |qv AS (SELECT doc_id,
            |        CAST(floor((0.4 * (n_distinct / n_tokens)
            |          + 0.3 * (1.0 - n_stop / n_tokens)
            |          + 0.3 * least(1.0, n_tokens / 50.0)) * 1000000.0 + 0.5)
            |          AS BIGINT) AS qm
            |      FROM mq),
            |a AS (SELECT count(*) AS n_rows,
            |        sum(CASE WHEN qm > 0 THEN 1 ELSE 0 END) AS n_pos,
            |        sum(qm) AS sum_w, sum(qm * qm) AS sum_w2 FROM qv),
            |e AS (SELECT *, CASE WHEN sum_w2 <= 0 THEN 0.0 ELSE
            |        CAST(sum_w AS DOUBLE) * CAST(sum_w AS DOUBLE)
            |          / CAST(sum_w2 AS DOUBLE) END AS ess FROM a)
            |SELECT CAST(n_rows AS BIGINT) AS n_rows,
            |  CAST(n_pos AS BIGINT) AS n_pos,
            |  CAST(sum_w AS BIGINT) AS sum_w,
            |  CAST(sum_w2 AS BIGINT) AS sum_w2,
            |  ${r6s("ess")} AS ess,
            |  ${r6s("CASE WHEN n_pos = 0 THEN 0.0 ELSE ess / CAST(n_pos AS DOUBLE) END")} AS ess_ratio
            |FROM e""".stripMargin))

  /** Jaccard threshold sweep over the LSH candidates: one verify pass
    * shared by every threshold, exact integer-ppm Jaccard — the
    * fourth planner axis.
    */
  private val dedupThresholdSweep = CatalogEntry(
    "dedup_threshold_sweep",
    (s, dir) => Dedup.jaccardThresholdSweep(
        QuerySupport.table(s, dir, "documents").select("doc_id", "text"))
      .orderBy("threshold_pct"),
    Some(s"""WITH $minhashCtes,
            |ds AS (SELECT doc_id, list_distinct(sh) AS s FROM sh),
            |jp AS (SELECT len(list_intersect(a.s, b.s)) * 1000000
            |         // greatest(len(a.s) + len(b.s)
            |           - len(list_intersect(a.s, b.s)), 1) AS jppm
            |       FROM cand c JOIN ds a ON a.doc_id = c.doc_a
            |       JOIN ds b ON b.doc_id = c.doc_b),
            |tt AS (SELECT count(*) AS n_candidates FROM jp),
            |sp AS (SELECT unnest([30, 50, 70, 90]) AS threshold_pct),
            |hits AS (SELECT sp.threshold_pct, count(*) AS n_pairs
            |         FROM jp CROSS JOIN sp
            |         WHERE jp.jppm >= sp.threshold_pct * 10000
            |         GROUP BY sp.threshold_pct)
            |SELECT CAST(sp.threshold_pct AS BIGINT) AS threshold_pct,
            |  CAST(tt.n_candidates AS BIGINT) AS n_candidates,
            |  CAST(coalesce(hits.n_pairs, 0) AS BIGINT) AS n_pairs,
            |  CAST(coalesce(hits.n_pairs, 0) * 1000000
            |    // greatest(tt.n_candidates, 1) AS BIGINT) AS share_ppm
            |FROM sp LEFT JOIN hits USING (threshold_pct) CROSS JOIN tt
            |ORDER BY threshold_pct""".stripMargin))

  /** [[dedupThresholdSweep]]'s production path: the audit family's
    * SHARED 25% digest pair cut (same salt as lshParamPlan /
    * edit-verify, so every sampled audit reads one pair subset)
    * before the exact-intersect work — a survivor curve needs the
    * distribution, not every pair.
    */
  private val dedupThresholdSweepSampled = CatalogEntry(
    "dedup_threshold_sweep_sampled",
    (s, dir) => Dedup.jaccardThresholdSweep(
        QuerySupport.table(s, dir, "documents").select("doc_id", "text"),
        samplePpm = 250000L)
      .orderBy("threshold_pct"),
    Some {
      val cut =
        s"WHERE substr(md5('lshplan:' || CAST(c.doc_a AS VARCHAR) || " +
          s"':' || CAST(c.doc_b AS VARCHAR)), 1, 8) < " +
          s"'${Sampling.hexThreshold(0.25)}'"
      s"""WITH $minhashCtes,
         |ds AS (SELECT doc_id, list_distinct(sh) AS s FROM sh),
         |jp AS (SELECT len(list_intersect(a.s, b.s)) * 1000000
         |         // greatest(len(a.s) + len(b.s)
         |           - len(list_intersect(a.s, b.s)), 1) AS jppm
         |       FROM cand c JOIN ds a ON a.doc_id = c.doc_a
         |       JOIN ds b ON b.doc_id = c.doc_b
         |       $cut),
         |tt AS (SELECT count(*) AS n_candidates FROM jp),
         |sp AS (SELECT unnest([30, 50, 70, 90]) AS threshold_pct),
         |hits AS (SELECT sp.threshold_pct, count(*) AS n_pairs
         |         FROM jp CROSS JOIN sp
         |         WHERE jp.jppm >= sp.threshold_pct * 10000
         |         GROUP BY sp.threshold_pct)
         |SELECT CAST(sp.threshold_pct AS BIGINT) AS threshold_pct,
         |  CAST(tt.n_candidates AS BIGINT) AS n_candidates,
         |  CAST(coalesce(hits.n_pairs, 0) AS BIGINT) AS n_pairs,
         |  CAST(coalesce(hits.n_pairs, 0) * 1000000
         |    // greatest(tt.n_candidates, 1) AS BIGINT) AS share_ppm
         |FROM sp LEFT JOIN hits USING (threshold_pct) CROSS JOIN tt
         |ORDER BY threshold_pct""".stripMargin
    })

  /** Empirical Heaps curve at id-range checkpoints: one vocabulary
    * aggregate carrying min(doc_id) per term answers every
    * checkpoint via conditional membership — corpus scanned once.
    */
  private val textVocabGrowth = CatalogEntry(
    "text_vocab_growth",
    (s, dir) => TextAnalysis.vocabGrowthCurve(
        QuerySupport.table(s, dir, "documents"))
      .orderBy("pct"),
    Some("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
           |      FROM documents),
           |v AS (SELECT term, min(doc_id) AS first FROM t GROUP BY term),
           |sp AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM documents),
           |cuts AS (SELECT p AS pct, lo + (hi - lo) * p // 100 AS id_cut
           |      FROM sp, (SELECT unnest([25, 50, 75, 100]) AS p) ps),
           |pd AS (SELECT doc_id, len(string_split(text, ' ')) AS t
           |      FROM documents),
           |ds AS (SELECT pct, id_cut, count(*) AS n_docs, sum(t) AS n_tokens
           |      FROM cuts JOIN pd ON pd.doc_id <= cuts.id_cut GROUP BY 1, 2),
           |vs AS (SELECT pct, count(*) AS vocab_size
           |      FROM cuts JOIN v ON v.first <= cuts.id_cut GROUP BY 1)
           |SELECT CAST(ds.pct AS BIGINT) AS pct,
           |  CAST(ds.id_cut AS BIGINT) AS id_cut,
           |  CAST(ds.n_docs AS BIGINT) AS n_docs,
           |  CAST(ds.n_tokens AS BIGINT) AS n_tokens,
           |  CAST(vs.vocab_size AS BIGINT) AS vocab_size
           |FROM ds JOIN vs USING (pct) ORDER BY pct""".stripMargin))

  /** Dirichlet-smoothed query-likelihood ranking: per-(doc, term)
    * log-probabilities quantized once to micro-nats, exact BIGINT
    * per-doc sums, candidates = docs hitting >= 1 query term.
    */
  private val retrievalQueryLikelihood = CatalogEntry(
    "retrieval_query_likelihood",
    (s, dir) => TextAnalysis.queryLikelihoodTopK(
        QuerySupport.table(s, dir, "documents"),
        Seq("spark", "merge", "vector"), k = 10, mu = 2000)
      .orderBy("rank"),
    Some("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
           |st AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY doc_id),
           |corpus AS (SELECT CAST(sum(dl) AS BIGINT) AS tot FROM st),
           |q AS (SELECT unnest(['spark', 'merge', 'vector']) AS term),
           |cf AS (SELECT term, count(*) AS cf FROM t JOIN q USING (term)
           |       GROUP BY term HAVING count(*) > 0),
           |tf AS (SELECT doc_id, term, count(*) AS tf FROM t JOIN q USING (term)
           |       GROUP BY doc_id, term),
           |cand AS (SELECT DISTINCT doc_id FROM tf),
           |fr AS (SELECT cand.doc_id, cf.term, cf.cf, coalesce(tf.tf, 0) AS tf
           |       FROM cand CROSS JOIN cf
           |         LEFT JOIN tf ON tf.doc_id = cand.doc_id AND tf.term = cf.term),
           |sc AS (SELECT fr.doc_id,
           |         CAST(floor(ln(
           |           (CAST(fr.tf AS DOUBLE)
           |             + 2000.0 * CAST(fr.cf AS DOUBLE) / CAST(corpus.tot AS DOUBLE))
           |           / (CAST(st.dl AS DOUBLE) + 2000.0))
           |           * 1000000.0 + 0.5) AS BIGINT) AS c,
           |         CASE WHEN fr.tf > 0 THEN 1 ELSE 0 END AS hit
           |       FROM fr JOIN st USING (doc_id) CROSS JOIN corpus),
           |agg AS (SELECT doc_id, CAST(sum(hit) AS BIGINT) AS n_hit_terms,
           |          CAST(sum(c) AS BIGINT) AS ql_micro
           |        FROM sc GROUP BY doc_id)
           |SELECT CAST(row_number() OVER (ORDER BY ql_micro DESC, doc_id) AS INT) AS rank,
           |  doc_id, n_hit_terms, ql_micro
           |FROM agg ORDER BY ql_micro DESC, doc_id LIMIT 10""".stripMargin))

  /** Per-source lexical-diversity profile: exact token/type/hapax/dis
    * counts off one (source, term) aggregate, ppm floor-divs.
    */
  private val textLexicalStats = CatalogEntry(
    "text_lexical_stats",
    (s, dir) => TextAnalysis.sourceLexicalStats(
        QuerySupport.table(s, dir, "documents"))
      .orderBy("source"),
    Some("""WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS term FROM documents),
           |c AS (SELECT source, term, count(*) AS c FROM t GROUP BY source, term),
           |s AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
           |        CAST(count(*) AS BIGINT) AS n_types,
           |        CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           |        CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dis
           |      FROM c GROUP BY source)
           |SELECT source, n_tokens, n_types, n_hapax, n_dis,
           |  CAST(n_types * 1000000 // greatest(n_tokens, 1) AS BIGINT) AS ttr_ppm,
           |  CAST(n_hapax * 1000000 // greatest(n_types, 1) AS BIGINT) AS hapax_type_ppm
           |FROM s ORDER BY source""".stripMargin))

  /** Exact cosine radius search at theta = 0.25: the compare runs on
    * the quantized cosine both engines report, so the boundary is
    * hash-exact.
    */
  private val annRadiusTheta = 250000L
  private val annRadiusSearch = CatalogEntry(
    "ann_radius_search",
    (s, dir) => {
      val e = AnnSearch.vectors(QuerySupport.table(s, dir, "embeddings"))
      AnnSearch.radiusSearch(e, e.filter(col("vec_id") < annQueryIds),
          annRadiusTheta)
        .orderBy("query_id", "neighbor_id")
    },
    Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
            |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            |        CAST(floor(list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i]))
            |          / (q.nrm * c.nrm) * 1000000.0 + 0.5) AS BIGINT) AS cm
            |      FROM n q JOIN n c ON c.vec_id <> q.vec_id
            |      WHERE q.vec_id < $annQueryIds),
            |m AS (SELECT * FROM p WHERE cm >= $annRadiusTheta)
            |SELECT query_id, neighbor_id,
            |  CAST(cm AS DOUBLE) / 1000000.0 AS cosine,
            |  CAST(count(*) OVER (PARTITION BY query_id) AS BIGINT) AS n_matches
            |FROM m ORDER BY query_id, neighbor_id""".stripMargin))

  /** Exact bucket-pruned radius search: identical output to
    * ann_radius_search (the pruning is provably lossless), same
    * brute oracle.
    */
  private val annRadiusIvf = CatalogEntry(
    "ann_radius_ivf",
    (s, dir) => AnnSearch.radiusSearchIvf(
        QuerySupport.table(s, dir, "embeddings"),
        col("vec_id") < annQueryIds, annRadiusTheta)
      .orderBy("query_id", "neighbor_id"),
    Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
            |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            |        CAST(floor(list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i]))
            |          / (q.nrm * c.nrm) * 1000000.0 + 0.5) AS BIGINT) AS cm
            |      FROM n q JOIN n c ON c.vec_id <> q.vec_id
            |      WHERE q.vec_id < $annQueryIds),
            |m AS (SELECT * FROM p WHERE cm >= $annRadiusTheta)
            |SELECT query_id, neighbor_id,
            |  CAST(cm AS DOUBLE) / 1000000.0 AS cosine,
            |  CAST(count(*) OVER (PARTITION BY query_id) AS BIGINT) AS n_matches
            |FROM m ORDER BY query_id, neighbor_id""".stripMargin))

  /** Plan-adaptive exact radius search: the path pick (brute vs
    * ball-pruned) comes from the measured sampled pruning power —
    * on this diffuse fixture it takes the brute scan (Round19PlanSpec
    * pins the plan shape per regime); rows are identical either way,
    * so the brute oracle serves both.
    */
  private val annRadiusAdaptive = CatalogEntry(
    "ann_radius_adaptive",
    (s, dir) => AnnSearch.radiusSearchAdaptive(
        QuerySupport.table(s, dir, "embeddings"),
        col("vec_id") < annQueryIds, annRadiusTheta)
      .orderBy("query_id", "neighbor_id"),
    Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
            |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            |        CAST(floor(list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i]))
            |          / (q.nrm * c.nrm) * 1000000.0 + 0.5) AS BIGINT) AS cm
            |      FROM n q JOIN n c ON c.vec_id <> q.vec_id
            |      WHERE q.vec_id < $annQueryIds),
            |m AS (SELECT * FROM p WHERE cm >= $annRadiusTheta)
            |SELECT query_id, neighbor_id,
            |  CAST(cm AS DOUBLE) / 1000000.0 AS cosine,
            |  CAST(count(*) OVER (PARTITION BY query_id) AS BIGINT) AS n_matches
            |FROM m ORDER BY query_id, neighbor_id""".stripMargin))

  /** Pairwise label-centroid cosines from exact integer sum-vector
    * dots (cosine is scale-invariant, so sum == mean); one bounded
    * (label, dim) aggregate is the only corpus-sized work.
    */
  private val embLabelCentroidMatrix = CatalogEntry(
    "emb_label_centroid_matrix",
    (s, dir) => EmbeddingOps.labelCentroidMatrix(
        QuerySupport.table(s, dir, "embeddings"))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        col("dot"), r6(col("cos")).as("cos"))
      .orderBy("label_a", "label_b"),
    Some {
      val dim = LlmDataParams.embDim
      s"""WITH e AS (SELECT CAST(label AS BIGINT) AS l,
         |        list_transform(embedding::DOUBLE[],
         |          x -> CAST(floor(x * 1000) AS BIGINT)) AS q
         |      FROM embeddings),
         |s AS (SELECT l, i, CAST(sum(q[i]) AS BIGINT) AS sv
         |      FROM e CROSS JOIN (SELECT unnest(range(1, ${dim + 1})) AS i)
         |      GROUP BY l, i),
         |cnt AS (SELECT l, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY l),
         |d AS (SELECT a.l AS la, b.l AS lb, CAST(sum(a.sv * b.sv) AS BIGINT) AS dot
         |      FROM s a JOIN s b ON a.i = b.i AND a.l <= b.l GROUP BY a.l, b.l),
         |self AS (SELECT la AS l, dot AS dd FROM d WHERE la = lb)
         |SELECT d.la AS label_a, d.lb AS label_b, na.n AS n_a, nb.n AS n_b, d.dot,
         |  ${r6s("CASE WHEN d.dot = 0 AND d.la = d.lb THEN 0.0 " +
              "WHEN sa.dd <= 0 OR sb.dd <= 0 THEN 0.0 " +
              "ELSE CAST(d.dot AS DOUBLE) / sqrt(CAST(sa.dd AS DOUBLE) * CAST(sb.dd AS DOUBLE)) END")} AS cos
         |FROM d JOIN self sa ON sa.l = d.la JOIN self sb ON sb.l = d.lb
         |  JOIN cnt na ON na.l = d.la JOIN cnt nb ON nb.l = d.lb
         |ORDER BY label_a, label_b""".stripMargin
    })

  /** Held-out bigram surprisal: add-one-smoothed train-slice LM
    * scoring the test slice — per-bigram munats quantized once,
    * exact BIGINT per-doc sums, unseen bigrams counted.
    */
  /** Shared holdout-LM CTE chain ending in `q` (per-test-bigram
    * scores) — used by the doc-grain and the by-source entries.
    */
  private lazy val bigramHoldoutCtes: String =
    """tr AS (SELECT doc_id, string_split(text, ' ') AS w
           |      FROM documents WHERE doc_id % 5 <> 0 AND text IS NOT NULL),
           |trb AS (SELECT unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])) AS bg,
           |          unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1
           |        FROM tr WHERE len(w) >= 2),
           |c12 AS (SELECT bg, count(*) AS c12 FROM trb GROUP BY bg),
           |c1 AS (SELECT w1, count(*) AS c1 FROM trb GROUP BY w1),
           |v AS (SELECT count(DISTINCT t) AS v FROM (
           |        SELECT unnest(string_split(text, ' ')) AS t FROM documents
           |        WHERE doc_id % 5 <> 0)),
           |te AS (SELECT doc_id, string_split(text, ' ') AS w
           |      FROM documents WHERE doc_id % 5 = 0 AND text IS NOT NULL),
           |teb AS (SELECT doc_id,
           |          unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])) AS bg,
           |          unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1
           |        FROM te WHERE len(w) >= 2),
           |sc AS (SELECT teb.doc_id, coalesce(c12.c12, 0) AS c12v,
           |          coalesce(c1.c1, 0) AS c1v
           |       FROM teb LEFT JOIN c12 USING (bg) LEFT JOIN c1 USING (w1)),
           |q AS (SELECT doc_id,
           |        CAST(floor(ln((CAST(c1v AS DOUBLE) + CAST(v.v AS DOUBLE))
           |          / (CAST(c12v AS DOUBLE) + 1.0)) * 1000000.0 + 0.5) AS BIGINT) AS s,
           |        CASE WHEN c12v = 0 THEN 1 ELSE 0 END AS u
           |      FROM sc CROSS JOIN v)""".stripMargin

  private val textBigramHoldout = CatalogEntry(
    "text_bigram_holdout",
    (s, dir) => TextAnalysis.bigramHoldoutSurprisal(
        QuerySupport.table(s, dir, "documents"))
      .orderBy("doc_id"),
    Some(s"""WITH $bigramHoldoutCtes
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           |  CAST(sum(u) AS BIGINT) AS n_unseen,
           |  CAST(sum(s) AS BIGINT) AS surprisal_munats,
           |  CAST(sum(s) // greatest(count(*), 1) AS BIGINT) AS munats_per_bigram
           |FROM q GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  /** Per-source rollup of the holdout LM scores: which source the
    * train-slice model generalizes to worst.
    */
  private val textBigramHoldoutSource = CatalogEntry(
    "text_bigram_holdout_source",
    (s, dir) => TextAnalysis.bigramHoldoutBySource(
        QuerySupport.table(s, dir, "documents"))
      .orderBy("source"),
    Some(s"""WITH $bigramHoldoutCtes,
           |qq AS (SELECT doc_id, count(*) AS nb, sum(u) AS nu, sum(s) AS sm
           |       FROM q GROUP BY doc_id),
           |ss AS (SELECT qq.*, d.source FROM qq JOIN documents d USING (doc_id))
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(nb) AS BIGINT) AS n_bigrams,
           |  CAST(sum(nu) AS BIGINT) AS n_unseen,
           |  CAST(sum(sm) AS BIGINT) AS surprisal_munats,
           |  CAST(sum(sm) // greatest(sum(nb), 1) AS BIGINT) AS munats_per_bigram,
           |  CAST(sum(nu) * 1000000 // greatest(sum(nb), 1) AS BIGINT) AS unseen_ppm
           |FROM ss GROUP BY source ORDER BY source""".stripMargin))



  /** kNN label purity per label over the exact top-k ranking (same
    * tie-break as ann_topk); ppm floor-divs.
    */
  private val annKnnPurity = CatalogEntry(
    "ann_knn_purity",
    (s, dir) => AnnSearch.knnLabelPurity(
        QuerySupport.table(s, dir, "embeddings"),
        col("vec_id") < annQueryIds, annK)
      .orderBy("label"),
    Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
            |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            |        list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm) AS cos
            |      FROM n q JOIN n c ON c.vec_id <> q.vec_id WHERE q.vec_id < $annQueryIds),
            |r AS (SELECT query_id, neighbor_id,
            |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk FROM p),
            |topk AS (SELECT query_id, neighbor_id FROM r WHERE rnk <= $annK),
            |lab AS (SELECT vec_id, CAST(label AS BIGINT) AS lab FROM embeddings)
            |SELECT ql.lab AS label,
            |  CAST(count(DISTINCT query_id) AS BIGINT) AS n_queries,
            |  CAST(count(*) AS BIGINT) AS n_neighbors,
            |  CAST(sum(CASE WHEN nl.lab = ql.lab THEN 1 ELSE 0 END) AS BIGINT) AS n_same_label,
            |  CAST(sum(CASE WHEN nl.lab = ql.lab THEN 1 ELSE 0 END) * 1000000
            |    // greatest(count(*), 1) AS BIGINT) AS purity_ppm
            |FROM topk JOIN lab ql ON ql.vec_id = topk.query_id
            |  JOIN lab nl ON nl.vec_id = topk.neighbor_id
            |GROUP BY ql.lab ORDER BY label""".stripMargin))

  /** Quality-threshold token-budget curve over the heuristic quality
    * micro grain: the grid rides the bounded count-of-counts frame.
    */
  private val sampleQualityBudgetCurve = CatalogEntry(
    "sample_quality_budget_curve",
    (s, dir) => Curation.qualityBudgetCurve(
        QuerySupport.table(s, dir, "documents"),
        Seq(0L, 200000L, 300000L, 400000L, 500000L,
          600000L, 700000L, 800000L))
      .orderBy("threshold_micro"),
    Some(s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
            |m AS (SELECT doc_id, len(w) AS n_tokens, len(list_distinct(w)) AS n_distinct,
            |        len(list_filter(w, t -> t IN ${inList(stopwords)})) AS n_stop FROM w),
            |sq AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
            |        CAST(floor((0.4 * (n_distinct / n_tokens)
            |          + 0.3 * (1.0 - n_stop / n_tokens)
            |          + 0.3 * least(1.0, n_tokens / 50.0)) * 1000000.0 + 0.5) AS BIGINT) AS q
            |      FROM m),
            |grain AS (SELECT q, count(*) AS d, sum(n_tokens) AS t FROM sq GROUP BY q),
            |tot AS (SELECT CAST(sum(d) AS BIGINT) AS td, CAST(sum(t) AS BIGINT) AS tt FROM grain),
            |grid AS (SELECT CAST(unnest([0, 200000, 300000, 400000, 500000,
            |           600000, 700000, 800000]) AS BIGINT) AS threshold_micro),
            |k AS (SELECT grid.threshold_micro,
            |        CAST(coalesce(sum(grain.d), 0) AS BIGINT) AS n_docs_kept,
            |        CAST(coalesce(sum(grain.t), 0) AS BIGINT) AS n_tokens_kept
            |      FROM grid LEFT JOIN grain ON grain.q >= grid.threshold_micro
            |      GROUP BY grid.threshold_micro)
            |SELECT threshold_micro, n_docs_kept, n_tokens_kept,
            |  CAST(n_docs_kept * 1000000 // greatest(tot.td, 1) AS BIGINT) AS doc_share_ppm,
            |  CAST(n_tokens_kept * 1000000 // greatest(tot.tt, 1) AS BIGINT) AS token_share_ppm
            |FROM k CROSS JOIN tot ORDER BY threshold_micro""".stripMargin))

  val entries: Seq[CatalogEntry] = Seq(
    retrievalQueryLikelihood, textLexicalStats, annRadiusSearch,
    embLabelCentroidMatrix, textBigramHoldout, annKnnPurity,
    textDecontaminateAnchored, curationPipelineV5Anchored,
    retrievalEvalQl, textBigramHoldoutSource,
    sampleQualityBudgetCurve, annRadiusIvf, annRadiusAdaptive,
    curationPipelineV6,
    textSourceJsDivergence, dedupEditVerify, dedupEditVerifySampled,
    textLengthLognormal, eventsActivityGini, eventsLorenzDeciles,
    textQualityRankCorr, sampleEssAudit, dedupThresholdSweep,
    dedupThresholdSweepSampled,
    textVocabGrowth,
    privacyTCloseness, annInt8Recall, annRecallCurve, annKmeansSilhouette,
    dedupExact, dedupExactNormalized, dedupMinhash, dedupMinhashAudit,
    dedupMinhashWidthPlan, dedupMinhashWidthPlanSampled,
    dedupMethodAgreement, dedupMethodAgreementSampled,
    dedupSourceMatrix, dedupSourceMatrixSampled,
    dedupBlockingAudit,
    textNgramNovelty, textCrossNovelty, textDupSpanCoverage, textDupSpanRemoval, textLineDedup,
    textHeavyHitters, textBootstrapMeans, textBootstrapBySource,
    textVocabHll, textVocabHllSources, textVocabHllShardMerge, textCollocations, textBpeMerges,
    textBpeFertility,
    textVocabKmvOverlap, textCmsAudit, dedupPrefix,
    sampleWeighted, textDsirWeights, sampleDsir, samplePriorityGroup, sampleNeyman,
    eventsDauHll, eventsWauRolling,
    dedupLshCapped, dedupLshParamPlan, dedupLshParamPlanSampled, dedupJaccard, dedupClusters, dedupClusterHistogram,
    dedupClustersDist, dedupSelectCanonical, dedupSelectCanonicalDist, dedupMixtureImpact,
    dedupQualityImpact,
    splitLeakageFree, splitTemporalEmbargo, splitKfold, sampleClusterWeighted,
    dedupSimhash, dedupEmbedding,
    dedupEmbeddingCross,
    dedupEmbeddingCapped,
    dedupSemantic,
    dedupPassageStats, dedupSegments, dedupPassageMulti, dedupCrossCorpus,
    dedupCrossCorpusCapped,
    dedupBloomPrefilter, dedupIncrementalAssign, dedupIncrementalAssignCapped,
    contamReportSampled,
    textVocabCoverage,
    annTopK, annIvfTopK, retrievalRrfFusion,
    annKnnGraph, annBucketBalance, annKnnMutual, annKnnMutualScaled, annKnnGraphScaled, annKnnGraphLearned, annKnnGraphLearnedScaled,
    annGraphTriangles, annGraphTrianglesScaled, annGraphGlobalClustering,
    annGraphGlobalClusteringScaled, dedupGraphTransitivity,
    dedupGraphTransitivitySampled,
    annLabelProp, annLabelPropScaled,
    annTripletMining, annTripletMiningScaled,
    annKnnPagerank, annKnnPagerankScaled,
    annKmeans, annIvfKmeans,
    annPqAssign, annPqAssignLearned, annPqDistortion, annPqTopK,
    annIvfPq, annKnnGraphPq, annIvfPqRerank, annRecall, annRecallLearned, annMatryoshkaRecall, annRpRecall,
    annProbeSweep,
    embLabelStats, embLabelDrift, embCovariance, embZscoreOutliers,
    embDimVariance,
    embQuantizeInt8, embPrototypePrune, embTopComponent, embPca2d,
    embProjectionOutliers, textLangStats,
    textQuality, textGopherRules, textLangid, textLangMix, textCharEntropy, textEntropyRate, textLangidConfusion, textReadability,
    sampleWeightedStratified, packCurriculum, textFingerprint, textTokenCount,
    textTokensFreq,
    textCuration, pretrainPipeline, curationPipelineV2, curationPipelineV3,
    curationPipelineV4, curationPipelineV5,
    textRepetition, textPiiRedact, textPiiDensity,
    textTfidf, textSurprisal, textBigramSurprisal,
    textHashClassifier, textClassifierTrain, textClassifierEval,
    textClassifierCurve, textClassifierAuc, textClassifierPrSweep,
    textClassifierAucHoldout,
    textSurprisalBuckets, textSurprisalBucketsScaled,
    textQualityEnsemble,
    textBm25TopK, textBm25Batch, retrievalEvalKnownItem, retrievalEvalMacro,
    retrievalHybridBatch, retrievalHybridAnn, retrievalEvalHybridAnn,
    retrievalPrfExpand, retrievalHardNegatives, retrievalNdcg, retrievalMap,
    retrievalRecallCurve, sampleTemperatureEss, textCalibrationBins,
    textQualityPercentile, textAgreementKappa, textSourceGini,
    privacyKAnonymity, privacyLDiversity, curationSnapshotDiff, textDocClusters, textClusterDiversity,
    textChunkOverlap, textZipfFit, textHeapsFit, textVocabHeadCoverage,
    textWinnow,
    dedupWinnowCandidates, dedupContainment, dedupContainmentTight,
    textSourceReport, textSourceKlDrift,
    sampleStratified, sampleTokenBudget, packSequences, packPaddingWaste, packShards,
    textDecontaminate, textDecontaminateClusters, contamReport,
    sampleCapPerSource, sampleTemperatureMix, sampleTemperatureSweep, sampleMixtureRates, sampleEpochsReport,
    shuffleGlobal, curationShuffleAudit,
    multimodalMeta, multimodalDimsStats, multimodalPhashDedup,
    multimodalPhashDedupTight, multimodalDctPhashDedup,
    multimodalPhashKeep, multimodalPayloadAudit, multimodalFormatReport,
    multimodalAspectPack, multimodalPackEfficiency, textMsttr,
    skewSaltedAgg, skewSaltedJoin)
}
