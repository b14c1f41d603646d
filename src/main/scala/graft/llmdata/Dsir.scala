package graft.llmdata

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import LlmDataParams._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
  * select raw-corpus documents that look like a small TARGET corpus by
  * importance weighting under two hashed bag-of-words models. The
  * published recipe — hashed n-gram features, smoothed unigram bucket
  * models for target and raw, per-document log importance weight
  * `sum_b log(p_target[b]/p_raw[b])`, then Gumbel-top-k resampling —
  * expressed as three map-side-combinable aggregates and one
  * TakeOrdered.
  *
  * Exactness discipline: bucket log-ratios are quantized to integer
  * micro-nats PER BUCKET (the surprisal-family trick), so every
  * per-document weight is an exact BIGINT sum — order-, partition- and
  * engine-independent; only the final reported averages divide in
  * float. The Gumbel keys derive from the document-id digest (the
  * established md5→uniform decode of the weighted-sample family), so
  * the "randomized" resample is deterministic and replayable on both
  * engines.
  */
object Dsir {

  /** Per-document DSIR importance weight against a boolean target
    * slice (e.g. `lang = 'en'`: "upweight documents that look like
    * the English slice"). Buckets are 16-bit md5 prefixes mod
    * `buckets`; models are add-one smoothed over bucket counts.
    *
    * 100 TB plan: ONE token-stream aggregate builds BOTH models
    * (conditional sum for the target counts — the target slice is a
    * filter, not a second scan); the model is `buckets` rows, so the
    * totals attach by broadcast and the log-ratio table broadcast-joins
    * back onto the token stream; the weight is one doc-keyed
    * map-side-combined sum. No shuffle ever carries the vocabulary —
    * only bucket ids bounded by `buckets`. The smoothed ratio is
    * computed in double from exact BIGINT counts (products of
    * corpus-scale counts would overflow int64; IEEE doubles don't, and
    * both engines round the same two quotient factors identically).
    * Output: (doc_id, n_feats, logw_unats, avg_logw).
    */
  def dsirWeights(docs: DataFrame, target: Column, idCol: String = "doc_id",
                  textCol: String = "text",
                  buckets: Int = dsirBuckets): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val toks = PersistPolicy.persistGated(docs
      .select(col(idCol), target.as("__tgt"),
        explode(split(col(textCol), " ")).as("__term"))
      .withColumn("__b", expr(s"(${hexDecode4("md5(__term)")}) % $buckets")),
      docs) // token stream > the corpus: size-gated (r14 advice #5 —
            // no unconditional cache for library callers to leak);
            // read by the model aggregate and the weight join-back
    val model = toks.groupBy("__b")
      .agg(count(lit(1)).as("__raw"),
        sum(when(col("__tgt"), 1L).otherwise(0L)).as("__tcnt"))
    val totals = model.agg(sum("__raw").as("__rt"), sum("__tcnt").as("__tt"))
    // log( ((tcnt+1)/(tt+B)) / ((raw+1)/(rt+B)) ) with each factor an
    // exact-integer-to-double cast and ONE multiply/divide chain —
    // identical IEEE steps on both engines, then micro-nat quantized
    val lr = model.crossJoin(broadcast(totals))
      .withColumn("lr_unat", expr(
        s"cast(floor(ln((cast(__tcnt + 1 as double) * cast(__rt + $buckets as double)) / " +
          s"(cast(__raw + 1 as double) * cast(__tt + $buckets as double))) " +
          "* 1000000.0 + 0.5) as bigint)"))
      .select(col("__b"), col("lr_unat"))
    toks.join(broadcast(lr), "__b")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum("lr_unat").as("logw_unats"))
      .withColumn("avg_logw",
        col("logw_unats").cast("double") / lit(1000000.0) / col("n_feats"))
  }

  /** Gumbel-top-k resample over [[dsirWeights]] — the DSIR selection
    * step proper: adding independent Gumbel noise to each log weight
    * and keeping the k largest keys IS sampling k documents without
    * replacement proportionally to softmax of the log weights (Kool et
    * al. 2019); the noise here is the deterministic id-digest uniform,
    * so the draw replays bit-for-bit. `u = (h32+1)/(2^32+1)` keeps u
    * strictly inside (0,1) — both `ln`s finite.
    *
    * 100 TB plan: the weight frame's three aggregates plus one
    * projection and a global top-k, which Spark executes as
    * TakeOrderedAndProject (per-partition heaps, no global sort); the
    * rank window orders k rows. Output: (rank, doc_id, n_feats,
    * logw_unats, gumbel_unats, key_unats).
    */
  def dsirResample(docs: DataFrame, target: Column, k: Int = dsirK,
                   idCol: String = "doc_id", textCol: String = "text",
                   buckets: Int = dsirBuckets): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val u32 = s"cast(conv(substring(md5(concat('dsir:', " +
      s"cast($idCol as string))), 1, 8), 16, 10) as bigint)"
    // 4294967297 = 2^32+1 (exact in double): u=1 would send the outer
    // ln to -inf; the bare integer literal keeps Spark SQL off the
    // DECIMAL-literal trap recorded in PLANS.md round-14
    val keyed = dsirWeights(docs, target, idCol, textCol, buckets)
      .withColumn("gumbel_unats", expr(
        s"cast(floor(-ln(-ln((($u32) + 1) / cast(4294967297 as double))) " +
          "* 1000000.0 + 0.5) as bigint)"))
      .withColumn("key_unats", col("logw_unats") + col("gumbel_unats"))
    keyed
      .orderBy(col("key_unats").desc, col(idCol).asc)
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("key_unats").desc, col(idCol).asc)).cast("long"))
      .select(col("rank"), col(idCol), col("n_feats"), col("logw_unats"),
        col("gumbel_unats"), col("key_unats"))
  }
}
