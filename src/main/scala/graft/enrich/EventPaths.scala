package graft.enrich

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-path analytics: Markov next-event transition counts and the
  * hot-key concentration report (no reference counterpart —
  * builder-brief event tooling, the standard clickstream pair to
  * [[Sessionize]] / [[Funnel]]).
  *
  * Scale: [[transitionTopK]] shuffles once on the entity key for the
  * `lead` window; the pair counts map-side combine into an
  * (n_types x n_types)-row frame, so the rank window runs over a
  * bounded frame regardless of corpus size. [[keySkewTopK]] never
  * windows over the full key frame: the per-key counts are
  * map-side-combined, the top-N cut is a TakeOrdered (sort + limit,
  * no global window), and only the N survivors see the cumulative
  * window — the single-partition window that would melt at 100x
  * touches exactly `topN` rows.
  */
object EventPaths {

  /** Top-k next-event transitions per source event type.
    *
    * `lead(type)` over each key's (time, tie)-ordered stream yields
    * the observed (src -> dst) steps; counts aggregate map-side;
    * `prob_micro` is exact integer ppm of the source's outgoing total;
    * ranking is (count desc, dst asc) for a deterministic cut.
    */
  def transitionTopK(events: DataFrame, keyCol: String, timeCol: String,
                     typeCol: String, tieCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(timeCol).asc, col(tieCol).asc)
    val steps = events
      .withColumn("__dst", lead(col(typeCol), 1).over(w))
      .filter(col("__dst").isNotNull)
      .select(col(typeCol).as("src"), col("__dst").as("dst"))
    val counts = steps.groupBy("src", "dst").agg(count(lit(1)).as("n_steps"))
    val perSrc = Window.partitionBy("src")
    val rank = Window.partitionBy("src")
      .orderBy(col("n_steps").desc, col("dst").asc)
    counts
      .withColumn("src_total", sum(col("n_steps")).over(perSrc))
      .withColumn("prob_micro", expr("n_steps * 1000000 div src_total"))
      .withColumn("rank", row_number().over(rank).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Per-source-state entropy of the next-event distribution — the
    * predictability summary over [[transitionTopK]]'s Markov pairs: a
    * state whose outgoing steps are near-deterministic scores ~0, a
    * state that fans out uniformly over m successors scores ~ln(m).
    * Quantization is the corpus-entropy convention (charEntropy /
    * entropyRate): per (src, dst) the count-scaled micro-nat term
    * `⌊c·ln(total/c)·1e6 + ½⌋` quantizes ONCE, sums as exact BIGINT
    * (h_unats ≈ n·H·1e6 — int64-safe to ~1e12 steps per source;
    * shard-and-add beyond, the entropyRate convention), and the
    * per-step rate is one truncating integer division.
    *
    * 100 TB plan: the steps frame rides ONE entity-key window
    * exchange (shared shape with transitionTopK); pair counts
    * map-side combine to the (n_types²-bounded, in practice sparse)
    * transition frame, and the per-src total is a window over THAT
    * bounded frame. Output: one row per source type —
    * (src, n_steps, n_dst_types, h_unats, h_micro_nats).
    */
  def transitionEntropy(events: DataFrame, keyCol: String, timeCol: String,
                        typeCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(timeCol).asc, col(tieCol).asc)
    val steps = events
      .withColumn("__dst", lead(col(typeCol), 1).over(w))
      .filter(col("__dst").isNotNull)
      .select(col(typeCol).as("src"), col("__dst").as("dst"))
    val counts = steps.groupBy("src", "dst").agg(count(lit(1)).as("__c"))
    val perSrc = Window.partitionBy("src")
    counts
      .withColumn("__tot", sum("__c").over(perSrc))
      .withColumn("__term", expr(
        "cast(floor(__c * ln(cast(__tot as double) / __c) * 1000000 + 0.5) " +
          "as bigint)"))
      .groupBy("src")
      .agg(max("__tot").as("n_steps"),
        count(lit(1)).as("n_dst_types"),
        sum("__term").as("h_unats"))
      .withColumn("h_micro_nats",
        expr("h_unats div greatest(n_steps, 1)"))
  }

  /** Stationary distribution of the event-type Markov chain — where
    * the [[transitionTopK]] matrix SENDS the traffic in the long run:
    * the equilibrium share of each state under repeated transition,
    * the "which screen do users end up cycling in" summary that a
    * single-step matrix can't show. Power iteration from the uniform
    * start, π' = πP, on the chain RESTRICTED to states with outgoing
    * transitions (a dst that never transitions out would leak mass;
    * the restriction renormalizes row totals over the kept columns —
    * stated contract).
    *
    * Replay contract (the emb power-chain discipline): π lives in
    * integer micro-units; each iteration's term `(π_i·c_ij) div tot_i`
    * quantizes with ONE truncating division per matrix cell (both
    * engines truncate; all values non-negative), so every iteration
    * is an exact integer frame and the whole 8-step chain replays
    * engine-identically. Quantization leaks ≤1 micro per cell per
    * step — π sums drift below 1e6 by at most n_types²·iters micro,
    * never above.
    *
    * 100 TB plan: ONE entity-key window exchange builds the steps
    * frame (shared shape with transitionTopK/transitionEntropy) into
    * the n_types²-bounded pair-count frame, which is persisted
    * (bounded-frame class, unconditional), size-guarded with a
    * `count()` BEFORE anything is collected, and then pulled to the
    * driver ONCE — the restriction, the row totals, and the whole
    * `iters`-step power chain are driver-side integer arithmetic over
    * that bounded matrix (the componentsOverPairs dual-path
    * discipline: driver fast path under an explicit cap, loud fail
    * above it). No per-iteration scan of anything corpus-sized, and
    * the corpus chain runs exactly once. Output: (state, pi_micro,
    * rank).
    */
  def markovStationary(events: DataFrame, keyCol: String, timeCol: String,
                       typeCol: String, tieCol: String,
                       iters: Int = 8,
                       maxDriverCells: Long = 1000000L): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(timeCol).asc, col(tieCol).asc)
    val steps = events
      .withColumn("__dst", lead(col(typeCol), 1).over(w))
      .filter(col("__dst").isNotNull)
      .select(col(typeCol).as("src"), col("__dst").as("dst"))
    // n_types²-bounded; persisted because the guard count and the
    // collect both read it (one corpus pass total — the r19 spelling
    // ran the steps chain twice, once for the srcSet broadcast and
    // once for the restricted matrix)
    val counts0 = steps.groupBy("src", "dst").agg(count(lit(1)).as("c"))
      .persist()
    // guard BEFORE the collect (ADVICE r19 #3): a high-cardinality
    // typeCol must fail loudly, not OOM the driver materializing the
    // very frame the require was about to reject
    val nPairCells = counts0.count()
    require(nPairCells <= maxDriverCells,
      s"markovStationary: $nPairCells transition cells > " +
        s"$maxDriverCells — shard the chain or raise maxDriverCells")
    val pairs = counts0.collect()
      .map(r => (r.get(0), r.get(1), r.getLong(2)))
    counts0.unpersist(false)
    // Replay of the oracle chain, driver-side (ADVICE r19 #1): states
    // and the initial mass divisor come from the FULL source set (a
    // source whose transitions all lead to terminal states still gets
    // its uniform share and a pi_micro = 0 output row via the final
    // left-join-with-fill), and the restriction keeps cells whose dst
    // is a NON-NULL source (SQL equijoin semantics: NULL never
    // matches). Cells with a NULL src carry no mass — the per-src
    // total join and the per-iteration π join are both src equijoins.
    val srcStates = pairs.map(_._1).distinct
    val srcNonNull: Set[Any] = srcStates.filter(_ != null).toSet
    val restricted = pairs.filter { case (_, dst, _) => srcNonNull(dst) }
    val tot: Map[Any, Long] = restricted
      .filter(_._1 != null)
      .groupBy(_._1).map { case (s, cs) => s -> cs.map(_._3).sum }
    val cells = restricted.filter(_._1 != null)
      .map { case (src, dst, c) => (src, dst, c, tot(src)) }
    val k = srcStates.length.toLong
    var pi: Map[Any, Long] =
      if (k == 0) Map.empty else srcStates.map(_ -> 1000000L / k).toMap
    (1 to iters).foreach { _ =>
      // inner-join presence semantics: a dst enters the next π iff at
      // least one cell with src present in the current π contributes
      val next = scala.collection.mutable.HashMap.empty[Any, Long]
      cells.foreach { case (src, dst, c, t) =>
        pi.get(src).foreach { r =>
          next(dst) = next.getOrElse(dst, 0L) + (r * c) / t
        }
      }
      pi = next.toMap
    }
    // final frame ranges over the FULL source set (the old left join +
    // fill-0), and the rank runs in-engine over the n_types-row frame
    // so the (pi desc, state asc) tie-break uses the column TYPE's
    // ordering, exactly as the window spelling did
    val spark = events.sparkSession
    val schema = new org.apache.spark.sql.types.StructType()
      .add("state", events.schema(typeCol).dataType)
      .add("pi_micro", org.apache.spark.sql.types.LongType, nullable = false)
    val piDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        srcStates.toSeq.map(s =>
          org.apache.spark.sql.Row(s, pi.getOrElse(s, 0L))), 1), schema)
    val rk = Window.orderBy(col("pi_micro").desc, col("state").asc)
    piDf.withColumn("rank", row_number().over(rk).cast("long"))
  }

  /** Top-k length-3 event PATHS — one step deeper than
    * [[transitionTopK]]'s Markov pairs: the (a -> b -> c) triples a
    * journey analyst reads as the dominant flows. Two `lead`s ride
    * ONE key-exchange window sort; triple counts map-side combine
    * into an (n_types^3-bounded, in practice far sparser) frame; the
    * cut is a TakeOrdered — no window ever touches more than k rows.
    * `share_ppm` is the exact integer share of all observed triples.
    * Output: (e1, e2, e3, n_paths, share_ppm, rank).
    */
  def topPaths(events: DataFrame, keyCol: String, timeCol: String,
               typeCol: String, tieCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(timeCol).asc, col(tieCol).asc)
    val triples = events
      .withColumn("__e2", lead(col(typeCol), 1).over(w))
      .withColumn("__e3", lead(col(typeCol), 2).over(w))
      .filter(col("__e3").isNotNull)
      .select(col(typeCol).as("e1"), col("__e2").as("e2"), col("__e3").as("e3"))
    val counts = triples.groupBy("e1", "e2", "e3")
      .agg(count(lit(1)).as("n_paths"))
    val total = counts.agg(sum("n_paths").as("__total"))
    counts
      .crossJoin(broadcast(total))
      .withColumn("share_ppm", expr("n_paths * 1000000 div __total"))
      .orderBy(col("n_paths").desc, col("e1").asc, col("e2").asc, col("e3").asc)
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_paths").desc, col("e1").asc, col("e2").asc,
          col("e3").asc)).cast("long"))
      .drop("__total")
  }

  /** Top-N hottest keys with exact integer concentration shares.
    *
    * Output per survivor: the key, `n_rows`, `share_ppm` (of ALL rows,
    * not just survivors), `rank`, and `cum_share_ppm` — the running
    * concentration a capacity planner reads ("the top 5 users are 38%
    * of the stream"). The grand total is a scalar aggregate attached
    * by broadcast, so shares stay exact while the full key frame is
    * never sorted globally — only the `topN` survivors of the
    * TakeOrdered cut enter the cumulative window.
    */
  def keySkewTopK(df: DataFrame, keyCol: String, topN: Int): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n_rows"))
    val total = counts.agg(sum("n_rows").as("__total"))
    val top = counts
      .orderBy(col("n_rows").desc, col(keyCol).asc)
      .limit(topN)
    val w = Window.orderBy(col("n_rows").desc, col(keyCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top
      .crossJoin(broadcast(total))
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("n_rows").desc, col(keyCol).asc)).cast("long"))
      .withColumn("share_ppm", expr("n_rows * 1000000 div __total"))
      .withColumn("__cum", sum(col("n_rows")).over(w))
      .withColumn("cum_share_ppm", expr("__cum * 1000000 div __total"))
      .drop("__total", "__cum")
  }

  /** Per-key inter-arrival gap + staleness audit — the data-freshness
    * report behind "is this source still producing, and at what
    * cadence": for every key, the count of events, min/max/mean gap
    * between consecutive events (time units of `timeCol`), and the
    * staleness of its LAST event relative to the corpus's newest
    * timestamp. Single-event keys report NULL gaps (no pair to
    * measure — kept NULL, not zero, so a cadence consumer can't
    * mistake "never repeated" for "instantaneous").
    *
    * Scale: ONE exchange on the key for the `lag` window; the per-key
    * aggregate that follows groups on the SAME key, so Catalyst
    * reuses the window's hash partitioning (no second shuffle — the
    * transitionTopK contract). The corpus max is a scalar attached by
    * broadcast. `mean_gap_us` is an exact integer division (gaps are
    * non-negative, so trunc == floor on both engines). Output: one
    * row per key — (key, n_events, n_gaps, min_gap_us, max_gap_us,
    * mean_gap_us, staleness_us).
    */
  def interArrivalStats(events: DataFrame, keyCol: String,
                        timeCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(timeCol).asc, col(tieCol).asc)
    val gaps = events
      .withColumn("__gap", col(timeCol) - lag(col(timeCol), 1).over(w))
    val perKey = gaps.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        count(col("__gap")).as("n_gaps"),
        min("__gap").as("min_gap_us"),
        max("__gap").as("max_gap_us"),
        sum("__gap").as("__sum_gap"),
        max(col(timeCol)).as("__last_t"))
      .withColumn("mean_gap_us",
        expr("__sum_gap div greatest(n_gaps, 1)"))
    val newest = events.agg(max(col(timeCol)).as("__max_t"))
    perKey
      .crossJoin(broadcast(newest))
      .withColumn("staleness_us", col("__max_t") - col("__last_t"))
      .select(col(keyCol), col("n_events"), col("n_gaps"),
        col("min_gap_us"), col("max_gap_us"), col("mean_gap_us"),
        col("staleness_us"))
  }
}
