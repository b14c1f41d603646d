package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: runs every catalog query on
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Queries are fully
  * executed via a noop-format write (not `.count()`, which would let
  * Catalyst prune all computed columns — VERDICT r1 §wrong-4).
  *
  * Each query is timed SPARK_GRAFT_REPEAT times (default 3) and the
  * per-query MEDIAN is reported, so 1-2 s scheduler/GC swings don't
  * read as regressions (VERDICT r3 §next-8). The session cache is
  * cleared between runs so every timing is a cold-cache run — cached
  * frames persisted inside one query never subsidize (or double-cache
  * against) the next (VERDICT r3 §next-9).
  *
  * Between runs the harness does a FULL storage reset, not just
  * `clearCache()` (VERDICT r7 §wrong-1): `localCheckpoint(true)` RDD
  * blocks and broadcast pieces survive the SQL-cache clear and were
  * accumulating across 103 queries x 3 repeats in the one driver JVM,
  * inflating late queries up to 34x (text_decontaminate 29.5 s in the
  * full bench vs 0.87 s isolated). The reset unpersists every entry in
  * `sparkContext.getPersistentRDDs` (where localCheckpoint blocks are
  * registered), clears the SQL cache, and runs `System.gc()` so the
  * ContextCleaner reaps now-unreachable broadcast variables; it then
  * waits (bounded) until the block manager reports zero cached RDD
  * blocks AND zero live broadcast blocks, and FAILS the run if RDD
  * blocks survive the wait (see [[BenchReset]] — VERDICT r8 §next-8).
  * Cleanup happens OUTSIDE the timed region — timings cover exactly
  * the query's own plan + execution.
  *
  * After the sweep, every noisy-flagged entry plus the slowest-by-
  * median entries re-run ALONE (full reset before and between reps)
  * and both numbers ship in the stdout JSON (`"isolated": {...}`,
  * VERDICT r16 §next-2a) — a sweep median far above its isolated
  * median reads as 32-thread neighbor contention directly from the
  * driver artifact, no external re-run needed. The reset itself drops
  * leftover broadcast blocks EXPLICITLY through the block-manager
  * bridge instead of forcing a GC per reset (r16's 402 s collector
  * bill), and build.sbt clamps the forked heap at 24g.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "3").toInt
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
    // Scale-rehearsal knob: shrink file splits so scan parallelism
    // tracks data volume when the whole SF fits in one row group —
    // without it a 10x corpus still scans as one task and every
    // per-task cost reads as 10x (a local-file artifact, not a plan
    // property). Unset = Spark's default 128 MB.
    sys.env.get("SPARK_GRAFT_MAX_PARTITION_BYTES")
      .foreach(b => builder.config("spark.sql.files.maxPartitionBytes", b))
    // A/B knob for the corpus-sized-persist policy (see PersistPolicy):
    // 0 forces the recompute path everywhere
    sys.env.get("SPARK_GRAFT_PERSIST_MAX_BYTES")
      .foreach(b => builder.config(graft.llmdata.PersistPolicy.confKey, b))
    // A/B knob for session-conf hypothesis tests (r19 optimization
    // round): semicolon-separated k=v pairs layered over the defaults.
    // Unset in driver runs — the shipped defaults live above.
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").foreach { kv =>
      // skip empty tokens (trailing ';'); fail loudly on a pair with
      // no '=' instead of an opaque MatchError (ADVICE r19 #5)
      if (kv.trim.nonEmpty) kv.split("=", 2) match {
        case Array(k, v) => builder.config(k, v)
        case _ => sys.error(
          s"SPARK_GRAFT_EXTRA_CONF token '$kv' is not k=v")
      }
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Installed before any query so every broadcast is tracked; the
    // reset (BenchReset.resetOrFail) FAILS the run if RDD blocks ever
    // survive it — harness contamination can't silently return
    // (VERDICT r8 §next-8 + advice #3).
    val tracker = BenchReset.install(spark)
    // Optional comma-separated name filter for targeted profiling.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // JVM/codegen/parquet-footer warmup so the first timed query isn't
    // charged for one-time JIT + scan initialization (standard bench
    // hygiene; per-query numbers then reflect steady-state latency).
    try SparkEntry.queries("w_sma")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // Full inter-query storage reset — see [[BenchReset]]. Fails the
    // run (nonzero exit) if RDD blocks survive; polls broadcast blocks
    // within the same bounded wait.
    def resetStorage(): Unit = BenchReset.resetOrFail(spark, tracker)
    resetStorage()
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    // allTimes keeps EVERY repeat (VERDICT r10 §wrong-2): the side file
    // must let a reader separate noise from regression — a median of
    // 14.8 could be {14.8,14.8,14.9} (real) or {2.0,14.8,80}
    // (pathological); discarding the repeats made the two
    // indistinguishable.
    //
    // Sweep-order shuffle (VERDICT r13 §next-4): the r13 isolated A/Bs
    // proved the 2-4x sweep inflations are JVM contention, i.e. a
    // query's timing depends on its NEIGHBORS in the sweep. Running
    // repeats back-to-back gave every repeat the SAME neighbors, so
    // the median could not dodge a consistently hot position. Each
    // repeat is now a full pass over the catalog in a seeded
    // per-repeat permutation — neighbors differ across repeats, the
    // median sees three different contention contexts, and the seed is
    // reported so any sweep is reproducible.
    val orderSeed = sys.env.getOrElse("SPARK_GRAFT_ORDER_SEED", "14").toInt
    val catalog = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val timesByName = scala.collection.mutable.Map.empty[String, Vector[Double]]
    (0 until repeat).foreach { r =>
      val order = new scala.util.Random(orderSeed.toLong * 1000 + r)
        .shuffle(catalog)
      order.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        val elapsed = (System.nanoTime() - t0) / 1e9
        resetStorage() // outside the timed region: next run starts clean
        timesByName(name) = timesByName.getOrElse(name, Vector.empty) :+ elapsed
      }
    }
    val allTimes = catalog.map { case (name, _) =>
      name -> (timesByName.getOrElse(name, Vector.empty): Seq[Double])
    }
    val results = allTimes.map { case (name, times) => name -> median(times) }
    // The driver keeps only the LAST 2000 chars of the sbt log (plus
    // sbt's ~80-char success trailer), so the printed JSON must fit
    // ~1900 bytes — with 85+ queries even the key names overflow that
    // (BENCH_r05 "parsed": null). The stdout line therefore reports the
    // SLOWEST queries first (the ones perf tracking needs) up to a byte
    // budget, with an "omitted" count for the fast tail; the side file
    // always carries every query at full precision.
    def j(v: Double, prec: Int): String = BigDecimal(v)
      .setScale(prec, BigDecimal.RoundingMode.HALF_UP).bigDecimal.toPlainString
    def jsonLine(entries: Seq[(String, Double)], omitted: Int, prec: Int,
                 sf: String, extra: String = ""): String = {
      val qs = entries.map { case (k, v) => "\"" + k + "\":" + j(v, prec) }
        .mkString("{", ",", "}")
      val total = j(results.map(_._2).sum, prec)
      val om = if (omitted > 0) s""","omitted_fastest":$omitted""" else ""
      // The heap actually granted to THIS JVM and the sweep's total GC
      // time (VERDICT r15 judge item: the r14->r15 noise-band
      // attribution blamed the 8 GiB default heap, but the driver
      // artifact carried no evidence of which heap ran — now every
      // BENCH_r*.json self-reports, so heap/GC theories are checkable
      // against the driver environment, not just local reruns).
      val heapMb = Runtime.getRuntime.maxMemory / (1 << 20)
      val gcMs = {
        import scala.jdk.CollectionConverters._
        java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
          .asScala.map(b => math.max(b.getCollectionTime, 0L)).sum
      }
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"queries":$qs$om$extra,"max_heap_mb":$heapMb,"gc_ms":$gcMs,"sf":"$sf","repeat":$repeat,"order_seed":$orderSeed}"""
    }
    // Contention self-identification in the PARSED artifact (VERDICT
    // r11 §next-7): the side file carries every repeat, but the driver
    // reads only this stdout line — so queries whose repeat series is
    // NOISY (max/min >= 1.5x and a >0.3 s swing) surface their
    // [min, median, max] here. A contended sweep then shows a populated
    // "noisy" map in BENCH_r*.json instead of needing the side file.
    val noisyEntries = allTimes
      .filter { case (_, ts) =>
        ts.max - ts.min > 0.3 && ts.min > 0 && ts.max / ts.min >= 1.5
      }
      .sortBy { case (_, ts) => -(ts.max - ts.min) }
      .take(10)
    val noisy = noisyEntries
      .map { case (k, ts) =>
        "\"" + k + "\":[" + Seq(ts.min, median(ts), ts.max).map(j(_, 2)).mkString(",") + "]"
      }
    val noisyJson =
      if (noisy.isEmpty) "" else s""","noisy":${noisy.mkString("{", ",", "}")}"""
    // Full per-repeat series for the SLOWEST queries in the parsed
    // artifact (VERDICT r12 next-7): the noisy map only fires on
    // >=1.5x/0.3s swings, so a consistent-within-sweep drift (the
    // clean_pipeline class — tight repeats, wrong level) stayed
    // invisible without the side file. Top-20 slowest carry their
    // repeats here, inside the same stdout byte cap; medians for the
    // rest fill the remainder.
    val byMedian = allTimes.map { case (k, ts) => (k, ts, median(ts)) }
      .sortBy(-_._3)
    var srUsed = 0
    val slowRep = byMedian.take(20).takeWhile { case (k, ts, _) =>
      srUsed += k.length + ts.map(j(_, 2).length).sum + ts.size + 6
      srUsed <= 900
    }.map { case (k, ts, _) =>
      "\"" + k + "\":[" + ts.map(j(_, 2)).mkString(",") + "]"
    }
    val slowRepJson = if (slowRep.isEmpty) ""
      else s""","slow_repeats":${slowRep.mkString("{", ",", "}")}"""
    // Isolated self-adjudication (VERDICT r16 §next-2a): the r16
    // sweep's flagged entries ran 4-6x faster in the judge's isolated
    // re-runs — contention/GC, not plans — but the driver artifact
    // alone couldn't show that. After the sweep, every noisy-flagged
    // entry plus the slowest-by-median entries re-run ALONE (full
    // storage reset before and between reps, a quiet JVM, nothing
    // else in flight) and the stdout JSON carries both numbers: a
    // sweep median far above its isolated median now reads as sweep
    // contention directly from BENCH_r{N}.json.
    val isoRepeat = sys.env.getOrElse("SPARK_GRAFT_ISOLATED_REPEAT", "3").toInt
    // Watchlist knob (r18 sweep-vs-isolated bar): force named entries
    // into the isolated set regardless of noise/median rank, so a
    // specific adjudication question (is X's sweep number contention?)
    // is answered in the same artifact.
    val isoExtra = sys.env.get("SPARK_GRAFT_ISOLATED_EXTRA")
      .map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)
    // top-by-median entries come FIRST so the 12-entry cap can never
    // truncate them (VERDICT r18 §next-3: multimodal_dct_phash_dedup
    // was a top-5 cost with no isolated row because 10 noisy entries
    // filled the cap first); noisy-flagged entries fill the remainder
    val isoTargets =
      if (sys.env.get("SPARK_GRAFT_ISOLATED").contains("0")) Seq.empty
      else (byMedian.take(6).map(_._1) ++ noisyEntries.map(_._1))
        .distinct.take(12) ++ isoExtra.filterNot(
          (byMedian.take(6).map(_._1) ++ noisyEntries.map(_._1))
            .distinct.take(12).toSet)
    val isolated = isoTargets.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        resetStorage()
        val ts = (0 until isoRepeat).map { _ =>
          val t0 = System.nanoTime()
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch { case e: Throwable =>
            System.err.println(s"[bench] isolated $name failed: ${e.getMessage}")
          }
          val el = (System.nanoTime() - t0) / 1e9
          resetStorage()
          el
        }
        name -> median(ts)
      }
    }
    val isolatedJson = if (isolated.isEmpty) ""
      else s""","isolated":${isolated.map { case (k, v) =>
        "\"" + k + "\":" + j(v, 3) }.mkString("{", ",", "}")}"""
    val bySlowest = results.sortBy(-_._2)
    val budget = 1750 - noisyJson.length - slowRepJson.length - isolatedJson.length
    var used = 0
    val kept = bySlowest.takeWhile { case (k, v) =>
      used += k.length + j(v, 3).length + 4
      used <= budget
    }
    println(jsonLine(kept, results.size - kept.size, 3,
      new java.io.File(sfDir).getName,
      noisyJson + slowRepJson + isolatedJson))
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/graft_bench.json")
    // Side file carries the full per-repeat series alongside the
    // medians ("repeats": {"q": [t1, t2, ...], ...}) — see allTimes.
    val repeatsJson = allTimes.map { case (k, ts) =>
      "\"" + k + "\":[" + ts.map(j(_, 9)).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val sideLine = jsonLine(results, 0, 9, sfDir).dropRight(1) +
      isolatedJson + s""","repeats":$repeatsJson}"""
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      sideLine + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
