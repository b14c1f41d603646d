package graft

import org.apache.spark.sql.SparkSession

/** One-off scale-rehearsal main for the kc∝n measurement (VERDICT r13
  * §next-3): times `AnnSearch.knnMutual` at a CALLER-CHOSEN centroid
  * count so the graph family's "production scales kc with n so
  * occupancy stays bounded" contract can be measured AT kc∝n (a
  * 10×-data, 10×-kc point) instead of extrapolated from the fixed-kc
  * runs. Dev tool in the Explain/Bench family — not part of the
  * library surface.
  *
  * Usage: runMain graft.RehearseKc <sfDir> <kc> [repeat] [op]
  * where op ∈ {mutual (default), labelprop, transitivity} —
  * labelprop measures the one-step propagation tail over the same
  * kc-parameterized graph (the r14 `weak` closure:
  * `ann_label_prop_scaled`'s kc∝n point); transitivity measures the
  * global-clustering rollup (`ann_graph_global_clustering_scaled`'s
  * kc∝n point — its fixed-kc sibling measured 90× for 10×).
  * Prints one JSON line {"dir":…,"kc":…,"op":…,"times":[…],"median":…}.
  */
object RehearseKc {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val kc = args(1).toInt
    val repeat = args.lift(2).map(_.toInt).getOrElse(3)
    val op = args.lift(3).getOrElse("mutual")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_MAX_PARTITION_BYTES")
      .foreach(b => builder.config("spark.sql.files.maxPartitionBytes", b))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tracker = BenchReset.install(spark)
    val times = (1 to repeat).map { _ =>
      val t0 = System.nanoTime()
      val emb = QuerySupport.table(spark, dir, "embeddings")
      val out = op match {
        case "labelprop" => llmdata.AnnSearch.labelPropagation(
          emb, llmdata.LlmDataParams.annK, kc = kc)
        case "transitivity" => llmdata.AnnSearch.globalClustering(
          emb, llmdata.LlmDataParams.annK, kc = kc)
        case _ => llmdata.AnnSearch.knnMutual(
          emb, llmdata.LlmDataParams.annK, kc = kc)
      }
      out.write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      BenchReset.resetOrFail(spark, tracker)
      t
    }
    val s = times.sorted
    val med = if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    println(f"""{"dir":"$dir","kc":$kc,"op":"$op","times":[${times.map(t => f"$t%.2f").mkString(",")}],"median":$med%.2f}""")
    spark.stop()
  }
}
