package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-query cost-anatomy probe (optimization-round dev tool, the
  * [[ProbeV6]] convention): for each named catalog entry, splits the
  * bench's timed region into
  *
  *   construct — `fn(spark, sfDir)` (plan building; includes any eager
  *               collect jobs a query runs at construction time),
  *   execute   — the noop write (optimize + codegen + run),
  *
  * and reports the job/stage/task counts the query submitted — the
  * numbers that say whether an entry is data-bound or overhead-bound
  * (guide §1: decide WHERE the time goes before touching anything).
  *
  * Usage: runMain graft.ProbeQuery <sfDir> <name,name,...> [repeat]
  */
object ProbeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("curation_pipeline_v5"))
    val repeat = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
    // A/B knob: semicolon-separated k=v extra confs for hypothesis tests
    sys.env.get("SPARK_GRAFT_PROBE_CONF").foreach(_.split(";").foreach { kv =>
      // tolerate empty tokens; loud fail on a token without '='
      if (kv.trim.nonEmpty) kv.split("=", 2) match {
        case Array(k, v) => builder.config(k, v)
        case _ => sys.error(
          s"SPARK_GRAFT_PROBE_CONF token '$kv' is not k=v")
      }
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tracker = BenchReset.install(spark)

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
      }
    })

    // session warmup (the bench's own convention)
    try SparkEntry.queries("w_sma")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    BenchReset.resetOrFail(spark, tracker)

    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        (1 to repeat).foreach { r =>
          jobs = 0; stages = 0; tasks = 0
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          val t1 = System.nanoTime()
          val cJobs = jobs
          df.write.format("noop").mode("overwrite").save()
          val t2 = System.nanoTime()
          println(f"[probe] $name%-34s rep=$r construct=${(t1 - t0) / 1e9}%6.2f s " +
            f"(jobs=$cJobs) execute=${(t2 - t1) / 1e9}%6.2f s " +
            f"total_jobs=$jobs stages=$stages tasks=$tasks")
          BenchReset.resetOrFail(spark, tracker)
        }
      }
    }
    spark.stop()
  }
}
