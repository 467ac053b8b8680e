package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only per-query profiler for the optimization rounds (not part of
  * the declared surface): runs named declared queries under the bench's
  * exact measurement action (`queryExecution.toRdd.count()` after a
  * session-cache clear), records every Spark JOB the pass launches
  * (duration, stage/task counts, shuffle bytes) via a listener, and
  * optionally dumps `explain("formatted")` to a plans dir — the
  * evidence files OPTIMIZATION_r*.md cites.
  *
  * Usage:
  *   runMain graft.tools.QueryProfile <sfDir> <plansDir|-> <suffix> <query...>
  *
  * plansDir "-" skips plan dumps; otherwise each query's formatted plan
  * lands at `<plansDir>/<query>_<suffix>.txt`.
  */
object QueryProfile {

  private final case class JobRow(id: Int, desc: String, sec: Double,
      stages: Int, tasks: Int, shuffleReadMB: Double,
      shuffleWriteMB: Double, cpuSec: Double, runSec: Double,
      deserSec: Double)

  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: QueryProfile <sfDir> <plansDir|-> <suffix> <query...>")
    val sfDir = args(0)
    val plansDir = if (args(1) == "-") None else Some(args(1))
    val suffix = args(2)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PROFILE_PASSES", "2").toInt
    val builder = graft.engine.GraftSession.staticConfs
      .foldLeft(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")) {
        case (b, (k, v)) => b.config(k, v)
      }
    // static (context-creation-time) conf overrides, "k=v,k=v"
    sys.env.get("SPARK_GRAFT_BUILD_CONF")
      .foreach(_.split(",").foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k.trim, v.trim)
      })
    val spark = builder.getOrCreate()
    graft.engine.GraftSession.tune(spark)
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(",").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k.trim, v.trim)
    })
    spark.sparkContext.setLogLevel("ERROR")
    // same JVM warmup as Bench so pass-1 numbers are comparable
    spark.range(1000).selectExpr("sum(id)").collect()
    try {
      graft.engine.Tables.load(spark, sfDir, "lineitem").count()
      val d = graft.engine.Tables.load(spark, sfDir, "documents").limit(64)
      graft.ext.Dedup.jaccardPairsIndexHashed(d, 3, 0.5).count()
      graft.ext.Dedup.sourceOverlap(d, 3).count()
    } catch { case _: Throwable => () }

    final case class JAcc(desc: String, t0: Long) {
      val stages = new java.util.concurrent.atomic.AtomicInteger(0)
      val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
      val shufR = new java.util.concurrent.atomic.AtomicLong(0L)
      val shufW = new java.util.concurrent.atomic.AtomicLong(0L)
      val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
      val runMs = new java.util.concurrent.atomic.AtomicLong(0L)
      val deserMs = new java.util.concurrent.atomic.AtomicLong(0L)
    }
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JAcc]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[JobRow]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        val acc = JAcc(desc, e.time)
        acc.stages.set(e.stageIds.size)
        jobs.put(e.jobId, acc)
        e.stageIds.foreach(sid => stageToJob.put(sid, e.jobId))
      }
      override def onStageCompleted(
          e: SparkListenerStageCompleted): Unit = {
        val jid = stageToJob.get(e.stageInfo.stageId)
        val j = jobs.get(jid)
        if (j != null) {
          j.tasks.addAndGet(e.stageInfo.numTasks)
          j.shufR.addAndGet(e.stageInfo.taskMetrics.shuffleReadMetrics
            .totalBytesRead)
          j.shufW.addAndGet(e.stageInfo.taskMetrics.shuffleWriteMetrics
            .bytesWritten)
          j.cpuNs.addAndGet(e.stageInfo.taskMetrics.executorCpuTime)
          j.runMs.addAndGet(e.stageInfo.taskMetrics.executorRunTime)
          j.deserMs.addAndGet(
            e.stageInfo.taskMetrics.executorDeserializeTime)
        }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.remove(e.jobId)
        if (j != null)
          done.add(JobRow(e.jobId, j.desc, (e.time - j.t0) / 1e3,
            j.stages.get, j.tasks.get, j.shufR.get / 1e6,
            j.shufW.get / 1e6, j.cpuNs.get / 1e9, j.runMs.get / 1e3,
            j.deserMs.get / 1e3))
      }
    })

    def clearCaches(): Unit = {
      graft.ext.Similarity.invalidateTrainedCentroids()
      graft.ext.Similarity.invalidateKnnEdges()
      graft.ext.Dedup.invalidateDedupArtifacts()
      graft.ext.TextAnalysis.invalidateEntropyCache()
      spark.catalog.clearCache()
    }

    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      var lastPlan: String = ""
      (1 to passes).foreach { p =>
        clearCaches()
        done.clear()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val planned = System.nanoTime()
        df.queryExecution.toRdd.count()
        val t1 = System.nanoTime()
        org.apache.spark.graft.MetricsBridge
          .drainListenerBus(spark.sparkContext, 10000L)
        val rows = done.toArray(Array.empty[JobRow]).sortBy(_.id)
        println(f"== $name pass $p: ${(t1 - t0) / 1e9}%.2f s " +
          f"(plan-build ${(planned - t0) / 1e9}%.2f s, " +
          f"${rows.length} jobs, " +
          f"job-sum ${rows.map(_.sec).sum}%.2f s, " +
          f"cpu-sum ${rows.map(_.cpuSec).sum}%.2f s)")
        rows.filter(_.sec >= 0.005).foreach { r =>
          println(f"   job ${r.id}%4d ${r.sec}%7.3f s  " +
            f"cpu=${r.cpuSec}%7.3f run=${r.runSec}%7.3f " +
            f"deser=${r.deserSec}%6.3f " +
            f"st=${r.stages}%2d tk=${r.tasks}%4d " +
            f"shR=${r.shuffleReadMB}%7.2f shW=${r.shuffleWriteMB}%7.2f  ${r.desc.take(80)}")
        }
        if (p == passes) {
          // the executed plan AFTER the run (AQE final shape where it
          // applies to the last action's plan object)
          lastPlan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        }
      }
      plansDir.foreach { dir =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(dir, s"${name}_$suffix.txt"), lastPlan)
        println(s"   plan -> $dir/${name}_$suffix.txt")
      }
    }
    spark.stop()
  }
}
