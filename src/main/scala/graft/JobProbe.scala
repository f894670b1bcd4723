package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: run one named query and attribute its wall clock to the
  * Spark JOBS it submits — the measurement §1 of the optimization guide
  * asks for when a query is a multi-action operator (ACID DML, chains,
  * incremental views) rather than one plan. Prints, per job: duration,
  * stage count, task count, shuffle read/write bytes, and the job
  * description/callsite, plus the gaps between jobs (driver-side work:
  * planning, log replay, commit fs ops).
  *
  * Usage: JobProbe <sfDir> <queryName> [runs]
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val runs = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class JobRec(id: Int, start: Long, var end: Long = -1L,
      var desc: String = "", var stages: Int = 0, var tasks: Int = 0,
      var shufR: Long = 0L, var shufW: Long = 0L, var inB: Long = 0L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val r = JobRec(e.jobId, e.time)
        r.desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        r.stages = e.stageIds.size
        jobs.put(e.jobId, r); order.add(e.jobId)
        e.stageIds.foreach(sid => stageToJob.put(sid, e.jobId))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val r = jobs.get(e.jobId); if (r != null) r.end = e.time
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val jid = stageToJob.getOrDefault(e.stageInfo.stageId, -1)
        val r = jobs.get(jid)
        if (r != null) {
          r.tasks += e.stageInfo.numTasks
          r.shufR += e.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
          r.shufW += e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
          r.inB += e.stageInfo.taskMetrics.inputMetrics.bytesRead
        }
      }
    }

    // warmup (JIT, codegen, classloading) at the smallest SF
    // warmup dir defaults to the sandbox's smallest SF but is
    // overridable, so the tool works on any machine/layout (ADVICE r18)
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR",
      "/root/testdata/sf0.001")
    SparkEntry.queries(name)(spark, warmDir)
      .write.format("noop").mode("overwrite").save()
    graft.queries.Handoff.releaseAll()
    spark.catalog.clearCache()

    // In-process sampling profiler (attach/SIGQUIT are unavailable in the
    // sandbox): every 50 ms aggregate the top in-Spark frame of every
    // RUNNABLE thread, bucketed by thread family. SPARK_GRAFT_PROFILE=1.
    val profile = sys.env.get("SPARK_GRAFT_PROFILE").contains("1")
    val hot = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        try {
          val all = Thread.getAllStackTraces
          all.forEach { (t, st) =>
            if (t.getState == Thread.State.RUNNABLE && st.nonEmpty &&
                t.getName != "jobprobe-sampler") {
              val fam =
                if (t.getName.startsWith("Executor task launch")) "exec"
                else if (t.getName == "main") "main"
                else if (t.getName.contains("dag-scheduler")) "dag"
                else "other"
              if (fam != "other") {
                val frame = st.find { e =>
                  val c = e.getClassName
                  (c.startsWith("org.apache.spark") || c.startsWith("graft") ||
                   c.startsWith("org.codehaus") || c.startsWith("org.apache.parquet")) &&
                  !c.contains("Waiter")
                }.orElse(st.headOption)
                  .map(e => s"${e.getClassName.split("\\.").takeRight(2).mkString(".")}.${e.getMethodName}")
                  .getOrElse("?")
                hot.computeIfAbsent(s"$fam | $frame",
                  _ => new java.util.concurrent.atomic.AtomicLong()).incrementAndGet()
              }
            }
          }
        } catch { case _: Throwable => () }
        Thread.sleep(50)
      }
    }, "jobprobe-sampler")
    if (profile) { sampler.setDaemon(true); sampler.start() }

    (1 to runs).foreach { i =>
      jobs.clear(); order.clear(); stageToJob.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      // settle: listener events are async; give the bus a moment
      Thread.sleep(300)
      val ids = {
        val b = scala.collection.mutable.ArrayBuffer.empty[Int]
        order.forEach(id => b += id); b.toSeq
      }
      println(f"== $name run$i wall=${wall}%.3fs jobs=${ids.size} ==")
      var prevEnd = -1L
      var jobSum = 0.0
      ids.foreach { id =>
        val r = jobs.get(id)
        if (r != null && r.end > 0) {
          val dur = (r.end - r.start) / 1e3
          val gap = if (prevEnd > 0) (r.start - prevEnd) / 1e3 else 0.0
          jobSum += dur
          if (gap > 0.005)
            println(f"   -- gap ${gap}%7.3fs (driver-side)")
          println(f"  job ${r.id}%3d ${dur}%7.3fs stages=${r.stages}%2d tasks=${r.tasks}%4d " +
            f"in=${r.inB / 1024}%6dKB sr=${r.shufR / 1024}%5dKB sw=${r.shufW / 1024}%5dKB  ${r.desc.take(100)}")
          prevEnd = r.end
        }
      }
      println(f"  [job time sum=${jobSum}%.3fs; non-job (plan/driver) ≈ ${wall - jobSum}%.3fs]")
      graft.queries.Handoff.releaseAll()
      spark.catalog.clearCache()
    }
    if (profile) {
      sampling = false
      println("== hot frames (50ms samples, RUNNABLE, by thread family) ==")
      import scala.jdk.CollectionConverters._
      hot.asScala.toSeq.sortBy(-_._2.get).take(40).foreach { case (k, v) =>
        println(f"  ${v.get}%5d  $k")
      }
    }
    spark.stop()
  }
}
