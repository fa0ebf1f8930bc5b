package graft.tools

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev utility: run registered queries through the noop sink (the bench
  * action) with a listener that prints per-job wall time, stage count and
  * task count — the breakdown that tells a perf pass whether a query's
  * time is data work or fixed job/stage overhead. Two timed executions
  * per query (the second is the steady state the bench min reports).
  * Usage: JobProbe <query> [query...]; env as ExplainDump. Not part of
  * the driver contract. */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class Job(id: Int, desc: String, start: Long,
                         var end: Long = 0L, var stages: Int = 0,
                         var tasks: Int = 0)
    val jobs = mutable.LinkedHashMap[Int, Job]()
    val stageToJob = mutable.HashMap[Int, Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .filter(_.nonEmpty)
          .orElse(e.stageInfos.lastOption.map(_.name.takeWhile(_ != '+')))
          .getOrElse("")
        jobs.synchronized {
          jobs(e.jobId) = Job(e.jobId, desc.take(60), e.time)
          e.stageIds.foreach(s => stageToJob(s) = e.jobId)
        }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          stageToJob.get(e.stageInfo.stageId).foreach { j =>
            jobs.get(j).foreach { job =>
              job.stages += 1
              job.tasks += e.stageInfo.numTasks
            }
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    // warm-up (classloading, codegen cache seeds) outside the report
    try graft.SparkEntry.queries("q_head")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    for (q <- args) {
      for (pass <- 1 to 2) {
        jobs.synchronized { jobs.clear(); stageToJob.clear() }
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(q)(spark, sfDir)
        val tBuilt = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val tDone = System.nanoTime()
        Thread.sleep(300) // let the listener bus drain
        println(f"===== $q pass $pass: build ${(tBuilt - t0) / 1e9}%.3f s, " +
          f"execute ${(tDone - tBuilt) / 1e9}%.3f s")
        jobs.synchronized {
          val js = jobs.values.toSeq
          println(f"  jobs=${js.size} stages=${js.map(_.stages).sum} " +
            f"tasks=${js.map(_.tasks).sum} " +
            f"jobwall=${js.map(j => (j.end - j.start) / 1e3).sum}%.2f s")
          for (j <- js.sortBy(jj => -(jj.end - jj.start)).take(12))
            println(f"    job ${j.id}%3d ${(j.end - j.start) / 1e3}%7.3f s " +
              f"stages=${j.stages}%2d tasks=${j.tasks}%4d ${j.desc}")
          // chronological timeline on pass 2 (the steady state): the gap
          // column is driver-side think time (planning, catalog ops)
          // between the previous job's end and this job's start — the
          // part no task-level tuning can touch
          if (pass == 2 && sys.env.get("JOBPROBE_TIMELINE").contains("1")) {
            val ordered = js.sortBy(_.start)
            var prevEnd = 0L
            println("  -- timeline (gap = driver think time before job) --")
            for (j <- ordered) {
              val gap = if (prevEnd == 0L) 0.0 else (j.start - prevEnd) / 1e3
              println(f"    t job ${j.id}%3d gap ${gap}%6.3f run " +
                f"${(j.end - j.start) / 1e3}%6.3f tasks=${j.tasks}%4d ${j.desc}")
              prevEnd = math.max(prevEnd, j.end)
            }
          }
        }
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
