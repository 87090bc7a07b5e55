package graft.tools

import scala.collection.mutable
import org.apache.spark.scheduler._

/** Job-level breakdown of ONE catalog query's timed run — the empirical
  * half of the optimization loop (guide §1.1) with the UI disabled: a
  * SparkListener records every job's wall time, stage count, task count,
  * and the summed task metrics that tell shuffle/fetch/GC costs apart
  * from compute. Usage:
  *   SPARK_GRAFT_SF_DIR=... runMain graft.tools.JobProfile <reps> <query>...
  * One untimed warm-up absorbs codegen/JIT/footers (Bench methodology),
  * then the profiled run prints one line per job in submission order plus
  * a totals row. Driver-side gaps (planning, broadcast builds, pure
  * driver work between jobs) show up as the difference between the run's
  * wall time and the sum of job walls — printed explicitly, since at gate
  * scale Catalyst planning and per-job scheduling are real costs the job
  * rows alone would hide. */
object JobProfile {

  private final case class JobRow(
      jobId: Int, desc: String, submitted: Long,
      var completed: Long = 0L, var nStages: Int = 0, var nTasks: Int = 0,
      var taskTimeMs: Long = 0L, var gcMs: Long = 0L,
      var shuffleReadB: Long = 0L, var shuffleWriteB: Long = 0L,
      var fetchWaitMs: Long = 0L, var inputB: Long = 0L)

  def main(args: Array[String]): Unit = {
    val reps = args.head.toInt
    val names = args.tail.toSeq
    val sfDir = BenchSession.sfDir
    val spark = BenchSession.build()

    val jobs = mutable.LinkedHashMap.empty[Int, JobRow]
    val stageToJob = mutable.HashMap.empty[Int, Int]
    var recording = false
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = if (recording) {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        jobs.synchronized {
          jobs(j.jobId) = JobRow(j.jobId, desc, j.time)
          j.stageIds.foreach(s => stageToJob(s) = j.jobId)
        }
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(j.jobId).foreach(_.completed = j.time)
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          for (jid <- stageToJob.get(s.stageInfo.stageId);
               row <- jobs.get(jid)) {
            row.nStages += 1
            row.nTasks += s.stageInfo.numTasks
            val m = s.stageInfo.taskMetrics
            if (m != null) {
              row.taskTimeMs += m.executorRunTime
              row.gcMs += m.jvmGCTime
              row.shuffleReadB += m.shuffleReadMetrics.totalBytesRead
              row.shuffleWriteB += m.shuffleWriteMetrics.bytesWritten
              row.fetchWaitMs += m.shuffleReadMetrics.fetchWaitTime
              row.inputB += m.inputMetrics.bytesRead
            }
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def run(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      spark.catalog.clearCache(); System.gc()
      run() // warm-up (untimed, unrecorded)
      spark.catalog.clearCache(); System.gc()
      var best = Double.MaxValue
      (1 to reps).foreach { r =>
        jobs.synchronized { jobs.clear(); stageToJob.clear() }
        recording = true
        val wall = run()
        recording = false
        // let stragglers' listener events drain before reading the map
        Thread.sleep(200)
        if (wall < best) best = wall
        println(f"== $name rep $r: wall ${wall}%.3f s ==")
        var jobWallSum = 0.0
        jobs.synchronized {
          jobs.values.toSeq.sortBy(_.submitted).foreach { j =>
            val w = (j.completed - j.submitted) / 1e3
            jobWallSum += math.max(w, 0)
            println(f"job ${j.jobId}%4d ${w}%7.3f s  stages=${j.nStages}%2d tasks=${j.nTasks}%4d " +
              f"taskTime=${j.taskTimeMs / 1e3}%7.2f s gc=${j.gcMs / 1e3}%5.2f " +
              f"shufR=${j.shuffleReadB / 1024}%8d KB shufW=${j.shuffleWriteB / 1024}%8d KB " +
              f"fetchWait=${j.fetchWaitMs / 1e3}%5.2f in=${j.inputB / 1024}%8d KB  ${j.desc.take(60)}")
          }
          println(f"== jobs=${jobs.size} jobWallSum=${jobWallSum}%.3f s driverGap=${wall - jobWallSum}%.3f s ==")
        }
      }
      println(f"== $name best wall over $reps reps: ${best}%.3f s ==")
    }
    spark.stop()
  }
}
