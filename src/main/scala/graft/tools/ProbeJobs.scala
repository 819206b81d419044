package graft.tools

import graft.{GraftSession, SparkEntry, Tables}
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev-only: run named queries with a job/stage listener — prints per-job
  * wall time, stage task-time sums and shuffle bytes, so the expensive
  * job/stage of a multi-job query is visible without the UI (guide §7.1;
  * spark.ui is disabled in this sandbox). Warm-up mirrors Bench (tables
  * counted once, run1 discarded, min of 3 timed cold runs reported,
  * per-job breakdown printed for the LAST run).
  * Usage: runMain graft.tools.ProbeJobs <query> [query...]
  */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("probe-jobs")
    Tables.all.foreach(n => Tables.t(spark, dir, n).count())
    case class JobRec(id: Int, var desc: String = "", var t0: Long = 0L,
                      var t1: Long = 0L, var taskTime: Long = 0L,
                      var shufRead: Long = 0L, var shufWrite: Long = 0L,
                      var nTasks: Int = 0)
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val stageToJob = mutable.HashMap.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val r = JobRec(e.jobId)
        r.desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        r.t0 = e.time
        jobs.synchronized { jobs(e.jobId) = r }
        e.stageIds.foreach(sid => stageToJob.synchronized { stageToJob(sid) = e.jobId })
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.t1 = e.time) }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val jid = stageToJob.synchronized { stageToJob.get(e.stageId) }
        jid.foreach { j =>
          jobs.synchronized {
            jobs.get(j).foreach { r =>
              r.nTasks += 1
              if (e.taskMetrics != null) {
                r.taskTime += e.taskMetrics.executorRunTime
                r.shufRead += e.taskMetrics.shuffleReadMetrics.totalBytesRead
                r.shufWrite += e.taskMetrics.shuffleWriteMetrics.bytesWritten
              }
            }
          }
        }
      }
    }
    for (name <- args) {
      val fn = SparkEntry.queries(name)
      spark.catalog.clearCache()
      fn(spark, dir).count() // run1: codegen/JIT warmup, discarded
      val times = (1 to 3).map { i =>
        spark.catalog.clearCache()
        jobs.synchronized { jobs.clear() }
        if (i == 3) spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        if (i == 3) {
          // let straggler listener events drain
          Thread.sleep(300)
          spark.sparkContext.removeSparkListener(listener)
        }
        dt
      }
      println(f"[probejobs] $name min=${times.min}%.3f s runs=${times.map(t => f"$t%.2f").mkString(",")}")
      jobs.synchronized {
        jobs.values.foreach { r =>
          println(f"[probejobs]   job ${r.id}%3d wall=${(r.t1 - r.t0) / 1e3}%6.3f s taskSum=${r.taskTime / 1e3}%7.3f s tasks=${r.nTasks}%4d shufR=${r.shufRead / 1e6}%8.2f MB shufW=${r.shufWrite / 1e6}%8.2f MB ${r.desc.take(60)}")
        }
      }
    }
    spark.stop()
  }
}
