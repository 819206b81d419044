package graft.tools

import java.util.concurrent.atomic.AtomicLong

import graft.{GraftSession, SparkEntry, Tables}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Dev-only memory-pressure audit (SURVEY §5): rerun the slowest queries
  * on the sf1 mirror with the JVM heap HALVED (pass SPARK_DRIVER_MEM=8g
  * through tools/runjava.sh vs the bench's 16g) and record, per query:
  * wall seconds, shuffle/agg spill bytes (memory + disk), and whether it
  * completed. 100 TB executors see spill long before they see row-count
  * trouble — a query that can only pass with the full heap is hiding a
  * driver-side accumulation or an unbounded hash build.
  *
  * Usage: ProbeMemPressure q300_cc_size_histogram q33_dedup_ngram_jaccard …
  * (no args = the whole registry; SPARK_GRAFT_SF_DIR picks the mirror).
  * Output: one JSON line per query + a `{"metric":"mem_pressure"…}` tail.
  */
object ProbeMemPressure {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("probe-mem-pressure")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val memSpill = new AtomicLong(0L)
    val diskSpill = new AtomicLong(0L)
    val peakExec = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
          peakExec.updateAndGet(p => math.max(p, m.peakExecutionMemory))
        }
      }
    })
    Tables.all.foreach(n => Tables.t(spark, dir, n).count())
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    var failed = 0
    val rows = names.map { name =>
      val fn = SparkEntry.queries(name)
      spark.catalog.clearCache()
      memSpill.set(0L); diskSpill.set(0L); peakExec.set(0L)
      val t0 = System.nanoTime()
      val ok = try { fn(spark, dir).count(); true }
      catch { case e: Throwable =>
        System.err.println(s"[mem] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
        failed += 1; false
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; give the bus a beat so the
      // final tasks' spill lands in this query's bucket, not the next
      // one's (listenerBus is private[spark] — reflection, dev tool only)
      try {
        val bus = spark.sparkContext.getClass
          .getMethod("listenerBus").invoke(spark.sparkContext)
        bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      } catch { case _: Throwable => Thread.sleep(500) }
      val line = f"""{"q":"$name","ok":$ok,"wall_s":$dt%.2f,"spill_mem_b":${memSpill.get},"spill_disk_b":${diskSpill.get},"peak_exec_mem_b":${peakExec.get}}"""
      println(line)
      line
    }
    println(s"""{"metric":"mem_pressure","sf":"$dir","heap":"${Runtime.getRuntime.maxMemory() / (1L << 20)}m","n":${rows.size},"failed":$failed}""")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
