package graft.streaming

import graft.{SparkSpec, Tables}
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** End-to-end integration: file source → stream-stream interval join →
  * IdempotentSink, with a mid-stream kill and a restart from the same
  * checkpoint. The committed sink contents must equal the batch oracle
  * on the same real testdata exactly once — no dropped and no duplicated
  * join rows, whatever batch the kill interrupted.
  *
  * This is the missing file-backed proof beside the MemoryStream
  * batch↔stream equivalence specs: offsets tracked by the file source,
  * batch replay after restart, and the sink's commit-marker protocol all
  * exercised against real parquet input.
  */
class FileStreamIntegrationSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("file source → intervalJoin → IdempotentSink survives kill+restart exactly-once") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("graft-fstream").toString
    val leftDir = s"$base/left"; val rightDir = s"$base/right"
    val sink = s"$base/sink"; val ckpt = s"$base/ckpt"

    // real testdata: purchases join clicks of the same user within 1h.
    // ts → TIMESTAMP for watermarking (BIGINT nanos → micros).
    val ev = Tables.t(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      .select("event_id", "user_id", "event_type", "ts")
    // chunked parquet files so the file source delivers several
    // micro-batches (maxFilesPerTrigger=1). Chunks are random slices of
    // the whole time range, so the watermark delay must exceed the data
    // span or later chunks' old rows are (correctly) dropped as late —
    // this spec proves exactly-once delivery, not late-data policy.
    ev.filter($"event_type" === "purchase").repartition(6)
      .write.parquet(leftDir)
    ev.filter($"event_type" === "click").repartition(6)
      .write.parquet(rightDir)
    val schema = spark.read.parquet(leftDir).schema

    def joined(l: DataFrame, r: DataFrame): DataFrame =
      StreamOps.intervalJoin(l, r, "user_id", "ts",
          watermark = "400 days", horizonMs = 3600000L)
        .select(col("l.event_id").as("lid"), col("r.event_id").as("rid"))

    def startQuery(trigger: Trigger) = {
      def src(dir: String) = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(dir)
      joined(src(leftDir), src(rightDir))
        .writeStream
        .foreachBatch { (df: DataFrame, id: Long) =>
          IdempotentSink.writeBatch(sink)(df, id); ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append)
        .trigger(trigger)
        .start()
    }

    // run 1: continuous micro-batches; kill after ≥2 commits land
    val q1 = startQuery(Trigger.ProcessingTime(0L))
    val deadline = System.nanoTime() + 120L * 1000000000L
    while (IdempotentSink.committedBatches(spark, sink).size < 2 &&
        System.nanoTime() < deadline && q1.isActive) Thread.sleep(100)
    val committedAtKill = IdempotentSink.committedBatches(spark, sink).size
    q1.stop() // the kill: whatever batch was in flight is abandoned
    assert(committedAtKill >= 2, s"wanted ≥2 commits before kill, got $committedAtKill")

    // run 2: restart from the same checkpoint, drain the rest
    val q2 = startQuery(Trigger.AvailableNow())
    q2.awaitTermination(120000L)
    assert(!q2.isActive, "restarted query did not drain")

    val got = IdempotentSink.readCommitted(spark, sink)
      .as[(Long, Long)].collect().sorted.toSeq
    val lb = spark.read.parquet(leftDir).alias("l")
    val rb = spark.read.parquet(rightDir).alias("r")
    val oracle = lb.join(rb,
        $"l.user_id" === $"r.user_id" && $"r.ts" >= $"l.ts" &&
          $"r.ts" <= $"l.ts" + expr("INTERVAL 3600000 MILLISECONDS"))
      .select($"l.event_id".as("lid"), $"r.event_id".as("rid"))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(oracle.nonEmpty, "batch oracle is empty — test data too thin")
    assert(got == oracle,
      s"exactly-once violated: stream ${got.size} rows vs batch ${oracle.size}")
    info(s"${got.size} join rows exactly-once across " +
      s"${IdempotentSink.committedBatches(spark, sink).size} committed batches " +
      s"($committedAtKill before the kill)")
  }
}
