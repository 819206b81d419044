package graft.streaming

import graft.{SparkSpec, Tables}
import java.nio.file.Files
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Deterministic reproduction of the exactly-once torn window.
  *
  * IdempotentSink's commit protocol has exactly one vulnerable interval:
  * the sink marker for batch n has been created, but the engine's
  * checkpoint commit for n has not yet landed. A crash there means the
  * restart REPLAYS batch n into foreachBatch with the marker already
  * present. The sink must skip the WRITE but still EVALUATE the batch —
  * a stateful upstream (here a stream-stream interval join, 4 state
  * stores × shuffle partitions) expects every store to commit on every
  * micro-batch run, and an unevaluated replay dies with
  * STATE_STORE_COMMIT_VALIDATION_FAILED, wedging the stream permanently.
  *
  * FileStreamIntegrationSpec only hits this window by kill-timing luck.
  * This spec manufactures it deterministically: drain the stream fully,
  * then delete the engine's LAST checkpoint commit file while keeping the
  * sink marker — byte-for-byte the on-disk state a crash inside the
  * window leaves behind — and restart.
  */
class TornWindowReplaySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("replayed already-committed batch drains state stores and stays exactly-once") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("graft-torn").toString
    val leftDir = s"$base/left"; val rightDir = s"$base/right"
    val sink = s"$base/sink"; val ckpt = s"$base/ckpt"

    val ev = Tables.t(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      .select("event_id", "user_id", "event_type", "ts")
    ev.filter($"event_type" === "purchase").repartition(3).write.parquet(leftDir)
    ev.filter($"event_type" === "click").repartition(3).write.parquet(rightDir)
    val schema = spark.read.parquet(leftDir).schema

    def startQuery() = {
      def src(dir: String) = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(dir)
      StreamOps.intervalJoin(src(leftDir), src(rightDir), "user_id", "ts",
          watermark = "400 days", horizonMs = 3600000L)
        .select(col("l.event_id").as("lid"), col("r.event_id").as("rid"))
        .writeStream
        .foreachBatch { (df: DataFrame, id: Long) =>
          IdempotentSink.writeBatch(sink)(df, id); ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append)
        .trigger(Trigger.AvailableNow())
        .start()
    }

    // run 1: drain everything; every batch is now marker-committed in the
    // sink AND commit-logged in the checkpoint.
    val q1 = startQuery()
    q1.awaitTermination(120000L)
    assert(!q1.isActive, "first run did not drain")
    val committed = IdempotentSink.committedBatches(spark, sink)
    assert(committed.size >= 2, s"wanted ≥2 batches, got ${committed.size}")

    // Manufacture the torn window: erase the engine's record that the
    // last batch committed. The sink marker for it stays. This is the
    // exact on-disk state of a crash between marker creation and the
    // checkpoint commit write.
    val hfs = FileSystem.get(spark.sessionState.newHadoopConf())
    val engineCommits = hfs.listStatus(new Path(s"$ckpt/commits")).toSeq
      .map(_.getPath).filter(_.getName.forall(_.isDigit))
    val last = engineCommits.maxBy(_.getName.toLong)
    assert(hfs.delete(last, false), s"could not delete $last")

    // run 2: the engine replays the last batch into foreachBatch with the
    // sink marker already present. awaitTermination throws the
    // StreamingQueryException (STATE_STORE_COMMIT_VALIDATION_FAILED) if
    // the sink skips evaluation instead of draining.
    val q2 = startQuery()
    q2.awaitTermination(120000L)
    assert(!q2.isActive, "restarted query did not drain the replayed batch")
    assert(q2.exception.isEmpty, s"replay failed: ${q2.exception}")

    // exactly-once: the replay wrote nothing new.
    val got = IdempotentSink.readCommitted(spark, sink)
      .as[(Long, Long)].collect().sorted.toSeq
    val oracle = spark.read.parquet(leftDir).alias("l")
      .join(spark.read.parquet(rightDir).alias("r"),
        $"l.user_id" === $"r.user_id" && $"r.ts" >= $"l.ts" &&
          $"r.ts" <= $"l.ts" + expr("INTERVAL 3600000 MILLISECONDS"))
      .select($"l.event_id".as("lid"), $"r.event_id".as("rid"))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(oracle.nonEmpty, "batch oracle empty — test data too thin")
    assert(got == oracle,
      s"exactly-once violated after torn-window replay: ${got.size} vs ${oracle.size}")
    info(s"replayed batch ${last.getName} drained cleanly; " +
      s"${got.size} rows exactly-once")
  }
}
