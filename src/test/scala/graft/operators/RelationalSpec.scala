package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    // (user, ts, value)
    (1L, 100L, 10.0), (1L, 200L, 20.0), (1L, 5000L, 30.0),
    (2L, 150L, 5.0), (2L, 160L, 6.0)
  ).toDF("user_id", "ts_ms", "value").withColumn("event_id", col("ts_ms"))

  test("topKPerGroup keeps k rows per group in order") {
    val out = Relational
      .topKPerGroup(events, Seq(col("user_id")), Seq(col("ts_ms").desc), 2)
      .select("user_id", "ts_ms", "rn")
      .as[(Long, Long, Int)].collect().toSet
    assert(out == Set((1L, 5000L, 1), (1L, 200L, 2), (2L, 160L, 1), (2L, 150L, 2)))
  }

  test("latestSnapshot is argmax per key") {
    val out = Relational
      .latestSnapshot(events, Seq(col("user_id")), Seq(col("ts_ms")))
      .select("user_id", "value").as[(Long, Double)].collect().toSet
    assert(out == Set((1L, 30.0), (2L, 6.0)))
  }

  test("scd2Intervals chains valid_from/valid_to per key") {
    val out = Relational
      .scd2Intervals(events, Seq(col("user_id")), col("ts_ms"), Seq(col("event_id")))
      .select("user_id", "valid_from_ms", "valid_to_ms")
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(out == Set(
      (1L, 100L, Some(200L)), (1L, 200L, Some(5000L)), (1L, 5000L, None),
      (2L, 150L, Some(160L)), (2L, 160L, None)))
  }

  test("sessionize splits on gap > gapMs") {
    val out = Relational
      .sessionize(events, col("user_id"), col("ts_ms"), col("event_id"), gapMs = 1000L)
      .select("user_id", "ts_ms", "session_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 100L, 1L), (1L, 200L, 1L), (1L, 5000L, 2L),
      (2L, 150L, 1L), (2L, 160L, 1L)))
  }

  test("bucketOf clamps to edge buckets") {
    val df = Seq(-5.0, 0.0, 9.9, 10.0, 99.9, 1e9).toDF("x")
      .withColumn("b", Relational.bucketOf(col("x"), 0.0, 10.0, 10))
    assert(df.select("b").as[Int].collect().toSeq == Seq(0, 0, 0, 1, 9, 9))
  }

  test("asOfCarryForward picks latest marked value at-or-before each row") {
    val df = Seq(
      (1L, 100L, "error"), (1L, 200L, "x"), (1L, 300L, "error"), (1L, 400L, "x"),
      (2L, 50L, "x")
    ).toDF("user_id", "ts_ms", "typ").withColumn("event_id", col("ts_ms"))
    val out = Relational.asOfCarryForward(df, col("user_id"), col("ts_ms"), col("event_id"),
        markCol = col("typ") === "error", pickCol = col("ts_ms"), outName = "last_err")
      .select("user_id", "ts_ms", "last_err")
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(out == Set(
      (1L, 100L, Some(100L)), (1L, 200L, Some(100L)),
      (1L, 300L, Some(300L)), (1L, 400L, Some(300L)),
      (2L, 50L, None)))
  }

  test("staleScan excludes keys and keeps stale (or never-seen) oldest-first") {
    val universe = Seq((1L, Some(10L)), (2L, Some(900L)), (3L, None), (4L, Some(5L)))
      .toDF("k", "last_ts")
    val excl = Seq(Tuple1(4L)).toDF("k")
    val out = Relational.staleScan(universe, "k", "last_ts", excl, cutoffMs = 100L, limit = 10)
      .select("k").as[Long].collect().toSeq
    assert(out == Seq(3L, 1L)) // null first, then oldest; 2 fresh, 4 excluded
  }

  test("upsertMerge classifies created/moved/unchanged by key presence") {
    val cur = Seq((1L, Some(10.0)), (2L, Some(20.0)), (3L, None: Option[Double]))
      .toDF("k", "cur_v")
    val upd = Seq((1L, 10.5), (2L, 99.0), (3L, 7.0), (4L, 1.0)).toDF("k", "upd_v")
    val out = Relational.upsertMerge(cur, upd, "k", "cur_v", "upd_v", threshold = 5.0)
      .select("k", "status").as[(Long, String)].collect().toSet
    // key 3 exists with NULL current value → NOT "created" (ADVICE r01 medium)
    assert(out == Set((1L, "unchanged"), (2L, "moved"), (3L, "unchanged"), (4L, "created")))
  }
}
