package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamOpsSpec extends SparkSpec {
  import StreamOps._

  test("streaming sessionize closes sessions on gap and on watermark timeout") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Ev]
    val query = StreamOps.sessionize(input.toDS(), gapMs = 1000L)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: user 1 has two events 100ms apart (one session), then a
      // far event that opens a second session
      input.addData(Ev(1L, 1000L, 1L, 1.0), Ev(1L, 1100L, 2L, 2.0), Ev(1L, 5000L, 3L, 3.0))
      query.processAllAvailable()
      // batch 2: push watermark far ahead so the open session times out
      input.addData(Ev(2L, 100000L, 4L, 4.0))
      query.processAllAvailable()
      input.addData(Ev(2L, 300000L, 5L, 5.0))
      query.processAllAvailable()

      val out = spark.table("sessions").as[Session].collect()
        .map(x => (x.user_id, x.start_ms, x.end_ms, x.n_events, x.sum_value)).toSet
      // user1 session A closed by in-batch gap; session B closed by watermark
      assert(out.contains((1L, 1000L, 1100L, 2, 3.0)))
      assert(out.contains((1L, 5000L, 5000L, 1, 3.0)))
    } finally query.stop()
  }

  test("windowedCounts aggregates tumbling windows under a watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(java.sql.Timestamp, String)]
    val df = input.toDF().toDF("ts", "typ")
    val query = StreamOps.windowedCounts(df, "ts", "typ", "10 minutes", "0 seconds")
      .writeStream.format("memory").queryName("wc")
      .outputMode(OutputMode.Complete).start()
    try {
      def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
      input.addData((t(1), "a"), (t(2), "a"), (t(3), "b"), (t(11), "a"))
      query.processAllAvailable()
      val out = spark.table("wc").selectExpr("typ", "n").as[(String, Long)]
        .collect().groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      assert(out == Map("a" -> 3L, "b" -> 1L))
    } finally query.stop()
  }

  test("dedupWithinWatermark keeps first row per key, bounded by the watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(java.sql.Timestamp, Long, String, Double)]
    val df = input.toDF().toDF("ts", "user_id", "event_type", "value")
    val query = StreamOps.dedupWithinWatermark(df, "ts", "10 minutes",
        Seq("user_id", "event_type"))
      .writeStream.format("memory").queryName("dd")
      .outputMode(OutputMode.Append).start()
    try {
      def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
      // duplicates of (1, a) within the horizon are dropped; (2, b) kept
      input.addData((t(1), 1L, "a", 1.0), (t(2), 1L, "a", 2.0), (t(3), 2L, "b", 3.0))
      query.processAllAvailable()
      // push the watermark past the horizon, then re-emit (1, a): state
      // was expired, so the key is accepted again
      input.addData((t(30), 9L, "z", 0.0))
      query.processAllAvailable()
      input.addData((t(31), 1L, "a", 9.0))
      query.processAllAvailable()

      val out = spark.table("dd").selectExpr("user_id", "event_type", "value")
        .as[(Long, String, Double)].collect().toSeq
      assert(out.count(r => r._1 == 1L && r._2 == "a") == 2) // first + post-expiry
      assert(out.contains((1L, "a", 1.0)) && !out.contains((1L, "a", 2.0)))
      assert(out.contains((2L, "b", 3.0)))
    } finally query.stop()
  }

  test("intervalJoin pairs right rows within the horizon after the left row") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val left = MemoryStream[(java.sql.Timestamp, Long, String)]
    val right = MemoryStream[(java.sql.Timestamp, Long, String)]
    val query = StreamOps.intervalJoin(
        left.toDF().toDF("ts", "user_id", "tag"),
        right.toDF().toDF("ts", "user_id", "tag"),
        keyCol = "user_id", tsCol = "ts", watermark = "10 minutes",
        horizonMs = 60000L)
      .selectExpr("l.tag AS ltag", "r.tag AS rtag")
      .writeStream.format("memory").queryName("ij")
      .outputMode(OutputMode.Append).start()
    try {
      def t(sec: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:${sec / 60}%02d:${sec % 60}%02d")
      left.addData((t(10), 1L, "c1"), (t(100), 1L, "c2"), (t(10), 2L, "c3"))
      // r1 within 60s of c1; r2 within 60s of c2; r3 before any left row;
      // r4 right user, 70s after c1 (outside horizon)
      right.addData((t(30), 1L, "r1"), (t(130), 1L, "r2"), (t(5), 2L, "r3"), (t(80), 1L, "r4"))
      query.processAllAvailable()
      // advance both watermarks so results flush in Append mode
      left.addData((t(3000), 9L, "wm"))
      right.addData((t(3000), 8L, "wm"))
      query.processAllAvailable()

      val out = spark.table("ij").as[(String, String)].collect().toSet
      assert(out == Set(("c1", "r1"), ("c2", "r2")))
    } finally query.stop()
  }

  test("sessionizeCapped over real testdata equals the q149 batch recurrence") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val evs = graft.Tables.t(spark, "/root/testdata/sf0.001", "events")
      .selectExpr("user_id", "ts DIV 1000000 AS ts_ms", "event_id",
        "coalesce(value, 0.0) AS value")
      .as[Ev].collect().toSeq
    val input = MemoryStream[Ev]
    val query = StreamOps.sessionizeCapped(input.toDS(),
        gapMs = 1800000L, capMs = 14400000L)
      .writeStream.format("memory").queryName("capped")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(evs: _*)
      query.processAllAvailable()
      // far-future event advances the watermark so every open session
      // times out and emits
      input.addData(Ev(999999L, evs.map(_.ts_ms).max + 10L * 86400000L, 0L, 0.0))
      query.processAllAvailable()

      val streamed = spark.table("capped").as[Session].collect()
        .filter(_.user_id != 999999L)
        .groupBy(_.user_id)
        .map { case (u, ss) =>
          u -> (ss.length.toLong, ss.map(_.n_events.toLong).max)
        }
      val batch = graft.SparkEntry.queries("q149_capped_sessions")(
          spark, "/root/testdata/sf0.001").collect()
        .map(r => r.getAs[Long]("user_id") ->
          (r.getAs[Long]("n_sessions"), r.getAs[Long]("max_session_events")))
        .toMap
      assert(streamed.size == batch.size)
      streamed.foreach { case (u, (n, mx)) =>
        assert(batch(u) == ((n, mx)), s"user $u: stream ($n,$mx) vs batch ${batch(u)}")
      }
    } finally query.stop()
  }

  test("intervalJoinOuter emits unmatched left rows with nulls after the watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val left = MemoryStream[(java.sql.Timestamp, Long, String)]
    val right = MemoryStream[(java.sql.Timestamp, Long, String)]
    val query = StreamOps.intervalJoinOuter(
        left.toDF().toDF("ts", "user_id", "tag"),
        right.toDF().toDF("ts", "user_id", "tag"),
        keyCol = "user_id", tsCol = "ts", watermark = "10 minutes",
        horizonMs = 60000L)
      .selectExpr("l.tag AS ltag", "r.tag AS rtag")
      .writeStream.format("memory").queryName("ijo")
      .outputMode(OutputMode.Append).start()
    try {
      def t(sec: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:${sec / 60}%02d:${sec % 60}%02d")
      left.addData((t(10), 1L, "c1"), (t(100), 1L, "c2"), (t(10), 2L, "c3"))
      // r1 matches c1; c2 and c3 have no in-horizon right row
      right.addData((t(30), 1L, "r1"), (t(80), 1L, "r4"))
      query.processAllAvailable()
      left.addData((t(3000), 9L, "wm"))
      right.addData((t(3000), 8L, "wm"))
      query.processAllAvailable()

      val out = spark.table("ijo").as[(String, String)].collect().toSet
      assert(out.contains(("c1", "r1")))
      assert(out.contains(("c2", null)) && out.contains(("c3", null)),
        s"unmatched left rows must surface with null right side, got $out")
    } finally query.stop()
  }

  test("runningStats folds each batch into per-key state and emits refreshed rows") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[StreamOps.Ev]
    val query = StreamOps.runningStats(input.toDS())
      .writeStream.format("memory").queryName("rstats")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(StreamOps.Ev(1L, 100L, 1L, 2.0), StreamOps.Ev(1L, 200L, 2L, 3.0),
        StreamOps.Ev(2L, 50L, 3L, 7.0))
      query.processAllAvailable()
      input.addData(StreamOps.Ev(1L, 300L, 4L, 5.0))
      query.processAllAvailable()

      // update mode: latest row per key reflects ALL batches so far
      val latest = spark.table("rstats").as[StreamOps.KeyStats].collect()
        .groupBy(_.user_id).map { case (k, g) => k -> g.maxBy(_.n) }
      assert(latest(1L) == StreamOps.KeyStats(1L, 3L, 10.0, 300L),
        "second batch must fold into first batch's state")
      assert(latest(2L) == StreamOps.KeyStats(2L, 1L, 7.0, 50L))
    } finally query.stop()
  }

  test("enrichWithStatic joins each micro-batch against the broadcast dim, keeping misses") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, Double)]
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val query = StreamOps.enrichWithStatic(
        input.toDF().toDF("user_id", "value"), dim, keyCol = "user_id")
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((1L, 10.0), (3L, 30.0))
      query.processAllAvailable()
      val out = spark.table("enriched").as[(Long, Double, Option[String])]
        .collect().toSet
      assert(out == Set((1L, 10.0, Some("gold")), (3L, 30.0, None)),
        "dim match enriched, miss kept with null tier")
    } finally query.stop()
  }

  test("pidControl: streaming PID equals the batch q557 recurrence " +
      "per key, tick for tick, across arbitrary micro-batch splits") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    // real inputs: daily order loads per priority class (5 keys), the
    // single-key case being exactly q557_pid_replay's series
    val dir = "/root/testdata/sf0.001"
    val loads = graft.Tables.t(spark, dir, "orders")
      .selectExpr(
        "CAST(substring(o_orderpriority, 1, 1) AS LONG) AS key",
        "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS day")
      .groupBy("key", "day").count()
      .selectExpr("key", "day", "count AS load")
      .as[LoadTick].collect().sortBy(t => (t.day, t.key))

    val input = MemoryStream[LoadTick]
    val query = StreamOps.pidControl(input.toDS())
      .writeStream.format("memory").queryName("pid")
      .outputMode(OutputMode.Append).start()
    try {
      // uneven micro-batch splits (day order preserved across batches)
      val cuts = Seq(loads.length / 7, loads.length / 3,
        loads.length / 2, loads.length)
      var off = 0
      cuts.foreach { end =>
        input.addData(loads.slice(off, end).toIndexedSeq: _*)
        query.processAllAvailable()
        off = end
      }
      val got = spark.table("pid").as[PidTick].collect()
        .map(t => (t.key, t.day) -> (t.load, t.cap, t.err)).toMap

      // batch replay of the q557 recurrence per key
      var n = 0
      loads.groupBy(_.key).foreach { case (key, ts) =>
        var cap = 0L; var integ = 0L; var prevE = 0L; var first = true
        ts.sortBy(_.day).foreach { t =>
          val e = t.load - cap
          integ += e
          val de = if (first) 0L else e - prevE
          cap = cap + (2 * e + integ / 4 + 4 * de) / 8
          prevE = e; first = false; n += 1
          assert(got((key, t.day)) == ((t.load, cap, e)),
            s"key=$key day=${t.day}")
        }
      }
      assert(got.size == n, "stream emitted exactly one tick per input")
    } finally query.stop()
  }

  test("windowedApproxDistinct: streamed register merge equals the batch " +
      "PortableHll estimate across arbitrary micro-batch splits") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    implicit val sqlCtx = spark.sqlContext

    // (ts, user): 3 ten-minute windows, users overlap across windows and
    // recur across micro-batches (the register-merge path must dedup them)
    def ts(min: Int) = new java.sql.Timestamp(1704067200000L + min * 60000L)
    val rows = (0 until 180).map { i =>
      (ts(i % 30), (i * 7919 % 97).toLong) // 97 users scattered over 3 windows
    }
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val df = input.toDF().toDF("ts", "user_id")
    // final estimate per window survives in `latest` (update mode re-emits)
    val latest = scala.collection.concurrent.TrieMap.empty[Long, Long]
    val query = StreamOps
      .windowedApproxDistinct(df, "ts", "user_id", 600000L, "2 hours")
      .writeStream.outputMode(OutputMode.Update)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamOps.WinDistinct], _: Long) =>
        b.collect().foreach(w => latest(w.w_start) = w.approx_distinct)
      }
      .start()
    try {
      // three uneven micro-batches
      Seq(rows.slice(0, 50), rows.slice(50, 51), rows.slice(51, 180)).foreach { b =>
        input.addData(b: _*)
        query.processAllAvailable()
      }
      val batch = graft.functions.PortableHll.approxDistinct(
          rows.toDF("ts", "user_id")
            .withColumn("w_start",
              expr("CAST(unix_millis(ts) AS BIGINT) DIV 600000 * 600000")),
          col("user_id"), Seq("w_start"), "ad")
        .collect()
        .map(r => r.getAs[Long]("w_start") -> r.getAs[Long]("ad")).toMap
      assert(batch.nonEmpty && batch.keySet == latest.keySet)
      batch.foreach { case (w, ad) =>
        assert(latest(w) == ad, s"window $w: stream ${latest(w)} batch $ad")
      }
    } finally query.stop()
  }

  test("windowedApproxDistinct: batch equality holds under the FAST hash " +
      "profile with non-string keys (r8 advice — the stream must not " +
      "pre-cast the key)") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Int) = new java.sql.Timestamp(1704067200000L + min * 60000L)
    val rows = (0 until 120).map(i => (ts(i % 20), (i * 6271 % 83).toLong))
    // profile is baked into the Columns at plan-construction time, so the
    // override must wrap BOTH the stream op and the batch twin
    graft.functions.PortableHash.profileOverride = Some("fast")
    try {
      val input = MemoryStream[(java.sql.Timestamp, Long)]
      val latest = scala.collection.concurrent.TrieMap.empty[Long, Long]
      val query = StreamOps
        .windowedApproxDistinct(input.toDF().toDF("ts", "user_id"),
          "ts", "user_id", 600000L, "2 hours")
        .writeStream.outputMode(OutputMode.Update)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamOps.WinDistinct], _: Long) =>
          b.collect().foreach(w => latest(w.w_start) = w.approx_distinct)
        }
        .start()
      try {
        Seq(rows.slice(0, 37), rows.slice(37, 120)).foreach { b =>
          input.addData(b: _*)
          query.processAllAvailable()
        }
        val batch = graft.functions.PortableHll.approxDistinct(
            rows.toDF("ts", "user_id")
              .withColumn("w_start",
                expr("CAST(unix_millis(ts) AS BIGINT) DIV 600000 * 600000")),
            col("user_id"), Seq("w_start"), "ad")
          .collect()
          .map(r => r.getAs[Long]("w_start") -> r.getAs[Long]("ad")).toMap
        assert(batch.nonEmpty && batch.keySet == latest.keySet)
        batch.foreach { case (w, ad) =>
          assert(latest(w) == ad, s"window $w: stream ${latest(w)} batch $ad")
        }
      } finally query.stop()
    } finally graft.functions.PortableHash.profileOverride = None
  }
}
