package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming re-expression of the reference's continuous
  * collection loop (SURVEY.md §2G; reference analog: celery-beat periodic
  * harvesting, /root/reference/src/ubdc_airbnb/ubdc_airbnb/management/
  * commands/run-beat-job.py + task bookkeeping models.py:629).
  *
  * Batch jobs answer "what happened"; these operators answer it
  * continuously with bounded state: watermarks expire session state, so
  * memory is O(open sessions), not O(events) — the property that matters
  * when the 100 TB firehose is a stream.
  */
object StreamOps {

  final case class Ev(user_id: Long, ts_ms: Long, event_id: Long, value: Double)
  final case class Session(
      user_id: Long, start_ms: Long, end_ms: Long, n_events: Int, sum_value: Double)

  /** Open-session state (public: the state encoder's generated code
    * constructs it reflectively). */
  final case class OpenSession(
      start_ms: Long, end_ms: Long, n_events: Int, sum_value: Double)

  /** Gap-based streaming sessionization via flatMapGroupsWithState:
    * a session closes when no event arrives within `gapMs` (event time).
    * Emits CLOSED sessions only (append mode). Batch-equivalent of
    * operators.Relational.sessionize + per-session aggregation. */
  def sessionize(events: Dataset[Ev], gapMs: Long): Dataset[Session] = {
    implicit val sessEnc = Encoders.product[Session]
    implicit val longEnc = Encoders.scalaLong
    val stateEnc = Encoders.product[OpenSession]

    def update(userId: Long, rows: Iterator[Ev],
               state: GroupState[OpenSession]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(Session(userId, s.start_ms, s.end_ms, s.n_events, s.sum_value))
      } else {
        val sorted = rows.toSeq.sortBy(e => (e.ts_ms, e.event_id))
        var open = state.getOption
        val closed = Seq.newBuilder[Session]
        for (e <- sorted) {
          open match {
            case Some(s) if e.ts_ms - s.end_ms <= gapMs =>
              open = Some(OpenSession(s.start_ms, e.ts_ms, s.n_events + 1, s.sum_value + e.value))
            case Some(s) =>
              closed += Session(userId, s.start_ms, s.end_ms, s.n_events, s.sum_value)
              open = Some(OpenSession(e.ts_ms, e.ts_ms, 1, e.value))
            case None =>
              open = Some(OpenSession(e.ts_ms, e.ts_ms, 1, e.value))
          }
        }
        open.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.end_ms + gapMs)
        }
        closed.result().iterator
      }
    }

    events
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", "0 seconds")
      .as(Encoders.product[Ev])
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)(
        stateEnc, sessEnc)
  }

  /** Gap + max-duration capped sessionization: like [[sessionize]], but a
    * session also closes when the next event would stretch it past
    * `capMs` from its start — the streaming form of q149 (bounded
    * harvest-burst scheduling). Extension rule matches q149 exactly:
    * extend iff gap ≤ gapMs AND (ts − start) ≤ capMs. State and timeout
    * behavior identical to [[sessionize]] (cap only binds when a new
    * event arrives; idle sessions close by gap timeout). */
  def sessionizeCapped(events: Dataset[Ev], gapMs: Long, capMs: Long): Dataset[Session] = {
    implicit val sessEnc = Encoders.product[Session]
    implicit val longEnc = Encoders.scalaLong
    val stateEnc = Encoders.product[OpenSession]

    def update(userId: Long, rows: Iterator[Ev],
               state: GroupState[OpenSession]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(Session(userId, s.start_ms, s.end_ms, s.n_events, s.sum_value))
      } else {
        val sorted = rows.toSeq.sortBy(e => (e.ts_ms, e.event_id))
        var open = state.getOption
        val closed = Seq.newBuilder[Session]
        for (e <- sorted) {
          open match {
            case Some(s) if e.ts_ms - s.end_ms <= gapMs &&
                e.ts_ms - s.start_ms <= capMs =>
              open = Some(OpenSession(s.start_ms, e.ts_ms, s.n_events + 1, s.sum_value + e.value))
            case Some(s) =>
              closed += Session(userId, s.start_ms, s.end_ms, s.n_events, s.sum_value)
              open = Some(OpenSession(e.ts_ms, e.ts_ms, 1, e.value))
            case None =>
              open = Some(OpenSession(e.ts_ms, e.ts_ms, 1, e.value))
          }
        }
        open.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.end_ms + gapMs)
        }
        closed.result().iterator
      }
    }

    events
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", "0 seconds")
      .as(Encoders.product[Ev])
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)(
        stateEnc, sessEnc)
  }

  /** Watermarked tumbling-window counts per event type — the streaming
    * form of the task-status rollup (q11). */
  def windowedCounts(events: DataFrame, tsCol: String, typeCol: String,
                     windowLen: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(typeCol))
      .agg(count(lit(1)).as("n"))

  /** Streaming dedup with watermark-bounded state: keeps the FIRST row
    * seen per `keyCols` and drops later duplicates, holding keys only
    * until the watermark passes them (state is O(keys inside the
    * watermark horizon), never O(stream)). The streaming form of q73's
    * per-window duplicate accounting; batch-equivalently
    * `dropDuplicates(keyCols)` restricted to the horizon. */
  def dedupWithinWatermark(events: DataFrame, tsCol: String, watermark: String,
                           keyCols: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-stream interval join: rows of `left` pair with rows of
    * `right` for the same `keyCol` with right.ts in [left.ts, left.ts +
    * horizonMs]. Both sides carry watermarks so the join state is purged
    * once the watermark passes the horizon — state is O(horizon), never
    * O(stream). Batch-equivalent: q74's bucket equi-join + refilter. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   tsCol: String, watermark: String, horizonMs: Long): DataFrame = {
    val l = left.withWatermark(tsCol, watermark).alias("l")
    val r = right.withWatermark(tsCol, watermark).alias("r")
    l.join(r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col(s"r.$tsCol") >= col(s"l.$tsCol") &&
        col(s"r.$tsCol") <= col(s"l.$tsCol") + expr(s"INTERVAL $horizonMs MILLISECONDS"))
  }

  /** LEFT OUTER stream-stream interval join: like [[intervalJoin]], but
    * left rows with NO right match within the horizon are still emitted
    * (right side all-null) once the watermark passes their horizon — the
    * streaming timeout/unmatched-accounting path (q146's batch shape).
    * Spark purges join state and emits the outer rows watermark-driven;
    * state stays O(horizon). */
  def intervalJoinOuter(left: DataFrame, right: DataFrame, keyCol: String,
                        tsCol: String, watermark: String,
                        horizonMs: Long): DataFrame = {
    val l = left.withWatermark(tsCol, watermark).alias("l")
    val r = right.withWatermark(tsCol, watermark).alias("r")
    l.join(r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col(s"r.$tsCol") >= col(s"l.$tsCol") &&
        col(s"r.$tsCol") <= col(s"l.$tsCol") + expr(s"INTERVAL $horizonMs MILLISECONDS"),
      "leftOuter")
  }

  /** Continuously-maintained per-key statistics via mapGroupsWithState:
    * each micro-batch folds its rows into the key's running (n, sum, max)
    * and emits the refreshed row (update mode). State is one tiny record
    * per live key — the streaming materialized view of q11's batch
    * rollup (freshest listing/task stats without rescanning history). */
  final case class KeyStats(user_id: Long, n: Long, sum_value: Double, max_ms: Long)

  def runningStats(events: Dataset[Ev]): Dataset[KeyStats] = {
    implicit val outEnc = Encoders.product[KeyStats]
    implicit val longEnc = Encoders.scalaLong
    val stateEnc = Encoders.product[KeyStats]

    def update(userId: Long, rows: Iterator[Ev], state: GroupState[KeyStats]): KeyStats = {
      var s = state.getOption.getOrElse(KeyStats(userId, 0L, 0.0, Long.MinValue))
      rows.foreach { e =>
        s = KeyStats(userId, s.n + 1, s.sum_value + e.value, math.max(s.max_ms, e.ts_ms))
      }
      state.update(s)
      s
    }

    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update)(stateEnc, outEnc)
  }

  /** One load observation for a controlled resource (PID input). */
  final case class LoadTick(key: Long, day: Long, load: Long)
  /** PID state after the last processed tick. */
  final case class PidState(
      cap: Long, integ: Long, prevE: Long, lastDay: Long, first: Boolean)
  /** Controller decision emitted per processed tick. */
  final case class PidTick(key: Long, day: Long, load: Long, cap: Long, err: Long)

  /** Streaming PID controller via flatMapGroupsWithState: the EXACT
    * integer recurrence of batch q557_pid_replay (e = load − cap;
    * integ += e; Δe = e − prevE, 0 on first; cap += (2e + integ/4 +
    * 4Δe)/8), run per key with one tiny state record per controlled
    * resource. Within a micro-batch rows are folded in day order;
    * out-of-order ticks older than the last processed day are dropped
    * (a controller cannot revise an already-issued decision).
    * StreamOpsSpec proves per-key tick-for-tick equality with the batch
    * recurrence on the real daily order loads across arbitrary
    * micro-batch splits. */
  def pidControl(ticks: Dataset[LoadTick]): Dataset[PidTick] = {
    implicit val outEnc = Encoders.product[PidTick]
    implicit val longEnc = Encoders.scalaLong
    val stateEnc = Encoders.product[PidState]

    def update(key: Long, rows: Iterator[LoadTick],
               state: GroupState[PidState]): Iterator[PidTick] = {
      var st = state.getOption.getOrElse(
        PidState(0L, 0L, 0L, Long.MinValue, first = true))
      val out = Seq.newBuilder[PidTick]
      rows.toSeq.sortBy(_.day).foreach { t =>
        if (t.day > st.lastDay) {
          val e = t.load - st.cap
          val integ = st.integ + e
          val de = if (st.first) 0L else e - st.prevE
          val cap = st.cap + (2 * e + integ / 4 + 4 * de) / 8
          st = PidState(cap, integ, e, t.day, first = false)
          out += PidTick(key, t.day, t.load, cap, e)
        }
      }
      state.update(st)
      out.result().iterator
    }

    ticks.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        update)(stateEnc, outEnc)
  }

  /** Stream-static enrichment join: each micro-batch of `stream` joins
    * the (small) static dimension with a broadcast hash join — no
    * streaming state at all, the dim is rebroadcast per batch, so dim
    * updates between batches are picked up automatically. The standard
    * shape for response→listing/AOI attribute enrichment at ingest.
    * Left-outer keeps stream rows with no dim match (`missing` flag). */
  def enrichWithStatic(stream: DataFrame, dim: DataFrame,
                       keyCol: String): DataFrame =
    stream.join(broadcast(dim), Seq(keyCol), "left_outer")

  /** `ts` carries the watermarked event-time column through to the
    * stateful operator (event-time timeout requires it to survive). */
  final case class HllTick(w_start: Long, bucket: Int, rho: Int,
                           ts: java.sql.Timestamp)
  /** Per-window HLL register state — 64 small ints regardless of window
    * cardinality (public: the state encoder constructs it reflectively). */
  final case class HllRegs(regs: Seq[Int])
  final case class WinDistinct(w_start: Long, approx_distinct: Long)

  /** Watermarked tumbling-window approximate-distinct: the streaming form
    * of functions.PortableHll (q17/q245's batch sketch). Per window the
    * state is exactly 64 max-rho registers — O(1) per window however many
    * keys arrive — and registers merge by elementwise max, so late
    * micro-batches fold in losslessly. The emitted estimate re-runs the
    * SAME integer harmonic sum as the batch aggregate, so after the last
    * row of a window lands, the streamed estimate EQUALS
    * PortableHll.approxDistinct on the same rows (spec-proven across
    * arbitrary micro-batch splits). Update mode: each trigger re-emits
    * every window it touched with the freshened estimate; state evicts
    * once the event-time watermark passes window end. */
  def windowedApproxDistinct(events: DataFrame, tsCol: String,
                             keyCol: String, windowMs: Long,
                             watermark: String): Dataset[WinDistinct] = {
    import graft.functions.{PortableHash, PortableHll}
    implicit val tickEnc = Encoders.product[HllTick]
    implicit val regsEnc = Encoders.product[HllRegs]
    implicit val outEnc = Encoders.product[WinDistinct]
    implicit val longEnc = Encoders.scalaLong
    val ticks = events
      .withWatermark(tsCol, watermark)
      .withColumn("w_start",
        expr(s"CAST(unix_millis($tsCol) AS BIGINT) DIV $windowMs * $windowMs"))
      // key passed UNCAST so both hash profiles agree with the batch twin
      // (PortableHll.approxDistinct): portable casts to string inside
      // md5Long on both sides; fast (xxhash64) hashes the raw type on both
      // sides. A stream-side cast here broke fast-profile batch↔stream
      // equality for non-string keys (r8 advice).
      .withColumn("h", PortableHash.md5Long(col(keyCol)))
      .select(col("w_start"),
        expr("CAST(h & 63 AS INT)").as("bucket"),
        expr("CAST(least(1 + bit_count(((h >> 6) & -(h >> 6)) - 1), 40) AS INT)")
          .as("rho"),
        col(tsCol).as("ts"))
      .as[HllTick]
    ticks.groupByKey(_.w_start)
      .flatMapGroupsWithState[HllRegs, WinDistinct](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (w, rows, state: GroupState[HllRegs]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val regs = state.getOption
              .map(_.regs.toArray).getOrElse(new Array[Int](64))
            rows.foreach(r => if (r.rho > regs(r.bucket)) regs(r.bucket) = r.rho)
            state.update(HllRegs(regs.toIndexedSeq))
            // evict once the watermark passes window end (clamped ahead of
            // the current watermark — a timeout at-or-below it throws)
            state.setTimeoutTimestamp(
              math.max(w + windowMs, state.getCurrentWatermarkMs() + 1))
            Iterator.single(WinDistinct(w, PortableHll.estimateFromRegs(regs)))
          }
      }
  }
}
