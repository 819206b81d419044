package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 22:
  *
  *  - q122: time-decayed leaderboard — dyadic decay (score contribution =
  *    cents >> age_days) keeps the whole computation in exact BIGINT
  *    arithmetic (shift right == floor-div by 2^k for non-negative ints),
  *    so no pow()/exp() FP drift between engines. The "freshest hot
  *    listings" ranking shape.
  *  - q123: gaps-and-islands — consecutive-active-day streaks per user via
  *    the day - row_number() grouping trick; per-user island count,
  *    longest streak, total active days.
  *  - q124: clamped running balance (balance = max(0, prev + delta)) — a
  *    NON-LINEAR recurrence no window frame can express. Spark side runs
  *    the scale path: hash-repartition by key + sortWithinPartitions +
  *    one sequential mapPartitions pass (secondary-sort pattern, state =
  *    one (key, balance) pair, streams at any per-key length). DuckDB
  *    oracle is an independent recursive CTE. Reference analog: task
  *    credit/quota accounting.
  *  - q131: median absolute deviation — robust dispersion per event_type,
  *    both medians via exact integer rank selection on cents (pairs with
  *    q121 boxplot for anomaly flagging).
  *  - q132: largest-remainder proration — allocate each order's total
  *    cents across its lineitems proportional to quantity; floor shares,
  *    then distribute the remainder cents to the largest fractional
  *    parts (deterministic tiebreak). Conservation (sum(alloc) == total)
  *    proven in-query: bad_orders must be 0. The classic exact-money
  *    ETL allocation operator.
  */
object QueriesAC extends QueryPack {
  import Q._

  // NOT private: Spark's generated (de)serializer code must access these.
  case class BalEv(user_id: Long, ts_ms: Long, event_id: Long, delta: Long)
  case class BalOut(user_id: Long, final_cents: Long, n_clamps: Long)

  def defs: Seq[QDef] = Seq(

    QDef("q122_decayed_topk",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val mx = ev.agg(max(expr(tsMs)).as("mx"))
        ev.selectExpr("user_id",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc",
            s"$tsMs AS ts_ms")
          .crossJoin(broadcast(mx))
          .withColumn("age", expr("CAST((mx - ts_ms) DIV 86400000 AS INT)"))
          .groupBy("user_id")
          .agg(sum(expr("shiftright(vc, age)")).as("score_cents"),
            count(lit(1)).as("n_events"))
          .orderBy(col("score_cents").desc, col("user_id"))
          .limit(10)
      },
      Some("""
        WITH m AS (SELECT max(epoch_ms(ts)) AS mx FROM events),
        e AS (
          SELECT user_id,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc,
                 CAST((m.mx - epoch_ms(ts)) // 86400000 AS INTEGER) AS age
          FROM events, m)
        SELECT user_id,
               CAST(sum(vc >> age) AS BIGINT) AS score_cents,
               count(*) AS n_events
        FROM e GROUP BY 1
        ORDER BY score_cents DESC, user_id LIMIT 10""")),

    QDef("q123_islands",
      (s, dir) => {
        val days = t(s, dir, "events")
          .selectExpr("user_id", s"($tsMs) DIV 86400000 AS day")
          .distinct()
        val w = Window.partitionBy("user_id").orderBy("day")
        days.withColumn("grp", col("day") - row_number().over(w))
          .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_islands"),
            max("len").as("max_len"),
            sum("len").cast("bigint").as("active_days"))
          .orderBy("user_id")
      },
      Some("""
        WITH d AS (
          SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
        r AS (
          SELECT user_id, day,
                 day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
          FROM d),
        i AS (SELECT user_id, grp, count(*) AS len FROM r GROUP BY 1, 2)
        SELECT user_id, count(*) AS n_islands,
               CAST(max(len) AS BIGINT) AS max_len,
               CAST(sum(len) AS BIGINT) AS active_days
        FROM i GROUP BY 1 ORDER BY 1""")),

    QDef("q124_capped_balance",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events")
          .where(col("value").isNotNull) // null measures drop out (ANSI-style)
          .selectExpr("user_id", s"$tsMs AS ts_ms", "event_id",
            """CAST(floor(value * 100 + 0.5) AS BIGINT)
               * (CASE WHEN event_type IN ('purchase','error') THEN -1 ELSE 1 END)
               AS delta""")
          .as[BalEv]
        // Secondary sort: all rows of a key land in one partition, sorted;
        // one streaming pass with O(1) state per key — holds at any per-key
        // history length (no per-group collect).
        ev.repartition(col("user_id"))
          .sortWithinPartitions("user_id", "ts_ms", "event_id")
          .mapPartitions { it =>
            new Iterator[BalOut] {
              private var pending: Option[BalOut] = None
              private var cur = -1L
              private var bal = 0L
              private var clamps = 0L
              private def roll(): Unit = {
                while (pending.isEmpty && it.hasNext) {
                  val e = it.next()
                  if (e.user_id != cur) {
                    if (cur != -1L) pending = Some(BalOut(cur, bal, clamps))
                    cur = e.user_id; bal = 0L; clamps = 0L
                  }
                  val nb = bal + e.delta
                  if (nb < 0L) { bal = 0L; clamps += 1L } else bal = nb
                }
                if (pending.isEmpty && cur != -1L) {
                  pending = Some(BalOut(cur, bal, clamps)); cur = -1L
                }
              }
              def hasNext: Boolean = { roll(); pending.isDefined }
              def next(): BalOut = { roll(); val r = pending.get; pending = None; r }
            }
          }
          .toDF()
          .orderBy("user_id")
      },
      Some("""
        WITH RECURSIVE r AS (
          SELECT user_id,
                 row_number() OVER (PARTITION BY user_id
                   ORDER BY epoch_ms(ts), event_id) AS rn,
                 count(*) OVER (PARTITION BY user_id) AS cnt,
                 CAST(floor(value * 100 + 0.5) AS BIGINT)
                   * (CASE WHEN event_type IN ('purchase','error') THEN -1 ELSE 1 END)
                   AS delta
          FROM events WHERE value IS NOT NULL),
        b AS (
          SELECT user_id, rn, cnt,
                 CASE WHEN delta < 0 THEN 0 ELSE delta END AS bal,
                 CAST(CASE WHEN delta < 0 THEN 1 ELSE 0 END AS BIGINT) AS clamps
          FROM r WHERE rn = 1
          UNION ALL
          SELECT r.user_id, r.rn, r.cnt,
                 CASE WHEN b.bal + r.delta < 0 THEN 0 ELSE b.bal + r.delta END,
                 b.clamps + CASE WHEN b.bal + r.delta < 0 THEN 1 ELSE 0 END
          FROM b JOIN r ON r.user_id = b.user_id AND r.rn = b.rn + 1)
        SELECT user_id, bal AS final_cents, clamps AS n_clamps
        FROM b WHERE rn = cnt ORDER BY user_id""")),

    QDef("q131_mad",
      (s, dir) => {
        val vals = t(s, dir, "events")
          .selectExpr("event_type", "event_id",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc")
        val w1 = Window.partitionBy("event_type").orderBy(col("vc"), col("event_id"))
        val wn = Window.partitionBy("event_type")
        val med = vals
          .withColumn("rn", row_number().over(w1))
          .withColumn("n", count(lit(1)).over(wn))
          .groupBy("event_type")
          .agg(max(when(expr("rn = (n + 1) DIV 2"), col("vc"))).as("med_cents"),
            max("n").cast("bigint").as("n"))
        val dev = vals.join(broadcast(med), "event_type")
          .withColumn("dev", abs(col("vc") - col("med_cents")))
        val w2 = Window.partitionBy("event_type").orderBy(col("dev"), col("event_id"))
        dev.withColumn("rn", row_number().over(w2))
          .groupBy("event_type")
          .agg(max("n").as("n"), max("med_cents").as("med_cents"),
            max(when(expr("rn = (n + 1) DIV 2"), col("dev"))).as("mad_cents"))
          .orderBy("event_type")
      },
      Some("""
        WITH v AS (
          SELECT event_type, event_id,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
          FROM events),
        r AS (
          SELECT event_type, vc,
                 row_number() OVER (PARTITION BY event_type ORDER BY vc, event_id) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM v),
        med AS (
          SELECT event_type,
                 max(CASE WHEN rn = (n + 1) // 2 THEN vc END) AS med_cents,
                 CAST(max(n) AS BIGINT) AS n
          FROM r GROUP BY 1),
        d AS (
          SELECT v.event_type, abs(v.vc - m.med_cents) AS dev, m.n, m.med_cents,
                 row_number() OVER (PARTITION BY v.event_type
                   ORDER BY abs(v.vc - m.med_cents), v.event_id) AS rn
          FROM v JOIN med m ON v.event_type = m.event_type)
        SELECT event_type, max(n) AS n, max(med_cents) AS med_cents,
               max(CASE WHEN rn = (n + 1) // 2 THEN dev END) AS mad_cents
        FROM d GROUP BY 1 ORDER BY 1""")),

    QDef("q132_proration",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .selectExpr("l_orderkey", "l_linenumber",
            "CAST(floor(l_quantity + 0.5) AS BIGINT) AS qi")
        val ord = t(s, dir, "orders")
          .selectExpr("o_orderkey", "o_orderpriority",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS oc")
        val alloc = graft.operators.Relational.prorate(
          li.join(ord, col("l_orderkey") === col("o_orderkey")),
          groupCol = "l_orderkey", totalCol = "oc", weightCol = "qi",
          tieCol = "l_linenumber")
        val perOrder = alloc.groupBy("o_orderkey", "o_orderpriority", "oc")
          .agg(sum("alloc").as("alloc_sum"), count(lit(1)).as("n_items"),
            sum("bump").as("bumped"))
        perOrder.groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_orders"),
            sum("n_items").cast("bigint").as("n_items"),
            sum("alloc_sum").cast("bigint").as("alloc_cents"),
            sum("bumped").cast("bigint").as("n_bumped"),
            sum(when(col("alloc_sum") =!= col("oc"), 1L).otherwise(0L))
              .cast("bigint").as("bad_orders"))
          .orderBy("o_orderpriority")
      },
      Some("""
        WITH li AS (
          SELECT l_orderkey, l_linenumber,
                 CAST(floor(l_quantity + 0.5) AS BIGINT) AS qi
          FROM lineitem),
        j AS (
          SELECT li.*, o.o_orderpriority,
                 CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS oc
          FROM li JOIN orders o ON li.l_orderkey = o.o_orderkey),
        w AS (
          SELECT *,
                 sum(qi) OVER (PARTITION BY l_orderkey) AS qsum
          FROM j),
        b AS (
          SELECT *,
                 oc * qi // qsum AS share,
                 (oc * qi) % qsum AS frac
          FROM w),
        r AS (
          SELECT *,
                 oc - CAST(sum(share) OVER (PARTITION BY l_orderkey) AS BIGINT) AS rem,
                 row_number() OVER (PARTITION BY l_orderkey
                   ORDER BY frac DESC, l_linenumber) AS rnk
          FROM b),
        a AS (
          SELECT *,
                 share + (CASE WHEN rnk <= rem THEN 1 ELSE 0 END) AS alloc,
                 CASE WHEN rnk <= rem THEN 1 ELSE 0 END AS bump
          FROM r),
        po AS (
          SELECT l_orderkey, o_orderpriority, oc,
                 CAST(sum(alloc) AS BIGINT) AS alloc_sum,
                 count(*) AS n_items,
                 CAST(sum(bump) AS BIGINT) AS bumped
          FROM a GROUP BY 1, 2, 3)
        SELECT o_orderpriority, count(*) AS n_orders,
               CAST(sum(n_items) AS BIGINT) AS n_items,
               CAST(sum(alloc_sum) AS BIGINT) AS alloc_cents,
               CAST(sum(bumped) AS BIGINT) AS n_bumped,
               CAST(sum(CASE WHEN alloc_sum <> oc THEN 1 ELSE 0 END) AS BIGINT)
                 AS bad_orders
        FROM po GROUP BY 1 ORDER BY 1"""))
  )
}
