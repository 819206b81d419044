package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 26:
  *
  *  - q147: skyline (Pareto frontier) — lineitems not dominated on
  *    (price↓, quantity↑), sort-based: a point survives iff its quantity
  *    beats every strictly-cheaper point's max AND it is the max within
  *    its own price. Two windows, no pairwise join — the O(n log n)
  *    multi-objective selection operator (corpus quality-vs-cost picks).
  *  - q148: one PageRank-style propagation step over the customer→supplier
  *    purchase graph, integer-scaled (rank = 0.15 + 0.85·Σ contrib with
  *    micro-unit DIV arithmetic) — the iterable graph-centrality building
  *    block (pairs with Components for the full graph family).
  *  - q149: capped sessionization — sessions split on a 30-min gap OR a
  *    4-h max-duration cap. The cap depends on the running session start,
  *    a non-linear recurrence like q124: secondary-sort mapPartitions on
  *    the Spark side, recursive CTE oracle on the DuckDB side. Reference
  *    analog: bounding harvest-burst length in task scheduling.
  */
object QueriesAG extends QueryPack {
  import Q._

  // NOT private: Spark's generated (de)serializer code must access these.
  case class SessEv(user_id: Long, ts_ms: Long, event_id: Long)
  case class SessOut(user_id: Long, n_sessions: Long, n_cap_splits: Long,
                     max_session_events: Long)

  private val GapMs = 1800000L   // 30 min inactivity gap
  private val CapMs = 14400000L  // 4 h max session duration

  def defs: Seq[QDef] = Seq(

    QDef("q147_skyline",
      (s, dir) => {
        // Scale shape (inside Relational.skyline2d): the only global
        // window runs over ONE ROW PER DISTINCT PRICE — the distributed
        // hash-aggregate does the heavy lifting first.
        graft.operators.Relational.skyline2d(
            t(s, dir, "lineitem")
              .selectExpr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS pc",
                "CAST(floor(l_quantity + 0.5) AS BIGINT) AS qi"),
            xCol = "pc", yCol = "qi")
          .select("pc", "qi", "multiplicity")
          .orderBy("pc")
      },
      Some("""
        WITH li AS (
          SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS pc,
                 CAST(floor(l_quantity + 0.5) AS BIGINT) AS qi
          FROM lineitem),
        counts AS (SELECT pc, qi, count(*) AS m FROM li GROUP BY 1, 2),
        pp AS (
          SELECT pc, qi, m,
                 row_number() OVER (PARTITION BY pc ORDER BY qi DESC) AS rk
          FROM counts),
        w AS (
          SELECT pc, qi, m,
                 max(qi) OVER (ORDER BY pc
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cheaper_max
          FROM pp WHERE rk = 1)
        SELECT pc, qi, CAST(m AS BIGINT) AS multiplicity
        FROM w
        WHERE cheaper_max IS NULL OR qi > cheaper_max
        ORDER BY pc""")),

    QDef("q148_pagerank_step",
      (s, dir) => {
        val edges = t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("c"), col("l_suppkey").as("sp"))
          .distinct()
        val outdeg = edges.groupBy("c").agg(count(lit(1)).as("deg"))
        edges.join(outdeg, "c")
          .withColumn("contrib", expr("1000000 DIV deg"))
          .groupBy("sp")
          .agg(sum("contrib").cast("bigint").as("inflow"),
            count(lit(1)).as("in_deg"))
          .withColumn("rank_micro", expr("150000 + 850 * inflow DIV 1000"))
          .orderBy(col("rank_micro").desc, col("sp"))
          .limit(20)
      },
      Some("""
        WITH edges AS (
          SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS sp
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        outdeg AS (SELECT c, count(*) AS deg FROM edges GROUP BY 1),
        inflow AS (
          SELECT e.sp, CAST(sum(1000000 // d.deg) AS BIGINT) AS inflow,
                 count(*) AS in_deg
          FROM edges e JOIN outdeg d ON e.c = d.c
          GROUP BY 1)
        SELECT sp, inflow, in_deg,
               150000 + 850 * inflow // 1000 AS rank_micro
        FROM inflow
        ORDER BY rank_micro DESC, sp LIMIT 20""")),

    QDef("q149_capped_sessions",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events")
          .selectExpr("user_id", s"$tsMs AS ts_ms", "event_id")
          .as[SessEv]
        ev.repartition(col("user_id"))
          .sortWithinPartitions("user_id", "ts_ms", "event_id")
          .mapPartitions { it =>
            new Iterator[SessOut] {
              private var pending: Option[SessOut] = None
              private var cur = -1L
              private var prevTs = 0L; private var start = 0L
              private var nSess = 0L; private var caps = 0L
              private var len = 0L; private var maxLen = 0L
              private def close(): SessOut = {
                if (len > maxLen) maxLen = len
                SessOut(cur, nSess, caps, maxLen)
              }
              private def roll(): Unit = {
                while (pending.isEmpty && it.hasNext) {
                  val e = it.next()
                  if (e.user_id != cur) {
                    if (cur != -1L) pending = Some(close())
                    cur = e.user_id; nSess = 1L; caps = 0L
                    start = e.ts_ms; prevTs = e.ts_ms; len = 1L; maxLen = 0L
                  } else {
                    val gap = e.ts_ms - prevTs
                    if (gap > GapMs) {
                      if (len > maxLen) maxLen = len
                      nSess += 1; start = e.ts_ms; len = 1L
                    } else if (e.ts_ms - start > CapMs) {
                      if (len > maxLen) maxLen = len
                      nSess += 1; caps += 1; start = e.ts_ms; len = 1L
                    } else len += 1
                    prevTs = e.ts_ms
                  }
                }
                if (pending.isEmpty && cur != -1L) {
                  pending = Some(close()); cur = -1L
                }
              }
              def hasNext: Boolean = { roll(); pending.isDefined }
              def next(): SessOut = { roll(); val r = pending.get; pending = None; r }
            }
          }
          .toDF()
          .orderBy("user_id")
      },
      Some(s"""
        WITH RECURSIVE r AS (
          SELECT user_id, epoch_ms(ts) AS ts_ms,
                 row_number() OVER (PARTITION BY user_id
                   ORDER BY epoch_ms(ts), event_id) AS rn,
                 count(*) OVER (PARTITION BY user_id) AS cnt
          FROM events),
        b AS (
          SELECT user_id, rn, cnt, ts_ms AS prev_ts, ts_ms AS start_ts,
                 CAST(1 AS BIGINT) AS n_sessions, CAST(0 AS BIGINT) AS caps,
                 CAST(1 AS BIGINT) AS len, CAST(0 AS BIGINT) AS max_len
          FROM r WHERE rn = 1
          UNION ALL
          SELECT r.user_id, r.rn, r.cnt, r.ts_ms,
                 CASE WHEN r.ts_ms - b.prev_ts > $GapMs
                        OR r.ts_ms - b.start_ts > $CapMs
                      THEN r.ts_ms ELSE b.start_ts END,
                 b.n_sessions + CASE WHEN r.ts_ms - b.prev_ts > $GapMs
                        OR r.ts_ms - b.start_ts > $CapMs THEN 1 ELSE 0 END,
                 b.caps + CASE WHEN r.ts_ms - b.prev_ts <= $GapMs
                        AND r.ts_ms - b.start_ts > $CapMs THEN 1 ELSE 0 END,
                 CASE WHEN r.ts_ms - b.prev_ts > $GapMs
                        OR r.ts_ms - b.start_ts > $CapMs
                      THEN 1 ELSE b.len + 1 END,
                 CASE WHEN (r.ts_ms - b.prev_ts > $GapMs
                        OR r.ts_ms - b.start_ts > $CapMs)
                        AND b.len > b.max_len
                      THEN b.len ELSE b.max_len END
          FROM b JOIN r ON r.user_id = b.user_id AND r.rn = b.rn + 1)
        SELECT user_id, n_sessions, caps AS n_cap_splits,
               CASE WHEN len > max_len THEN len ELSE max_len END
                 AS max_session_events
        FROM b WHERE rn = cnt ORDER BY user_id"""))
  )
}
