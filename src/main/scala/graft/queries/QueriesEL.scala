package graft.queries

import graft.Tables.t
import graft.dedup.Dedup
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 135 — dedup-architecture audit,
  * graph bridges, mechanism design, control-loop replay:
  *
  *  - q554: shard-escape audit for exact dedup: duplicate groups
  *    (q30's canonical bag-of-words signature) sharded by doc_id % 8 —
  *    per-shard dedup removes Σ(s_shard−1), global dedup removes
  *    Σ(s−1); the difference Σ(k_shards−1) is the duplicate mass that
  *    ESCAPES per-shard dedup. The quantified argument for running
  *    dedup globally (why Dedup.scala shuffles by signature, not by
  *    shard).
  *  - q555: bridges (cut edges) of the bounded divisor-lattice graph
  *    (k—2k, k—3k on the ≤200-node domain): Spark runs one-task
  *    Tarjan low-link; the oracle re-derives every bridge from first
  *    principles with a recursive closure over the (excluded-edge,
  *    node) state space — edge is a bridge iff its endpoint becomes
  *    unreachable without it.
  *  - q556: VCG position auction: top-8 suppliers by account balance
  *    bid for 3 slots with click weights (10, 6, 3); VCG payment
  *    p_k = Σ_{m>k} b_m(w_{m−1}−w_m)/w_k in exact integer numerators,
  *    floor-milli payments, envy-freeness (payment ≤ bid) in-spec.
  *  - q557: PID controller replay: capacity tracks the daily order
  *    load with integer gains (adj = (2e + I/4 + 4Δe) DIV 8), the
  *    coupled (capacity, integral, prev-error) recurrence on the
  *    secondary-sort mapPartitions path; recursive-CTE oracle carries
  *    all three state columns. The control-theory sibling of q312's
  *    threshold autoscaler.
  *
  * Scale shapes: q554 is two hash aggregations over signatures;
  * q555/q556 run on bounded domains (200 nodes / 8 bidders); q557
  * aggregates to the day domain before its one-pass recurrence.
  */
object QueriesEL extends QueryPack {
  import Q._

  // NOT private: Spark's generated (de)serializer code must access these.
  case class BrEdge(u: Long, v: Long)
  case class BrOut(u: Long, v: Long, leaf_edge: Long)
  case class PidDay(day: Long, load: Long)
  case class PidOut(n_days: Long, end_capacity: Long, total_abs_err: Long,
      max_overshoot: Long, max_undershoot: Long)

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q554
    QDef("q554_shard_dedup_escape",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .where(col("text").isNotNull)
          .withColumn("w", words(col("text")))
          .select(col("doc_id"), Dedup.canonicalKey(col("w")).as("sig"),
            expr("doc_id % 8").as("shard"))
        val perShard = docs.groupBy("sig", "shard")
          .agg(count(lit(1)).as("c"))
        val groups = perShard.groupBy("sig").agg(
          sum("c").cast("long").as("size"),
          count(lit(1)).as("k"))
        groups.agg(
            sum("size").cast("long").as("n_docs"),
            sum(when(col("size") >= 2, 1L).otherwise(0L)).as("dup_groups"),
            sum(expr("size - 1")).cast("long").as("global_dupes"),
            sum(expr("size - k")).cast("long").as("shard_dupes"),
            sum(expr("k - 1")).cast("long").as("escaped"))
          .where(expr("global_dupes > 0"))
          .selectExpr("n_docs", "dup_groups", "global_dupes", "shard_dupes",
            "escaped", "escaped * 10000 DIV global_dupes AS escape_bp")
      },
      Some(s"""
        WITH docs AS (
          SELECT doc_id, ${Dedup.canonicalKeySql("w")} AS sig,
                 doc_id % 8 AS shard
          FROM (SELECT doc_id, ${wordsSql("text")} AS w
                FROM documents WHERE text IS NOT NULL)),
        pershard AS (
          SELECT sig, shard, CAST(count(*) AS BIGINT) AS c
          FROM docs GROUP BY 1, 2),
        groups AS (
          SELECT sig, CAST(sum(c) AS BIGINT) AS size,
                 CAST(count(*) AS BIGINT) AS k
          FROM pershard GROUP BY 1),
        c AS (
          SELECT CAST(sum(size) AS BIGINT) AS n_docs,
                 CAST(sum(CASE WHEN size >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS dup_groups,
                 CAST(sum(size - 1) AS BIGINT) AS global_dupes,
                 CAST(sum(size - k) AS BIGINT) AS shard_dupes,
                 CAST(sum(k - 1) AS BIGINT) AS escaped
          FROM groups)
        SELECT n_docs, dup_groups, global_dupes, shard_dupes, escaped,
               escaped * 10000 // global_dupes AS escape_bp
        FROM c WHERE global_dupes > 0""")),

    // --------------------------------------------------------------- q555
    QDef("q555_bridges",
      (s, dir) => {
        import s.implicits._
        val nodes = t(s, dir, "lineitem")
          .selectExpr("l_partkey % 200 AS id")
          .where(expr("id >= 1")).distinct()
        val e = nodes.selectExpr("id AS u")
          .join(nodes.selectExpr("id AS v"),
            expr("v = u * 2 OR v = u * 3"))
          .select("u", "v")
        e.as[BrEdge].coalesce(1).sortWithinPartitions("u", "v")
          .mapPartitions { it =>
            val edges = it.toArray
            if (edges.isEmpty) Iterator.empty
            else {
              val adj = scala.collection.mutable.Map[Long,
                scala.collection.mutable.ArrayBuffer[(Long, Int)]]()
              edges.zipWithIndex.foreach { case (ed, i) =>
                adj.getOrElseUpdate(ed.u,
                  scala.collection.mutable.ArrayBuffer()) += ((ed.v, i))
                adj.getOrElseUpdate(ed.v,
                  scala.collection.mutable.ArrayBuffer()) += ((ed.u, i))
              }
              val disc = scala.collection.mutable.Map[Long, Int]()
              val low = scala.collection.mutable.Map[Long, Int]()
              val bridges = scala.collection.mutable.ArrayBuffer[Int]()
              var timer = 0
              def dfs(start: Long): Unit = {
                // iterative Tarjan (node, parent-edge, child-iterator idx)
                val stack = scala.collection.mutable.Stack[(Long, Int, Int)]()
                stack.push((start, -1, 0))
                disc(start) = timer; low(start) = timer; timer += 1
                while (stack.nonEmpty) {
                  val (n, pe, i) = stack.pop()
                  val ns = adj(n)
                  if (i < ns.length) {
                    stack.push((n, pe, i + 1))
                    val (m, ei) = ns(i)
                    if (ei != pe) {
                      if (!disc.contains(m)) {
                        disc(m) = timer; low(m) = timer; timer += 1
                        stack.push((m, ei, 0))
                      } else low(n) = math.min(low(n), disc(m))
                    }
                  } else if (pe != -1) {
                    // retreat: propagate low to parent, test bridge
                    val ed = edges(pe)
                    val (par, child) =
                      if (disc(ed.u) < disc(ed.v)) (ed.u, ed.v) else (ed.v, ed.u)
                    low(par) = math.min(low(par), low(child))
                    if (low(child) > disc(par)) bridges += pe
                  }
                }
              }
              adj.keys.toSeq.sorted.foreach(n => if (!disc.contains(n)) dfs(n))
              val deg = adj.view.mapValues(_.length).toMap
              bridges.toSeq.map(edges).sortBy(ed => (ed.u, ed.v)).iterator
                .map(ed => BrOut(ed.u, ed.v,
                  if (deg(ed.u) == 1 || deg(ed.v) == 1) 1L else 0L))
            }
          }
          .toDF()
          .orderBy("u", "v")
      },
      Some("""
        WITH RECURSIVE nodes AS (
          SELECT DISTINCT l_partkey % 200 AS id FROM lineitem
          WHERE l_partkey % 200 >= 1),
        e AS (
          SELECT u.id AS u, v.id AS v,
                 row_number() OVER (ORDER BY u.id, v.id) AS eid
          FROM nodes u JOIN nodes v ON v.id = u.id * 2 OR v.id = u.id * 3),
        adj AS (
          SELECT eid AS via, u AS a, v AS b FROM e
          UNION ALL SELECT eid, v, u FROM e),
        -- reachability from u_e avoiding edge e, for EVERY e at once
        rec AS (
          SELECT eid, u AS node FROM e
          UNION
          SELECT r.eid, a.b
          FROM rec r JOIN adj a ON a.a = r.node AND a.via <> r.eid),
        reach AS (SELECT DISTINCT eid, node FROM rec),
        deg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS d
                FROM adj GROUP BY 1)
        SELECT e.u, e.v,
               CAST(CASE WHEN du.d = 1 OR dv.d = 1 THEN 1 ELSE 0 END
                 AS BIGINT) AS leaf_edge
        FROM e
        JOIN deg du ON du.node = e.u
        JOIN deg dv ON dv.node = e.v
        WHERE NOT EXISTS (SELECT 1 FROM reach r
                          WHERE r.eid = e.eid AND r.node = e.v)
        ORDER BY e.u, e.v""")),

    // --------------------------------------------------------------- q556
    QDef("q556_vcg_auction",
      (s, dir) => {
        val bids = t(s, dir, "supplier")
          .where(col("s_acctbal") > 0)
          .selectExpr("s_suppkey",
            "CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS bid")
          .orderBy(col("bid").desc, col("s_suppkey")).limit(8)
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("bid").desc, col("s_suppkey"))
        val ranked = bids.withColumn("rk", row_number().over(w))
        ranked.cache(); ranked.count()
        // slot weights w1..w3 = 10, 6, 3; w4 = 0
        val pay = ranked.where(col("rk") <= 3)
          .join(broadcast(ranked.selectExpr("rk AS mrk", "bid AS mbid")),
            expr("mrk > rk AND mrk <= 4"), "left")
          .withColumn("wprev", expr(
            "CASE mrk - 1 WHEN 1 THEN 10 WHEN 2 THEN 6 WHEN 3 THEN 3 ELSE 0 END"))
          .withColumn("wcur", expr(
            "CASE mrk WHEN 1 THEN 10 WHEN 2 THEN 6 WHEN 3 THEN 3 ELSE 0 END"))
          .groupBy("rk", "s_suppkey", "bid").agg(
            coalesce(sum(expr("mbid * (wprev - wcur)")), lit(0L))
              .cast("long").as("pnum"))
          .withColumn("wk", expr(
            "CASE rk WHEN 1 THEN 10 WHEN 2 THEN 6 ELSE 3 END"))
          .selectExpr("CAST(rk AS BIGINT) AS slot", "s_suppkey", "bid",
            "pnum DIV wk AS payment",
            "pnum * 1000 DIV wk AS payment_milli")
        pay.orderBy("slot")
      },
      Some("""
        WITH bids AS (
          SELECT s_suppkey,
                 CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS bid
          FROM supplier WHERE s_acctbal > 0
          ORDER BY bid DESC, s_suppkey LIMIT 8),
        ranked AS (
          SELECT s_suppkey, bid,
                 row_number() OVER (ORDER BY bid DESC, s_suppkey) AS rk
          FROM bids),
        pay AS (
          SELECT r.rk AS slot, r.s_suppkey, r.bid,
                 CAST(coalesce(sum(m.bid *
                   ((CASE m.rk - 1 WHEN 1 THEN 10 WHEN 2 THEN 6
                     WHEN 3 THEN 3 ELSE 0 END) -
                    (CASE m.rk WHEN 1 THEN 10 WHEN 2 THEN 6
                     WHEN 3 THEN 3 ELSE 0 END))), 0) AS BIGINT) AS pnum
          FROM ranked r LEFT JOIN ranked m ON m.rk > r.rk AND m.rk <= 4
          WHERE r.rk <= 3
          GROUP BY 1, 2, 3)
        SELECT slot, s_suppkey, bid,
               pnum // (CASE slot WHEN 1 THEN 10 WHEN 2 THEN 6 ELSE 3 END)
                 AS payment,
               pnum * 1000 // (CASE slot WHEN 1 THEN 10 WHEN 2 THEN 6
                 ELSE 3 END) AS payment_milli
        FROM pay ORDER BY slot""")),

    // --------------------------------------------------------------- q557
    QDef("q557_pid_replay",
      (s, dir) => {
        import s.implicits._
        val daily = t(s, dir, "orders")
          .selectExpr(
            "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS day")
          .groupBy("day").agg(count(lit(1)).as("load"))
          .as[PidDay]
        daily.coalesce(1).sortWithinPartitions("day")
          .mapPartitions { it =>
            var cap = 0L; var integ = 0L; var prevE = 0L
            var n = 0L; var totAbs = 0L
            var maxOver = Long.MinValue; var maxUnder = Long.MinValue
            var first = true
            it.foreach { d =>
              val e = d.load - cap
              integ += e
              val de = if (first) 0L else e - prevE
              cap = cap + (2 * e + integ / 4 + 4 * de) / 8
              prevE = e; first = false; n += 1
              totAbs += math.abs(e)
              if (cap - d.load > maxOver) maxOver = cap - d.load
              if (d.load - cap > maxUnder) maxUnder = d.load - cap
            }
            if (n == 0) Iterator.empty
            else Iterator.single(PidOut(n, cap, totAbs, maxOver, maxUnder))
          }
          .toDF()
      },
      Some("""
        WITH RECURSIVE daily AS (
          SELECT epoch_ms(o_orderdate) // 86400000 AS day,
                 CAST(count(*) AS BIGINT) AS load
          FROM orders GROUP BY 1),
        r AS (
          SELECT day, load,
                 row_number() OVER (ORDER BY day) AS rn,
                 count(*) OVER () AS cnt
          FROM daily),
        b AS (
          SELECT rn, cnt, load,
                 -- state AFTER processing row rn
                 CAST((2 * load + load // 4) // 8 AS BIGINT) AS cap,
                 load AS integ, load AS preve,
                 CAST(abs(load) AS BIGINT) AS totabs,
                 CAST((2 * load + load // 4) // 8 - load AS BIGINT) AS maxover,
                 CAST(load - (2 * load + load // 4) // 8 AS BIGINT) AS maxunder
          FROM r WHERE rn = 1
          UNION ALL
          SELECT r.rn, r.cnt, r.load,
                 b.cap + (2 * (r.load - b.cap) + (b.integ + r.load - b.cap) // 4
                   + 4 * ((r.load - b.cap) - b.preve)) // 8,
                 b.integ + r.load - b.cap,
                 r.load - b.cap,
                 b.totabs + abs(r.load - b.cap),
                 greatest(b.maxover,
                   b.cap + (2 * (r.load - b.cap) + (b.integ + r.load - b.cap) // 4
                     + 4 * ((r.load - b.cap) - b.preve)) // 8 - r.load),
                 greatest(b.maxunder,
                   r.load - (b.cap + (2 * (r.load - b.cap)
                     + (b.integ + r.load - b.cap) // 4
                     + 4 * ((r.load - b.cap) - b.preve)) // 8))
          FROM b JOIN r ON r.rn = b.rn + 1)
        SELECT CAST(cnt AS BIGINT) AS n_days, cap AS end_capacity,
               totabs AS total_abs_err, maxover AS max_overshoot,
               maxunder AS max_undershoot
        FROM b WHERE rn = cnt"""))
  )
}
