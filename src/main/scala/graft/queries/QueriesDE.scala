package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 102 — optimal-vs-heuristic cache
  * policy replay:
  *
  *  - q431: Belady OPT vs LRU cache replay — per supplier, the part-
  *    access sequence (shipdate order, deterministic tiebreaks) replayed
  *    against a 4-entry cache under BOTH policies in one pass. OPT's
  *    clairvoyant eviction (victim = max next-use) needs no lookahead at
  *    replay time because next-use indices are PRECOMPUTED with one
  *    lead() window over (supplier, part) — the classic trick that turns
  *    Belady into a streaming recurrence. Per-key sequential state (two
  *    ≤4-entry caches) runs on the secondary-sort mapPartitions scale
  *    path (hash-repartition by supplier, one streaming pass, O(1)
  *    state); the oracle replays the identical recurrence as a recursive
  *    CTE carrying the caches as LIST-of-STRUCT state. Per-nation
  *    rollup; Belady optimality (opt ≥ lru, per supplier, hence per
  *    rollup) is the spec.
  *
  * Reference analog: response-cache sizing and eviction policy for
  * repeat scrapes (q385's MRC says how big; this says how well the
  * implementable policy does vs the clairvoyant bound).
  */
object QueriesDE extends QueryPack {
  import Q._

  // NOT private: Spark codegen accesses these.
  case class Acc(sup: Long, s: Long, p: Long, nu: Long)
  case class CacheOut(sup: Long, n_acc: Long, opt_hits: Long, lru_hits: Long)

  private val Cap = 4
  private val Sentinel = 1000000000000000L

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q431
    QDef("q431_opt_cache",
      (s, dir) => {
        import s.implicits._
        val acc = t(s, dir, "lineitem")
          .selectExpr("l_suppkey AS sup", "l_partkey AS p",
            "unix_millis(CAST(l_shipdate AS TIMESTAMP)) AS ms",
            "l_orderkey AS ok", "l_linenumber AS ln")
          .withColumn("s", row_number().over(Window.partitionBy("sup")
            .orderBy("ms", "ok", "ln")).cast("long"))
          .withColumn("nu", coalesce(lead("s", 1).over(Window
            .partitionBy("sup", "p").orderBy("s")), lit(Sentinel)))
          .select(col("sup").cast("long"), col("s"),
            col("p").cast("long"), col("nu").cast("long"))
          .as[Acc]
        val replay = acc
          .repartition(col("sup")).sortWithinPartitions("sup", "s")
          .mapPartitions { it =>
            // one output row per supplier in the partition (bounded);
            // O(1) cache state per live key
            val out = scala.collection.mutable.ArrayBuffer.empty[CacheOut]
            var cur = -1L
            val opt = scala.collection.mutable.HashMap.empty[Long, Long]
            val lru = scala.collection.mutable.HashMap.empty[Long, Long]
            var n = 0L; var oh = 0L; var lh = 0L
            def flush(): Unit = if (cur >= 0) out += CacheOut(cur, n, oh, lh)
            it.foreach { a =>
              if (a.sup != cur) {
                flush()
                cur = a.sup; n = 0; oh = 0; lh = 0
                opt.clear(); lru.clear()
              }
              n += 1
              // OPT: cached nu is the step of that part's next use
              if (opt.contains(a.p)) { oh += 1; opt(a.p) = a.nu }
              else {
                if (opt.size >= Cap) {
                  val victim = opt.maxBy { case (p, nu) => (nu, p) }._1
                  opt.remove(victim)
                }
                opt(a.p) = a.nu
              }
              // LRU: cached value is the last-access step
              if (lru.contains(a.p)) { lh += 1; lru(a.p) = a.s }
              else {
                if (lru.size >= Cap) {
                  val victim = lru.minBy { case (p, last) => (last, p) }._1
                  lru.remove(victim)
                }
                lru(a.p) = a.s
              }
            }
            flush()
            out.iterator
          }.toDF()
        replay
          .join(broadcast(t(s, dir, "supplier")
            .selectExpr("s_suppkey", "CAST(s_nationkey AS BIGINT) AS nk")),
            col("sup") === col("s_suppkey"))
          .join(broadcast(t(s, dir, "nation")
            .selectExpr("CAST(n_nationkey AS BIGINT) AS nk2", "n_name")),
            col("nk") === col("nk2"))
          .groupBy("n_name").agg(
            count(lit(1)).cast("long").as("n_sup"),
            sum("n_acc").cast("bigint").as("accesses"),
            sum("opt_hits").cast("bigint").as("opt_hits"),
            sum("lru_hits").cast("bigint").as("lru_hits"))
          .selectExpr("n_name", "n_sup", "accesses", "opt_hits", "lru_hits",
            "opt_hits * 10000 DIV accesses AS opt_bp",
            "lru_hits * 10000 DIV accesses AS lru_bp")
          .orderBy("n_name")
      },
      Some("""
        WITH RECURSIVE acc AS MATERIALIZED (
          SELECT l_suppkey AS sup, l_partkey AS p,
                 row_number() OVER (PARTITION BY l_suppkey
                   ORDER BY epoch_ms(l_shipdate), l_orderkey, l_linenumber)
                   AS s
          FROM lineitem),
        nxt AS MATERIALIZED (
          SELECT sup, p, s,
                 coalesce(lead(s) OVER (PARTITION BY sup, p ORDER BY s),
                          1000000000000000) AS nu
          FROM acc),
        maxs AS MATERIALIZED (SELECT sup, max(s) AS ns FROM acc GROUP BY 1),
        rec AS (
          SELECT sup, CAST(0 AS BIGINT) AS s,
                 CAST([] AS STRUCT(p BIGINT, nu BIGINT)[]) AS oc,
                 CAST([] AS STRUCT(p BIGINT, last BIGINT)[]) AS lc,
                 CAST(0 AS BIGINT) AS oh, CAST(0 AS BIGINT) AS lh
          FROM maxs
          UNION ALL
          SELECT r.sup, r.s + 1,
                 CASE
                   WHEN len(list_filter(r.oc, x -> x.p = a.p)) > 0
                   THEN list_append(list_filter(r.oc, x -> x.p != a.p),
                                    {'p': a.p, 'nu': a.nu})
                   WHEN len(r.oc) < 4
                   THEN list_append(r.oc, {'p': a.p, 'nu': a.nu})
                   ELSE list_append(
                     list_filter(r.oc, x -> NOT (
                       x.nu = list_max(list_transform(r.oc,
                         y -> {'nu': y.nu, 'pp': y.p})).nu
                       AND x.p = list_max(list_transform(r.oc,
                         y -> {'nu': y.nu, 'pp': y.p})).pp)),
                     {'p': a.p, 'nu': a.nu})
                 END AS oc,
                 CASE
                   WHEN len(list_filter(r.lc, x -> x.p = a.p)) > 0
                   THEN list_append(list_filter(r.lc, x -> x.p != a.p),
                                    {'p': a.p, 'last': a.s})
                   WHEN len(r.lc) < 4
                   THEN list_append(r.lc, {'p': a.p, 'last': a.s})
                   ELSE list_append(
                     list_filter(r.lc, x -> NOT (
                       x.last = list_min(list_transform(r.lc,
                         y -> {'last': y.last, 'pp': y.p})).last
                       AND x.p = list_min(list_transform(r.lc,
                         y -> {'last': y.last, 'pp': y.p})).pp)),
                     {'p': a.p, 'last': a.s})
                 END AS lc,
                 r.oh + CASE WHEN len(list_filter(r.oc, x -> x.p = a.p)) > 0
                             THEN 1 ELSE 0 END AS oh,
                 r.lh + CASE WHEN len(list_filter(r.lc, x -> x.p = a.p)) > 0
                             THEN 1 ELSE 0 END AS lh
          FROM rec r JOIN nxt a ON a.sup = r.sup AND a.s = r.s + 1),
        fin AS (
          SELECT rec.sup, rec.s AS n_acc, rec.oh, rec.lh
          FROM rec JOIN maxs ON rec.sup = maxs.sup AND rec.s = maxs.ns)
        SELECT n_name, CAST(count(*) AS BIGINT) AS n_sup,
               CAST(sum(n_acc) AS BIGINT) AS accesses,
               CAST(sum(oh) AS BIGINT) AS opt_hits,
               CAST(sum(lh) AS BIGINT) AS lru_hits,
               CAST(sum(oh) * 10000 // sum(n_acc) AS BIGINT) AS opt_bp,
               CAST(sum(lh) * 10000 // sum(n_acc) AS BIGINT) AS lru_bp
        FROM fin JOIN supplier ON fin.sup = s_suppkey
                 JOIN nation ON s_nationkey = n_nationkey
        GROUP BY 1 ORDER BY 1"""))
  )
}
