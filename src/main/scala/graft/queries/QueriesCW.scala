package graft.queries

import graft.Tables.t
import graft.functions.PortableHash
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 94 — multiple testing, frequent
  * itemsets, resampling inference, greedy scheduling:
  *
  *  - q399: Benjamini–Hochberg FDR over exact sign-test p-values — per
  *    (event_type, dow) the week-over-week daily-count pairs give an
  *    exact binomial tail p = Σ_{j≥s} C(n,j) / 2^n (ties dropped, n ≤ 6,
  *    coefficients from a literal table shared verbatim with the oracle).
  *    The step-up rule p_(k) ≤ k·α/m is evaluated by integer
  *    cross-multiplication (p64·20·m ≤ 64·k at α = 1/20), so the whole
  *    procedure is BIGINT-exact. The many-metrics anomaly-alerting shape:
  *    without FDR control, 35 simultaneous hypotheses at α=.05 fire ~2
  *    false alarms per sweep.
  *  - q400: Apriori frequent brand triples — baskets are each order's
  *    distinct part brands; frequent-1/frequent-2 supports prune the
  *    candidate space (the real Apriori candidate-generation join:
  *    (a,b)⋈(a,c) then (b,c) semi-join) before the triple-support count.
  *    Lift vs independence in exact staged-integer milli. At 100 TB the
  *    prune is the point: candidate triples grow N³ without it, and every
  *    join here is on broadcast-size frequent sets.
  *  - q401: deterministic Poisson bootstrap — the single-pass bootstrap
  *    that works at 100 TB (no resampling shuffle: each row draws a
  *    Poisson(1) weight per replica from the portable hash, inverse-CDF
  *    cutoffs precomputed as 60-bit integer constants). 32 replicas →
  *    exact-rank p05/p95 CI of mean order value per segment.
  *  - q402: greedy interval scheduling (earliest-end-first) per supplier
  *    over [order-day, ship-day] intervals — the classic max-cardinality
  *    non-overlap selection; state (last selected end, count) is a
  *    non-linear recurrence on the secondary-sort mapPartitions scale
  *    path (q124/q149 pattern), recursive-CTE oracle.
  *
  * Reference analog: alerting across many AOI×metric monitor cells,
  * listing-amenity co-occurrence, survey-error bars from one scan,
  * non-overlapping harvest-window selection per worker.
  */
object QueriesCW extends QueryPack {
  import Q._

  // ---- q399: binomial tails Σ_{j≥s} C(n,j) for n ≤ NMax, shared with SQL.
  private val NMax = 6
  private val binomTail: Seq[(Int, Int, Long)] =
    for (n <- 1 to NMax; s <- 0 to n) yield {
      def c(n: Int, k: Int): Long =
        (1 to k).foldLeft(1L)((a, i) => a * (n - i + 1) / i)
      (n, s, (s to n).map(c(n, _)).sum)
    }
  private val binomTailSql: String =
    binomTail.map { case (n, s, t) => s"($n, $s, $t)" }.mkString(", ")

  // ---- q401: Poisson(1) inverse-CDF cutoffs scaled to the 60-bit hash
  // range. Computed once in Scala, embedded as identical integer literals
  // on both engines (no runtime IEEE anywhere).
  private val PoisCut: Seq[Long] = {
    val e = math.exp(-1.0)
    // CDF at k = e^-1 * Σ_{j≤k} 1/j!
    val cdf = Seq(1.0, 2.0, 2.5, 8.0 / 3, 65.0 / 24).map(_ * e)
    cdf.map(p => (p * (1L << 60).toDouble).toLong)
  }
  private def poisW(u: String): String =
    s"""CASE WHEN $u < ${PoisCut(0)} THEN 0 WHEN $u < ${PoisCut(1)} THEN 1
        WHEN $u < ${PoisCut(2)} THEN 2 WHEN $u < ${PoisCut(3)} THEN 3
        WHEN $u < ${PoisCut(4)} THEN 4 ELSE 5 END"""

  // ---- q402 typed rows (NOT private: Spark codegen needs access).
  case class IvRow(sup: Long, st: Long, en: Long, ok: Long, ln: Int)
  case class IvOut(l_suppkey: Long, n_intervals: Long, n_selected: Long)

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q399
    QDef("q399_bh_fdr",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .selectExpr(s"event_type", s"($tsMs) DIV 86400000 AS d")
          .groupBy(col("event_type"), col("d")).agg(count(lit(1)).as("c"))
          .selectExpr("event_type", "d % 7 AS dow", "d DIV 7 AS wk", "c")
        val w = Window.partitionBy("event_type", "dow").orderBy("wk")
        val pairs = daily
          .withColumn("pc", lag("c", 1).over(w))
          .withColumn("pw", lag("wk", 1).over(w))
          .where(col("pw") === col("wk") - 1 && col("pc") =!= col("c"))
        val hyp = pairs.groupBy("event_type", "dow").agg(
          count(lit(1)).as("n_pairs"),
          sum(when(col("c") > col("pc"), 1L).otherwise(0L)).as("s_incr"))
        val tails = s.createDataFrame(binomTail)
          .toDF("n", "sv", "tail")
        val scored = hyp.join(broadcast(tails),
            col("n_pairs") === col("n") && col("s_incr") === col("sv"))
          .selectExpr("event_type", "dow", "n_pairs", "s_incr",
            s"tail * CAST(pow(2, $NMax - n_pairs) AS BIGINT) AS p64")
        val wAll = Window.orderBy("p64", "event_type", "dow")
        val ranked = scored
          .withColumn("rk", row_number().over(wAll))
          .withColumn("m", count(lit(1)).over(Window.partitionBy()))
        ranked
          .withColumn("kmax", max(when(
              col("p64") * 20 * col("m") <= lit(64) * col("rk"), col("rk")))
            .over(Window.partitionBy()))
          .selectExpr("event_type", "CAST(dow AS BIGINT) AS dow",
            "n_pairs", "s_incr", "p64", "CAST(rk AS BIGINT) AS rk",
            "CAST(m AS BIGINT) AS m",
            "CAST(CASE WHEN kmax IS NOT NULL AND rk <= kmax THEN 1 ELSE 0 END AS BIGINT) AS rejected")
          .orderBy("rk")
      },
      Some(s"""
        WITH daily AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS d, count(*) AS c
          FROM events GROUP BY 1, 2),
        wk AS (
          SELECT event_type, d % 7 AS dow, d // 7 AS wk, c FROM daily),
        pairs AS (
          SELECT event_type, dow, c,
                 lag(c) OVER (PARTITION BY event_type, dow ORDER BY wk) AS pc,
                 lag(wk) OVER (PARTITION BY event_type, dow ORDER BY wk) AS pw,
                 wk
          FROM wk),
        hyp AS (
          SELECT event_type, dow, count(*) AS n_pairs,
                 sum(CASE WHEN c > pc THEN 1 ELSE 0 END) AS s_incr
          FROM pairs WHERE pw = wk - 1 AND pc <> c
          GROUP BY 1, 2),
        tails(n, sv, tail) AS (VALUES $binomTailSql),
        scored AS (
          SELECT h.event_type, h.dow, h.n_pairs, h.s_incr,
                 t.tail * CAST(pow(2, $NMax - h.n_pairs) AS BIGINT) AS p64
          FROM hyp h JOIN tails t ON h.n_pairs = t.n AND h.s_incr = t.sv),
        ranked AS (
          SELECT *, row_number() OVER (ORDER BY p64, event_type, dow) AS rk,
                 count(*) OVER () AS m
          FROM scored),
        fin AS (
          SELECT *, max(CASE WHEN p64 * 20 * m <= 64 * rk THEN rk END)
                   OVER () AS kmax
          FROM ranked)
        SELECT event_type, CAST(dow AS BIGINT) AS dow,
               CAST(n_pairs AS BIGINT) AS n_pairs,
               CAST(s_incr AS BIGINT) AS s_incr, p64,
               CAST(rk AS BIGINT) AS rk, CAST(m AS BIGINT) AS m,
               CAST(CASE WHEN kmax IS NOT NULL AND rk <= kmax
                    THEN 1 ELSE 0 END AS BIGINT) AS rejected
        FROM fin ORDER BY rk""")),

    // --------------------------------------------------------------- q400
    QDef("q400_apriori_triples",
      (s, dir) => {
        // Basket-array shape (r10, the q140 pattern): the brand domain is
        // 25 values, so the per-order basket is a ≤25-element sorted
        // array built in ONE collect_set shuffle; pairs and triples are
        // enumerated MAP-SIDE from the array and partially aggregated
        // into ≤C(25,2)/C(25,3) keys — nothing pairwise ever shuffles.
        // The r9 form self-joined the basket table three ways (52M triple
        // rows through joins at sf1, 13.8s). freq1/freq2 are bounded
        // censuses (≤25 / ≤300 rows) and compact on the driver; the
        // Apriori cand filter commutes with the triple count, so it
        // applies AFTER the tiny aggregate.
        val sc3 = s
        import sc3.implicits._
        def basketsDf = t(s, dir, "lineitem")
          .join(broadcast(t(s, dir, "part")
            .select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("ok"), col("p_brand"))
          // ok is near-unique per task, so the map-side partial
          // collect_set reduces nothing — pre-partitioning by ok moves
          // the same bytes once and runs the set build at full width
          // instead of on the single-row-group scan task (the
          // QueriesC.shingled idiom); the groupBy reuses the exchange.
          .repartition(col("ok"))
          .groupBy("ok")
          .agg(sort_array(collect_set(col("p_brand"))).as("bs"))
        def nk(x: String) = (x != null, if (x == null) "" else x)
        // r12 UNIFIED SINGLE-JOB PATH: one kind-tagged enumeration pass
        // over the DISTINCT-basket census feeds a ≤ 1+25+C(25,2)+C(25,3)
        // support census, and every Apriori decision (nOrders, freq1,
        // freq2, cand, supports, lift) happens on the driver — 1 job
        // instead of 4 (count + freq1 + freq2 + triples), no cache.
        // support(t) is filter-independent (counting pairs/triples
        // WITHOUT the freq1 pre-intersection is exactly the sum the
        // oracle computes), and support over distinct baskets weighted
        // by multiplicity equals support over orders (r11): the brand
        // domain is 25 values, so ≤ 2^25 distinct baskets exist at ANY
        // scale and the enumeration fan-out is bounded by the DISTINCT
        // basket count, not the order count. The r11 two-path split
        // (wt=1 below 1M orders) existed because the dedup exchange cost
        // more than it saved in the old 4-job shape; in the single-census
        // shape the dedup exchange is tiny (≤ |distinct baskets| rows)
        // and the enumeration shrink wins at every SF (measured r12:
        // sf0.1 2.66 → 1.22 s).
          val enumCols = expr("""
            flatten(array(
              array(struct(0 AS kind, CAST(NULL AS STRING) AS ta,
                           CAST(NULL AS STRING) AS tb, CAST(NULL AS STRING) AS tc)),
              transform(bs, x -> struct(1 AS kind, x AS ta,
                           CAST(NULL AS STRING) AS tb, CAST(NULL AS STRING) AS tc)),
              flatten(transform(bs, (x, i) ->
                transform(slice(bs, i + 2, size(bs)),
                  y -> struct(2 AS kind, x AS ta, y AS tb,
                              CAST(NULL AS STRING) AS tc)))),
              flatten(transform(bs, (x, i) ->
                flatten(transform(slice(bs, i + 2, size(bs)), (y, j) ->
                  transform(slice(bs, i + j + 3, size(bs)),
                    z -> struct(3 AS kind, x AS ta, y AS tb, z AS tc))))))
            ))""")
          val census = basketsDf
            .groupBy("bs").agg(count(lit(1)).cast("bigint").as("wt"))
            .select(col("wt"), explode(enumCols).as("e"))
            .groupBy(col("e.kind").as("kind"), col("e.ta").as("ta"),
              col("e.tb").as("tb"), col("e.tc").as("tc"))
            .agg(sum("wt").cast("bigint").as("c"))
            .collect()
          val nOrders = census.collectFirst {
            case r if r.getInt(0) == 0 => r.getLong(4) }.getOrElse(0L)
          val minsup1 = math.max(nOrders / 100, 2L)
          val minsup2 = math.max(nOrders / 200, 2L)
          val freq1 = census.iterator
            .filter(r => r.getInt(0) == 1 && r.getLong(4) >= minsup1)
            .map(r => r.getString(1) -> r.getLong(4)).toMap
          val freq2 = census.iterator
            .filter(r => r.getInt(0) == 2 && r.getLong(4) >= minsup2 &&
              freq1.contains(r.getString(1)) && freq1.contains(r.getString(2)))
            .map(r => (r.getString(1), r.getString(2))).toSet
          val cand = (for {
            (a, b) <- freq2; (a2, c) <- freq2
            if a2 == a && b < c && freq2((b, c))
          } yield (a, b, c)).toSet
          census.iterator
            .filter(r => r.getInt(0) == 3 &&
              cand((r.getString(1), r.getString(2), r.getString(3))))
            .map { r =>
              val (ta, tb, tc, sup) =
                (r.getString(1), r.getString(2), r.getString(3), r.getLong(4))
              val lift = 1000L * sup * nOrders / freq1(ta) * nOrders /
                freq1(tb) / freq1(tc)
              (ta, tb, tc, sup, lift)
            }.toSeq
            .sortBy { case (ta, tb, tc, sup, _) => (-sup, nk(ta), nk(tb), nk(tc)) }
            .take(15)
            .toDF("ta", "tb", "tc", "support", "lift_milli")
      },
      Some("""
        WITH baskets AS (
          SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS b
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        nn AS (SELECT count(DISTINCT ok) AS n FROM baskets),
        freq1 AS (
          SELECT b, count(*) AS s1 FROM baskets GROUP BY 1
          HAVING count(*) >= greatest((SELECT n FROM nn) // 100, 2)),
        b1 AS (SELECT ok, b FROM baskets WHERE b IN (SELECT b FROM freq1)),
        freq2 AS (
          SELECT x.b AS ba, y.b AS bb, count(*) AS s2
          FROM b1 x JOIN b1 y ON x.ok = y.ok AND x.b < y.b
          GROUP BY 1, 2
          HAVING count(*) >= greatest((SELECT n FROM nn) // 200, 2)),
        cand AS (
          SELECT p.ba AS ta, p.bb AS tb, q.bb AS tc
          FROM freq2 p JOIN freq2 q ON p.ba = q.ba AND p.bb < q.bb
          WHERE EXISTS (SELECT 1 FROM freq2 f
                        WHERE f.ba = p.bb AND f.bb = q.bb)),
        sup3 AS (
          SELECT u.b AS ta, v.b AS tb, z.b AS tc, count(*) AS support
          FROM b1 u
          JOIN b1 v ON u.ok = v.ok AND u.b < v.b
          JOIN b1 z ON v.ok = z.ok AND v.b < z.b
          WHERE EXISTS (SELECT 1 FROM cand c
                        WHERE c.ta = u.b AND c.tb = v.b AND c.tc = z.b)
          GROUP BY 1, 2, 3)
        SELECT s.ta, s.tb, s.tc, s.support,
               (((1000 * s.support * (SELECT n FROM nn)) // fa.s1)
                 * (SELECT n FROM nn) // fb.s1) // fc.s1 AS lift_milli
        FROM sup3 s
        JOIN freq1 fa ON fa.b = s.ta
        JOIN freq1 fb ON fb.b = s.tb
        JOIN freq1 fc ON fc.b = s.tc
        ORDER BY s.support DESC, s.ta, s.tb, s.tc LIMIT 15""")),

    // --------------------------------------------------------------- q401
    QDef("q401_poisson_bootstrap",
      (s, dir) => {
        val seg = t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .selectExpr("c_mktsegment AS segment", "o_orderkey AS ok",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
        val point = seg.groupBy("segment").agg(
          count(lit(1)).as("n_orders"),
          expr("(1000 * sum(cents)) DIV count(*)").as("point_milli"))
        val rep = seg
          .withColumn("b", explode(expr("sequence(1, 32)")))
          .withColumn("u",
            PortableHash.md5Long(concat(col("ok"), lit(":"), col("b"))))
          .withColumn("w", expr(poisW("u")))
        val means = rep.groupBy("segment", "b")
          .agg(expr("sum(w * cents)").as("wc"), expr("sum(w)").as("sw"))
          .where(col("sw") > 0)
          .selectExpr("segment", "b", "(1000 * wc) DIV sw AS mean_milli")
        val wSeg = Window.partitionBy("segment").orderBy("mean_milli", "b")
        val ci = means
          .withColumn("rk", row_number().over(wSeg))
          .withColumn("r", count(lit(1)).over(Window.partitionBy("segment")))
          .withColumn("lo_rk", expr("(r + 19) DIV 20"))
          .groupBy("segment").agg(
            max(when(col("rk") === col("lo_rk"), col("mean_milli"))).as("lo_milli"),
            max(when(col("rk") === col("r") - col("lo_rk") + 1,
              col("mean_milli"))).as("hi_milli"))
        point.join(ci, "segment")
          .selectExpr("segment", "n_orders", "point_milli",
            "lo_milli", "hi_milli", "hi_milli - lo_milli AS width_milli")
          .orderBy("segment")
      },
      Some(s"""
        WITH seg AS (
          SELECT c.c_mktsegment AS segment, o.o_orderkey AS ok,
                 CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        pt AS (
          SELECT segment, count(*) AS n_orders,
                 (1000 * sum(cents)) // count(*) AS point_milli
          FROM seg GROUP BY 1),
        rep AS (
          SELECT s.segment, s.cents, g.b,
                 ${PortableHash.md5LongSql("concat(s.ok, ':', g.b)")} AS u
          FROM seg s CROSS JOIN (SELECT unnest(generate_series(1, 32)) AS b) g),
        wt AS (SELECT segment, b, cents, ${poisW("u")} AS w FROM rep),
        means AS (
          SELECT segment, b, (1000 * sum(w * cents)) // sum(w) AS mean_milli
          FROM wt GROUP BY 1, 2 HAVING sum(w) > 0),
        ranked AS (
          SELECT segment, b, mean_milli,
                 row_number() OVER (PARTITION BY segment
                   ORDER BY mean_milli, b) AS rk,
                 count(*) OVER (PARTITION BY segment) AS r
          FROM means),
        ci AS (
          SELECT segment,
                 max(CASE WHEN rk = (r + 19) // 20 THEN mean_milli END) AS lo_milli,
                 max(CASE WHEN rk = r - (r + 19) // 20 + 1
                     THEN mean_milli END) AS hi_milli
          FROM ranked GROUP BY 1)
        SELECT p.segment, p.n_orders, CAST(p.point_milli AS BIGINT) AS point_milli,
               CAST(c.lo_milli AS BIGINT) AS lo_milli, CAST(c.hi_milli AS BIGINT) AS hi_milli,
               CAST(c.hi_milli - c.lo_milli AS BIGINT) AS width_milli
        FROM pt p JOIN ci c ON p.segment = c.segment
        ORDER BY p.segment""")),

    // --------------------------------------------------------------- q402
    QDef("q402_interval_scheduling",
      (s, dir) => {
        import s.implicits._
        val iv = t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .selectExpr("l_suppkey AS sup",
            "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS st",
            "unix_millis(CAST(l_shipdate AS TIMESTAMP)) DIV 86400000 AS en",
            "l_orderkey AS ok", "l_linenumber AS ln")
          .as[IvRow]
        iv.repartition(col("sup"))
          .sortWithinPartitions("sup", "en", "st", "ok", "ln")
          .mapPartitions { it =>
            new Iterator[IvOut] {
              private var pending: Option[IvOut] = None
              private var cur = -1L
              private var lastEnd = Long.MinValue
              private var n = 0L; private var sel = 0L
              private def close(): IvOut = IvOut(cur, n, sel)
              private def roll(): Unit = {
                while (pending.isEmpty && it.hasNext) {
                  val e = it.next()
                  if (e.sup != cur) {
                    if (cur != -1L) pending = Some(close())
                    cur = e.sup; lastEnd = Long.MinValue; n = 0L; sel = 0L
                  }
                  n += 1
                  if (e.st > lastEnd) { sel += 1; lastEnd = e.en }
                }
                if (pending.isEmpty && cur != -1L) {
                  pending = Some(close()); cur = -1L
                }
              }
              def hasNext: Boolean = { roll(); pending.isDefined }
              def next(): IvOut = { roll(); val r = pending.get; pending = None; r }
            }
          }
          .toDF()
          .withColumn("sel_bp", expr("10000 * n_selected DIV n_intervals"))
          .orderBy("l_suppkey")
      },
      Some("""
        WITH RECURSIVE iv AS (
          SELECT l.l_suppkey AS sup,
                 epoch_ms(o.o_orderdate) // 86400000 AS st,
                 epoch_ms(l.l_shipdate) // 86400000 AS en,
                 row_number() OVER (PARTITION BY l.l_suppkey
                   ORDER BY epoch_ms(l.l_shipdate) // 86400000,
                            epoch_ms(o.o_orderdate) // 86400000,
                            l.l_orderkey, l.l_linenumber) AS rn,
                 count(*) OVER (PARTITION BY l.l_suppkey) AS cnt
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        b AS (
          SELECT sup, rn, cnt, en AS last_end,
                 CAST(1 AS BIGINT) AS sel
          FROM iv WHERE rn = 1
          UNION ALL
          SELECT i.sup, i.rn, i.cnt,
                 CASE WHEN i.st > b.last_end THEN i.en ELSE b.last_end END,
                 b.sel + CASE WHEN i.st > b.last_end THEN 1 ELSE 0 END
          FROM b JOIN iv i ON i.sup = b.sup AND i.rn = b.rn + 1)
        SELECT sup AS l_suppkey, CAST(cnt AS BIGINT) AS n_intervals,
               sel AS n_selected, 10000 * sel // cnt AS sel_bp
        FROM b WHERE rn = cnt ORDER BY sup"""))
  )
}
