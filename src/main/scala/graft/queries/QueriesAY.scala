package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 44 — feature binning, layout
  * profiling, independence testing, bounded graph search:
  *
  *  - q202: equal-frequency quantile binning (decile discretization) —
  *    the ML feature-binning artifact: per-bin value ranges + row
  *    counts. Ties collapse to the FIRST bin their value's lowest rank
  *    lands in (each distinct value lives in exactly one bin), so bins
  *    are uneven exactly where ties straddle an edge — visible in the
  *    output. Exact BIGINT rank math.
  *  - q203: run-length encoding profile — per event_type: runs of
  *    consecutive same-type events in each user's timeline (lag-compare
  *    + cumulative run starts), run count / mean length / longest run.
  *    The RLE-compressibility input a columnar layout planner reads
  *    (pairs with q156's Z-order effectiveness).
  *  - q204: r×c chi-square independence test (mktsegment × order
  *    priority) — generalizes q133's 2×2: per-cell exact BIGINT
  *    numerator (O·n − r·c)², one fixed IEEE division order per cell,
  *    floor-quantized micro, exact integer sum across cells.
  *  - q205: bounded BFS (3 hops) from the highest-degree node of the
  *    support≥2 co-occurrence graph — per-hop frontier size and
  *    cumulative reach. Each hop is one distributed semi/anti-join
  *    round (the iterative-frontier shape of distributed BFS; depth
  *    bounded, so no driver-side convergence loop).
  *
  * Reference analog: binning = price-band segmentation for reporting;
  * RLE = response-stream storage layout; chi-square = segment×priority
  * independence in collected metadata; BFS = co-visibility
  * neighborhood reach from a hub listing.
  */
object QueriesAY extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q202
    QDef("q202_quantile_bins",
      (s, dir) => {
        val vals = t(s, dir, "lineitem").where(col("l_extendedprice").isNotNull)
          .selectExpr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents")
        // rank only the DISTINCT-value domain: per-value counts + two-
        // phase cumsum; a value's first global rank is cum - cnt + 1, and
        // min(raw_bin) over a tie group is the bin of that first rank
        val byV = vals.groupBy("cents").agg(count(lit(1)).as("cnt"))
        // r12 DUAL PATH: the whole bin table derives from the distinct-
        // value census — under the gate, ONE census job + driver cumsum
        // replaces the two-phase running sum + totals + rollup (~5 jobs).
        // limit(gate+1) bounds driver memory without a count job.
        val gate = 2000000
        val rows = byV.limit(gate + 1).collect()
        if (rows.length <= gate) {
          val sc2 = s
          import sc2.implicits._
          val vc = rows.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
          val n = vc.iterator.map(_._2).sum
          var cum = 0L
          val binned = vc.map { case (v, c) =>
            val bin = cum * 10 / n; cum += c; (bin, v, c)
          }
          binned.groupBy(_._1).toSeq.map { case (bin, g) =>
            (bin, g.iterator.map(_._2).min, g.iterator.map(_._2).max,
              g.iterator.map(_._3).sum, g.length.toLong)
          }.sortBy(_._1)
            .toDF("bin", "lo_cents", "hi_cents", "n_rows", "n_distinct")
        } else {
        val SR = graft.operators.ScaleRank
        val valBin = SR.withTotals(
            SR.withGlobalRunningSum(byV, Seq(col("cents")), col("cnt"), "cum"),
            Seq(sum("cnt").cast("bigint").as("n")))
          .selectExpr("cents", "cnt", "(cum - cnt) * 10 DIV n AS bin")
        valBin.groupBy("bin")
          .agg(min("cents").as("lo_cents"), max("cents").as("hi_cents"),
            sum("cnt").cast("bigint").as("n_rows"),
            count(lit(1)).as("n_distinct"))
          .orderBy("bin")
        }
      },
      Some("""
        WITH vals AS (
          SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
          FROM lineitem WHERE l_extendedprice IS NOT NULL),
        ranked AS (
          SELECT cents,
                 (row_number() OVER (ORDER BY cents) - 1) * 10
                   // count(*) OVER () AS raw_bin
          FROM vals),
        vb AS (
          SELECT cents, CAST(min(raw_bin) AS BIGINT) AS bin, count(*) AS cnt
          FROM ranked GROUP BY 1)
        SELECT bin, min(cents) AS lo_cents, max(cents) AS hi_cents,
               CAST(sum(cnt) AS BIGINT) AS n_rows, count(*) AS n_distinct
        FROM vb GROUP BY 1 ORDER BY bin""")),

    // --------------------------------------------------------------- q203
    QDef("q203_rle_profile",
      (s, dir) => {
        val wu = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
        val runs = t(s, dir, "events")
          .selectExpr("user_id", s"$tsMs AS ts_ms", "event_id", "event_type")
          .withColumn("prev", lag("event_type", 1).over(wu))
          .withColumn("is_start",
            when(col("prev").isNull || col("prev") =!= col("event_type"), 1L).otherwise(0L))
          .withColumn("run_id", sum("is_start").over(
            wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "run_id", "event_type")
          .agg(count(lit(1)).as("len"))
        runs.groupBy("event_type")
          .agg(sum("len").cast("bigint").as("n_events"),
            count(lit(1)).as("n_runs"),
            max("len").cast("bigint").as("max_run"))
          .selectExpr("event_type", "n_events", "n_runs", "max_run",
            "n_events * 1000 DIV n_runs AS mean_run_milli")
          .orderBy("event_type")
      },
      Some("""
        WITH ev AS (
          SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, event_type,
                 lag(event_type) OVER (PARTITION BY user_id
                   ORDER BY epoch_ms(ts), event_id) AS prev
          FROM events),
        st AS (
          SELECT user_id, ts_ms, event_id, event_type,
                 CASE WHEN prev IS NULL OR prev <> event_type THEN 1 ELSE 0 END AS is_start
          FROM ev),
        rid AS (
          SELECT user_id, event_type,
                 CAST(sum(is_start) OVER (PARTITION BY user_id
                   ORDER BY ts_ms, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_id
          FROM st),
        runs AS (
          SELECT user_id, run_id, event_type, count(*) AS len
          FROM rid GROUP BY 1, 2, 3)
        SELECT event_type,
               CAST(sum(len) AS BIGINT) AS n_events,
               count(*) AS n_runs,
               CAST(max(len) AS BIGINT) AS max_run,
               CAST(sum(len) AS BIGINT) * 1000 // count(*) AS mean_run_milli
        FROM runs GROUP BY 1 ORDER BY event_type""")),

    // --------------------------------------------------------------- q204
    QDef("q204_chisq_indep",
      (s, dir) => {
        val joined = t(s, dir, "orders").select(col("o_custkey"), col("o_orderpriority"))
          .join(t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment")),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("seg"), col("o_orderpriority").as("prio"))
        val cells = joined.groupBy("seg", "prio").agg(count(lit(1)).as("o"))
        val rowT = cells.groupBy("seg").agg(sum("o").as("rt"))
        val colT = cells.groupBy("prio").agg(sum("o").as("ct"))
        val n = cells.agg(sum("o").as("n"))
        cells.join(broadcast(rowT), "seg").join(broadcast(colT), "prio")
          .crossJoin(broadcast(n))
          // one fixed IEEE op order: num/den with exact BIGINT inputs,
          // then floor-micro per cell — exact integer sum across cells
          .selectExpr("seg", "prio", "o", "rt", "ct", "n",
            "o * n - rt * ct AS num", "n * rt * ct AS den")
          .selectExpr("seg", "prio",
            """CAST(floor(CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
               / CAST(den AS DOUBLE) * 1000000.0) AS BIGINT) AS cell_micro""")
          .groupBy()
          .agg(count(lit(1)).as("n_cells"),
            sum("cell_micro").cast("bigint").as("chi2_micro"))
          .selectExpr("n_cells", "chi2_micro")
      },
      Some("""
        WITH j AS (
          SELECT c.c_mktsegment AS seg, o.o_orderpriority AS prio
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        cells AS (SELECT seg, prio, count(*) AS o FROM j GROUP BY 1, 2),
        rt AS (SELECT seg, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
        ct AS (SELECT prio, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
        nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
        c2 AS (
          SELECT CAST(floor(CAST(o * n - rt * ct AS DOUBLE) * CAST(o * n - rt * ct AS DOUBLE)
                   / CAST(n * rt * ct AS DOUBLE) * 1000000.0) AS BIGINT) AS cell_micro
          FROM cells JOIN rt USING (seg) JOIN ct USING (prio) CROSS JOIN nn)
        SELECT count(*) AS n_cells, CAST(sum(cell_micro) AS BIGINT) AS chi2_micro
        FROM c2""")),

    // --------------------------------------------------------------- q205
    QDef("q205_bfs_hops",
      (s, dir) => {
        val e = t(s, dir, "lineitem")
          // basket-array pair build (q140/q390 pattern): one collect_set
          // shuffle, pairs map-side from the <=7-part sorted basket
          .groupBy(col("l_orderkey"))
          .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
          .select(explode(expr(
            """flatten(transform(ps, (x, i) ->
               transform(slice(ps, i + 2, size(ps)), y -> struct(x AS a, y AS b))))"""))
            .as("pr"))
          .select(col("pr.a").as("a"), col("pr.b").as("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("w"))
          .where(col("w") >= 2)
          .select("a", "b")
        graft.operators.GraphCensus.bfsCensus(e, "a", "b", hops = 3)
          .orderBy("hop")
      },
      Some("""
        WITH lp AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey FROM lineitem),
        e AS MATERIALIZED (
          SELECT a.l_partkey AS a, b.l_partkey AS b
          FROM lp a JOIN lp b ON a.ok = b.ok AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= 2),
        adj AS MATERIALIZED (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
        src AS MATERIALIZED (
          SELECT u AS v FROM (SELECT u, count(*) AS deg FROM adj GROUP BY 1)
          ORDER BY deg DESC, u LIMIT 1),
        h1 AS MATERIALIZED (
          SELECT DISTINCT adj.v FROM adj JOIN src ON adj.u = src.v
          WHERE adj.v NOT IN (SELECT v FROM src)),
        vis1 AS MATERIALIZED (SELECT v FROM src UNION SELECT v FROM h1),
        h2 AS MATERIALIZED (
          SELECT DISTINCT adj.v FROM adj JOIN h1 ON adj.u = h1.v
          WHERE adj.v NOT IN (SELECT v FROM vis1)),
        vis2 AS MATERIALIZED (SELECT v FROM vis1 UNION SELECT v FROM h2),
        h3 AS MATERIALIZED (
          SELECT DISTINCT adj.v FROM adj JOIN h2 ON adj.u = h2.v
          WHERE adj.v NOT IN (SELECT v FROM vis2)),
        vis3 AS MATERIALIZED (SELECT v FROM vis2 UNION SELECT v FROM h3)
        SELECT CAST(1 AS BIGINT) AS hop,
               (SELECT count(*) FROM h1) AS frontier,
               (SELECT count(*) FROM vis1) AS reached
        UNION ALL
        SELECT CAST(2 AS BIGINT),
               (SELECT count(*) FROM h2), (SELECT count(*) FROM vis2)
        UNION ALL
        SELECT CAST(3 AS BIGINT),
               (SELECT count(*) FROM h3), (SELECT count(*) FROM vis3)
        ORDER BY hop"""))
  )
}
