package graft.queries

import graft.Tables.t
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 73 — band joins, resampling,
  * record linkage, and spatial bulk-loading:
  *
  *  - q315: BANDED time-range join — same-customer order pairs within
  *    ±7 days, implemented as an equi-join on 15-day buckets with the
  *    left side exploded to its 3 candidate buckets (band < bucket ⇒
  *    the right side's single bucket matches exactly one candidate, so
  *    no dedup): the scale path that turns an O(n·m) theta join into a
  *    shuffle-joinable equality. Oracle = the plain inequality join,
  *    proving the bucketed plan computes the same relation.
  *  - q316: jackknife (leave-one-stratum-out) means — each segment's
  *    influence on the global account-balance mean, exact sums with one
  *    floor-quantized division per row.
  *  - q317: Fellegi–Sunter record-linkage scoring — blocked candidate
  *    pairs scored by fixed integer agree/disagree weights (quantized
  *    log-likelihood ratios), score histogram; the classic ER scorer
  *    upstream of q216's clustering.
  *  - q318: STR-style spatial bulk-loading — pack event points into
  *    256-row leaf pages in Morton-curve order vs arrival order and
  *    compare page MBR area + pairwise page overlaps (integer synthetic
  *    coordinates end-to-end); quantifies why space-filling-curve
  *    layout makes spatial scans prunable (pairs with q156's Z-order).
  *
  * Reference analog: responses near a task's submission window,
  * per-AOI contribution to fleet metrics, listing identity resolution,
  * R-tree-style grid-page layout for AOI scans.
  */
object QueriesCB extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q315
    QDef("q315_band_range_join",
      (s, dir) => {
        val ord = t(s, dir, "orders").selectExpr("o_orderkey", "o_custkey",
          "o_orderpriority",
          "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS d")
        val left = ord
          .withColumn("b", explode(expr(
            "array(d DIV 15 - 1, d DIV 15, d DIV 15 + 1)")))
          .toDF("okey_a", "cust_a", "prio_a", "d_a", "b")
        val right = ord.selectExpr("o_orderkey AS okey_b",
          "o_custkey AS cust_b", "d AS d_b", "d DIV 15 AS b")
        left.join(right, Seq("b"))
          .where(col("cust_a") === col("cust_b") &&
            col("okey_a") < col("okey_b") &&
            abs(col("d_a") - col("d_b")) <= 7)
          .groupBy(col("prio_a").as("o_orderpriority"))
          .agg(count(lit(1)).as("n_pairs"),
            countDistinct(col("okey_a")).as("n_orders_hit"),
            expr("CAST(sum(abs(d_a - d_b)) AS BIGINT)").as("sum_gap"))
          .selectExpr("o_orderpriority", "n_pairs", "n_orders_hit",
            """CAST(floor(CAST(sum_gap AS DOUBLE) / CAST(n_pairs AS DOUBLE)
               * 1000000) AS BIGINT) AS avg_gap_micro""")
          .orderBy("o_orderpriority")
      },
      Some("""
        WITH ord AS (
          SELECT o_orderkey, o_custkey, o_orderpriority,
                 epoch_ms(o_orderdate) // 86400000 AS d
          FROM orders),
        j AS (
          SELECT a.o_orderpriority, a.o_orderkey AS okey_a,
                 abs(a.d - b.d) AS gap
          FROM ord a JOIN ord b
            ON a.o_custkey = b.o_custkey
           AND a.o_orderkey < b.o_orderkey
           AND abs(a.d - b.d) <= 7)
        SELECT o_orderpriority, count(*) AS n_pairs,
               count(DISTINCT okey_a) AS n_orders_hit,
               CAST(floor(CAST(sum(gap) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) * 1000000) AS BIGINT) AS avg_gap_micro
        FROM j GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q316
    QDef("q316_jackknife",
      (s, dir) => {
        val cust = t(s, dir, "customer").selectExpr("c_mktsegment",
          "CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents")
        val per = cust.groupBy("c_mktsegment")
          .agg(count(lit(1)).as("nh"), sum("cents").cast("bigint").as("sh"))
        val tot = per.agg(sum("nh").cast("bigint").as("n"),
          sum("sh").cast("bigint").as("st"))
        per.crossJoin(broadcast(tot))
          .selectExpr("c_mktsegment", "nh", "sh",
            """CAST(floor(CAST(st AS DOUBLE) / CAST(n AS DOUBLE) * 10000)
               AS BIGINT) AS mean_all_hcents""",
            """CAST(floor(CAST(st - sh AS DOUBLE) / CAST(n - nh AS DOUBLE)
               * 10000) AS BIGINT) AS mean_loo_hcents""")
          .withColumn("influence_hcents",
            col("mean_all_hcents") - col("mean_loo_hcents"))
          .orderBy("c_mktsegment")
      },
      Some("""
        WITH per AS (
          SELECT c_mktsegment, count(*) AS nh,
                 CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
                   AS BIGINT) AS sh
          FROM customer GROUP BY 1),
        tot AS (
          SELECT CAST(sum(nh) AS BIGINT) AS n, CAST(sum(sh) AS BIGINT) AS st
          FROM per)
        SELECT c_mktsegment, nh, sh,
               CAST(floor(CAST(st AS DOUBLE) / CAST(n AS DOUBLE) * 10000)
                 AS BIGINT) AS mean_all_hcents,
               CAST(floor(CAST(st - sh AS DOUBLE) / CAST(n - nh AS DOUBLE)
                 * 10000) AS BIGINT) AS mean_loo_hcents,
               CAST(floor(CAST(st AS DOUBLE) / CAST(n AS DOUBLE) * 10000)
                 AS BIGINT)
                 - CAST(floor(CAST(st - sh AS DOUBLE) / CAST(n - nh AS DOUBLE)
                 * 10000) AS BIGINT) AS influence_hcents
        FROM per, tot ORDER BY c_mktsegment""")),

    // --------------------------------------------------------------- q317
    QDef("q317_linkage_score",
      (s, dir) => {
        // Census-quadratic, not row-quadratic (the q214 pattern): the
        // score depends only on the (seg, bal100, f7) cell, whose domain
        // inside one (nation, blk2) block is ≤ 5·5·7 = 175 BY CONSTRUCTION
        // (a 500-wide blk2 spans 5 bal100 values). Group rows to cells,
        // pair distinct cells (struct order = any total order) weighted
        // c_a·c_b, same-cell pairs c·(c−1)/2 at the all-equal score —
        // block size can grow 100 TB-linear while the pair stage stays
        // constant-bounded.
        val cells = t(s, dir, "customer").selectExpr("c_nationkey AS nat",
            "(CAST(floor(c_acctbal) AS BIGINT) + 1000) DIV 500 AS blk",
            "c_mktsegment AS seg",
            "(CAST(floor(c_acctbal) AS BIGINT) + 1000) DIV 100 AS bal",
            "c_custkey % 7 AS f7")
          .groupBy("nat", "blk", "seg", "bal", "f7")
          .agg(count(lit(1)).as("c"))
        cells.cache(); cells.count() // 3 subtrees of one job read it
        val a = cells.toDF("nat", "blk", "a_seg", "a_bal", "a_f7", "ca")
        val b = cells.toDF("nat", "blk", "b_seg", "b_bal", "b_f7", "cb")
        val cross = a.join(b, Seq("nat", "blk"))
          .where(struct(col("a_seg"), col("a_bal"), col("a_f7")) <
            struct(col("b_seg"), col("b_bal"), col("b_f7")))
          .selectExpr(
            """(CASE WHEN a_seg = b_seg THEN 300 ELSE -150 END)
             + (CASE WHEN a_bal = b_bal THEN 220 ELSE -80 END)
             + (CASE WHEN a_f7 = b_f7 THEN 90 ELSE -60 END) AS score""",
            "ca * cb AS w")
        val same = cells.where(col("c") >= 2)
          .select(lit(300 + 220 + 90).as("score"),
            expr("c * (c - 1) DIV 2").as("w"))
        cross.union(same)
          .groupBy("score").agg(sum("w").as("n_pairs"))
          .orderBy("score")
      },
      Some("""
        WITH c AS (
          SELECT c_custkey, c_nationkey, c_mktsegment,
                 (CAST(floor(c_acctbal) AS BIGINT) + 1000) // 500 AS blk2,
                 (CAST(floor(c_acctbal) AS BIGINT) + 1000) // 100 AS bal100,
                 c_custkey % 7 AS f7
          FROM customer)
        SELECT (CASE WHEN a.c_mktsegment = b.c_mktsegment THEN 300 ELSE -150 END)
             + (CASE WHEN a.bal100 = b.bal100 THEN 220 ELSE -80 END)
             + (CASE WHEN a.f7 = b.f7 THEN 90 ELSE -60 END) AS score,
               count(*) AS n_pairs
        FROM c a JOIN c b
          ON a.c_nationkey = b.c_nationkey AND a.blk2 = b.blk2
         AND a.c_custkey < b.c_custkey
        GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q318
    QDef("q318_str_pack",
      (s, dir) => {
        val pageRows = 256L
        // integer synthetic coordinates (the numerators of SyntheticGeo),
        // Morton-interleaved at 100-unit cell granularity
        val pts = t(s, dir, "events").selectExpr("event_id",
          "(user_id * 47 + event_id * 13) % 36000 AS ix",
          "(user_id * 31 + event_id * 7) % 17000 AS iy")
        def mortonExpr(gx: String, gy: String): String =
          (0 until 9).map(k =>
            s"((($gx) DIV ${1L << k}) % 2) * ${1L << (2 * k)}"
              + s" + ((($gy) DIV ${1L << k}) % 2) * ${1L << (2 * k + 1)}")
            .mkString(" + ")
        def pages(df: DataFrame, orderCols: Seq[String], layout: String) = {
          graft.operators.ScaleRank.withGlobalRowNumber(
              df, orderCols.map(col), "_rn")
            .withColumn("pg", expr(s"(_rn - 1) DIV $pageRows"))
            .groupBy("pg")
            .agg(min("ix").as("x0"), max("ix").as("x1"),
              min("iy").as("y0"), max("iy").as("y1"))
            .withColumn("layout", lit(layout))
        }
        val withM = pts.withColumn("m",
          expr(mortonExpr("ix DIV 100", "iy DIV 100")))
        // def, NOT val: ScaleRank's pinned range parts localCheckpoint
        // EAGERLY at construction, so building the fallback frames
        // unconditionally would run 2 checkpoint jobs even when the
        // point-census path answers (measured r12: 2×(map+reduce) jobs,
        // ~0.4 s, for frames that were never used)
        def all = pages(withM, Seq("m", "ix", "iy", "event_id"), "morton")
          .union(pages(pts, Seq("event_id"), "naive"))
        // r12 POINT-LEVEL DUAL PATH: under the gate, BOTH layouts' page
        // boxes come from one collected point census (two driver sorts
        // replace two two-phase ScaleRank rank passes ≈ 8 jobs with 1);
        // the r11 box-level collect stays as the middle tier, and the
        // distributed box self-join as the scale path. limit(gate+1)
        // bounds driver memory without a count job.
        val gate = 2000000
        val ptRows = pts.limit(gate + 1).collect()
        // dual-path (r11): the box census is rows/256 — at bench SFs a
        // few thousand boxes — so areas + the O(p²) overlap count run
        // driver-side off ONE collect (the rank checkpoints upstream
        // already pin the heavy work). Above the cap the distributed
        // box self-join below is the scale path.
        val CAP = 8000
        val boxesOpt: Option[Array[(String, Long, Long, Long, Long, Long)]] =
          if (ptRows.length <= gate) {
            val p = ptRows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
            // same integer Morton as mortonExpr (gx, gy non-negative)
            def mort(ix: Long, iy: Long): Long = {
              val gx = ix / 100; val gy = iy / 100
              (0 until 9).map(k => ((gx >> k) & 1L) * (1L << (2 * k)) +
                ((gy >> k) & 1L) * (1L << (2 * k + 1))).sum
            }
            def boxesOf(sorted: Array[(Long, Long, Long)], layout: String) =
              sorted.grouped(pageRows.toInt).zipWithIndex.map { case (ch, pg) =>
                (layout, pg.toLong,
                  ch.iterator.map(_._2).min, ch.iterator.map(_._2).max,
                  ch.iterator.map(_._3).min, ch.iterator.map(_._3).max)
              }.toArray
            val ms = p.sortBy { case (id, ix, iy) => (mort(ix, iy), ix, iy, id) }
            Some(boxesOf(ms, "morton") ++ boxesOf(p.sortBy(_._1), "naive"))
          } else {
            val boxes = all.limit(CAP + 1).collect()
            if (boxes.length <= CAP)
              Some(boxes.map(r => (r.getAs[String]("layout"),
                r.getAs[Long]("pg"), r.getAs[Long]("x0"), r.getAs[Long]("x1"),
                r.getAs[Long]("y0"), r.getAs[Long]("y1"))))
            else None
          }
        if (boxesOpt.isDefined) {
          val sc2 = s
          import sc2.implicits._
          val by = boxesOpt.get.groupBy(_._1)
          by.toSeq.flatMap { case (layout, bs) =>
            val area = bs.iterator
              .map(b => (b._4 - b._3) * (b._6 - b._5)).sum
            // box-intersect is symmetric, so each unordered pair once
            // (i < j) matches the pg_a < pg_b dedup of the join form
            var ov = 0L
            val arr = bs.toArray
            var i = 0
            while (i < arr.length) {
              val a = arr(i)
              var j = i + 1
              while (j < arr.length) {
                val b = arr(j)
                if (a._3 <= b._4 && b._3 <= a._4 &&
                  a._5 <= b._6 && b._5 <= a._6) ov += 1
                j += 1
              }
              i += 1
            }
            // inner-join semantics: a layout with zero overlapping
            // pairs has no `overlaps` row and drops from the output
            if (ov > 0) Some((layout, bs.size.toLong, area, ov)) else None
          }.sortBy(_._1)
            .toDF("layout", "n_pages", "sum_area", "n_overlap_pairs")
        } else {
          val allC = all.cache()
          allC.count() // eager: areas + both self-join sides
          val areas = allC.groupBy("layout")
            .agg(count(lit(1)).as("n_pages"),
              expr("CAST(sum((x1 - x0) * (y1 - y0)) AS BIGINT)").as("sum_area"))
          val l = allC.toDF("pg_a", "ax0", "ax1", "ay0", "ay1", "layout")
          val r = allC.toDF("pg_b", "bx0", "bx1", "by0", "by1", "layout")
          val overlaps = l.join(r, Seq("layout"))
            .where(col("pg_a") < col("pg_b") &&
              col("ax0") <= col("bx1") && col("bx0") <= col("ax1") &&
              col("ay0") <= col("by1") && col("by0") <= col("ay1"))
            .groupBy("layout").agg(count(lit(1)).as("n_overlap_pairs"))
          areas.join(overlaps, Seq("layout"))
            .select("layout", "n_pages", "sum_area", "n_overlap_pairs")
            .orderBy("layout")
        }
      },
      Some {
        def mortonExpr(gx: String, gy: String): String =
          (0 until 9).map(k =>
            s"((($gx) // ${1L << k}) % 2) * ${1L << (2 * k)}"
              + s" + ((($gy) // ${1L << k}) % 2) * ${1L << (2 * k + 1)}")
            .mkString(" + ")
        s"""
        WITH pts AS (
          SELECT event_id,
                 (user_id * 47 + event_id * 13) % 36000 AS ix,
                 (user_id * 31 + event_id * 7) % 17000 AS iy
          FROM events),
        wm AS (
          SELECT *, ${mortonExpr("ix // 100", "iy // 100")} AS m FROM pts),
        pgm AS (
          SELECT 'morton' AS layout,
                 (row_number() OVER (ORDER BY m, ix, iy, event_id) - 1) // 256
                   AS pg, ix, iy
          FROM wm),
        pgn AS (
          SELECT 'naive' AS layout,
                 (row_number() OVER (ORDER BY event_id) - 1) // 256 AS pg,
                 ix, iy
          FROM pts),
        pages AS (
          SELECT layout, pg, min(ix) AS x0, max(ix) AS x1,
                 min(iy) AS y0, max(iy) AS y1
          FROM (SELECT * FROM pgm UNION ALL SELECT * FROM pgn)
          GROUP BY 1, 2),
        areas AS (
          SELECT layout, count(*) AS n_pages,
                 CAST(sum((x1 - x0) * (y1 - y0)) AS BIGINT) AS sum_area
          FROM pages GROUP BY 1),
        ovl AS (
          SELECT a.layout, count(*) AS n_overlap_pairs
          FROM pages a JOIN pages b
            ON a.layout = b.layout AND a.pg < b.pg
           AND a.x0 <= b.x1 AND b.x0 <= a.x1
           AND a.y0 <= b.y1 AND b.y0 <= a.y1
          GROUP BY 1)
        SELECT layout, n_pages, sum_area, n_overlap_pairs
        FROM areas JOIN ovl USING (layout) ORDER BY layout"""
      })
  )
}
