package graft.queries

import graft.Tables.t
import graft.functions.PortableHash
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 90 — second-moment sketching, ranking
  * under uncertainty, cache economics, drift monitoring:
  *
  *  - q383: AMS/F2 sketch — 16 signed counters (sign = parity of the
  *    portable md5) estimate the self-join size Σ cnt² of l_partkey;
  *    mean- and median-of-squares estimators vs the exact F2, error in
  *    bp. Completes the sketch family (HLL q17, CMS q96, Bloom q97,
  *    KMV q98, MinHash q31): F2 is the join-planner's skew signal.
  *    All-integer, map-side mergeable — ONE 16-group shuffle at 100 TB.
  *  - q384: Wilson lower confidence bound — per-brand "not returned"
  *    share ranked by the 95% Wilson LCB vs the raw share; the
  *    small-sample-safe leaderboard (one fixed IEEE op order, floor-
  *    micro quantized; ranks and displacement integer).
  *  - q385: LRU miss-ratio curve — per-access stack distance (distinct
  *    keys between successive references of the same key) via a
  *    block-banded self-join (no O(n²) nested loop), then hit rates at
  *    capacities 4..64 in one sweep; the cache-sizing curve. Scale
  *    path: SHARDS-style key sampling replaces the global ordinal.
  *  - q386: PSI drift — Population Stability Index between the first
  *    15 days and the rest, per event type, over reference-decile bins
  *    (exact rank edges, Laplace-smoothed shares, per-bin floor-pico
  *    terms so the 10-term sum is order-independent).
  *
  * Reference analog: estimated-listings skew accounting, listing
  * leaderboards from few reviews, response-cache sizing for repeat
  * scrapes, price-distribution drift between harvest waves.
  */
object QueriesCS extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q383
    QDef("q383_ams_f2",
      (s, dir) => {
        // census-first (r11): the sketch sign depends only on (j, partkey),
        // so Σ_rows sgn = Σ_pk cnt(pk)·sgn(j,pk) — hash 16×|parts| census
        // rows instead of exploding 16×|lineitem| rows through the j
        // shuffle, and the SAME per-partkey census feeds exact F2 (the r10
        // plan scanned lineitem twice and md5'd every exploded row).
        val census = t(s, dir, "lineitem")
          .groupBy("l_partkey").agg(count(lit(1)).cast("bigint").as("cnt"))
          .cache()
        census.count() // eager: counters + exact both read it
        val counters = census
          .withColumn("j", explode(sequence(lit(0), lit(15))))
          .withColumn("sgn",
            when(PortableHash.md5Long(
              concat_ws(":", col("j").cast("string"),
                col("l_partkey").cast("string")), salt = "ams~") % 2 === 0,
              lit(1L)).otherwise(lit(-1L)))
          .groupBy("j")
          .agg(sum(col("sgn") * col("cnt")).cast("bigint").as("c"))
        val estMean = counters
          .agg(expr("CAST(sum(c * c) DIV 16 AS BIGINT)").as("est_mean"))
        val estMed = counters.select((col("c") * col("c")).as("e"))
          .withColumn("rk", row_number().over(Window.orderBy(col("e"))))
          .where(col("rk") === 8).select(col("e").cast("long").as("est_median"))
        val exact = census
          .agg(expr("CAST(sum(cnt * cnt) AS BIGINT)").as("exact_f2"))
        exact.crossJoin(estMean).crossJoin(estMed)
          .selectExpr("exact_f2", "est_mean", "est_median",
            "abs(est_mean - exact_f2) * 10000 DIV exact_f2 AS err_mean_bp",
            "abs(est_median - exact_f2) * 10000 DIV exact_f2 AS err_median_bp")
      },
      Some {
        val h = PortableHash.md5LongSql(
          "(CAST(j AS VARCHAR) || ':' || CAST(l_partkey AS VARCHAR))",
          salt = "ams~")
        s"""
        WITH signs AS (
          SELECT j, CASE WHEN $h % 2 = 0 THEN 1 ELSE -1 END AS sgn
          FROM lineitem
          CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j) g),
        counters AS (
          SELECT j, CAST(sum(sgn) AS BIGINT) AS c FROM signs GROUP BY 1),
        est_mean AS (
          SELECT CAST(sum(c * c) // 16 AS BIGINT) AS est_mean FROM counters),
        est_med AS (
          SELECT CAST(e AS BIGINT) AS est_median FROM (
            SELECT c * c AS e, row_number() OVER (ORDER BY c * c) AS rk
            FROM counters) WHERE rk = 8),
        exact AS (
          SELECT CAST(sum(cnt * cnt) AS BIGINT) AS exact_f2 FROM (
            SELECT count(*) AS cnt FROM lineitem GROUP BY l_partkey))
        SELECT exact_f2, est_mean, est_median,
               abs(est_mean - exact_f2) * 10000 // exact_f2 AS err_mean_bp,
               abs(est_median - exact_f2) * 10000 // exact_f2 AS err_median_bp
        FROM exact, est_mean, est_med"""
      }),

    // --------------------------------------------------------------- q384
    QDef("q384_wilson_lcb",
      (s, dir) => {
        val base = t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n"),
            sum(when(col("l_returnflag") === "N", 1L).otherwise(0L))
              .cast("bigint").as("pos"))
        val scored = base.selectExpr("p_brand", "n", "pos",
          s"CAST(floor(($WilsonLcb) * 1000000) AS BIGINT) AS lcb_micro",
          "pos * 10000 DIV n AS raw_bp")
        scored
          .withColumn("rank_lcb", row_number().over(
            Window.orderBy(col("lcb_micro").desc, col("p_brand"))))
          .withColumn("rank_raw", row_number().over(
            Window.orderBy(col("raw_bp").desc, col("p_brand"))))
          .selectExpr("p_brand", "n", "pos", "lcb_micro", "raw_bp",
            "rank_lcb", "rank_raw", "abs(rank_lcb - rank_raw) AS moved")
          .orderBy("rank_lcb")
      },
      Some(s"""
        WITH base AS (
          SELECT p_brand, count(*) AS n,
                 CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
                   AS BIGINT) AS pos
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY 1),
        scored AS (
          SELECT p_brand, n, pos,
                 CAST(floor(($WilsonLcb) * 1000000) AS BIGINT) AS lcb_micro,
                 pos * 10000 // n AS raw_bp
          FROM base),
        ranked AS (
          SELECT *,
            row_number() OVER (ORDER BY lcb_micro DESC, p_brand) AS rank_lcb,
            row_number() OVER (ORDER BY raw_bp DESC, p_brand) AS rank_raw
          FROM scored)
        SELECT p_brand, n, pos, lcb_micro, raw_bp, rank_lcb, rank_raw,
               abs(rank_lcb - rank_raw) AS moved
        FROM ranked ORDER BY rank_lcb""")),

    // --------------------------------------------------------------- q385
    QDef("q385_lru_mrc",
      (s, dir) => {
        val B = 256 // ordinal band width for the banded range self-join
        val acc = graft.operators.ScaleRank.withGlobalRowNumber(
          t(s, dir, "events")
            .selectExpr("event_id", "ts",
              "CAST(get_json_object(props, '$.k') AS BIGINT) AS key"),
          Seq(col("ts"), col("event_id")), "ord")
          .cache() // read by reuse, the banded side AND n_total
        acc.count()
        val reuse = acc
          .withColumn("prev_ord", lag("ord", 1).over(
            Window.partitionBy("key").orderBy("ord")))
          .where(col("prev_ord").isNotNull)
          .select("ord", "prev_ord")
          .cache() // read by the banded explode AND the d0 left join
        reuse.count()
        // band the gap so the range join is equi on block id, not O(n²)
        val blocks = reuse.withColumn("b", explode(sequence(
          expr(s"CAST((prev_ord + 1) DIV $B AS BIGINT)"),
          expr(s"CAST(greatest(ord - 1, prev_ord + 1) DIV $B AS BIGINT)"))))
        val accB = acc.selectExpr(s"ord DIV $B AS b",
          "ord AS o2", "key AS k2")
        val dist = blocks.join(accB, Seq("b"))
          .where(col("o2") > col("prev_ord") && col("o2") < col("ord"))
          .groupBy("ord").agg(countDistinct("k2").as("d"))
        val d0 = reuse.join(dist, Seq("ord"), "left")
          .withColumn("d", coalesce(col("d"), lit(0L)))
        val nTotal = acc.agg(count(lit(1)).as("n_total"))
        d0.withColumn("cap", explode(expr("array(4, 8, 16, 32, 64)")))
          .groupBy("cap")
          .agg(sum(when(col("d") < col("cap"), 1L).otherwise(0L))
            .cast("bigint").as("hits"),
            count(lit(1)).as("reuses"))
          .crossJoin(broadcast(nTotal))
          .selectExpr("CAST(cap AS BIGINT) AS cap", "hits", "reuses",
            "n_total", "CAST(hits * 10000 DIV n_total AS BIGINT) AS hit_bp")
          .orderBy("cap")
      },
      Some("""
        WITH acc AS (
          SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS key,
                 row_number() OVER (ORDER BY ts, event_id) AS ord
          FROM events),
        reuse AS (
          SELECT ord, prev_ord FROM (
            SELECT ord, lag(ord) OVER (PARTITION BY key ORDER BY ord)
                     AS prev_ord
            FROM acc) WHERE prev_ord IS NOT NULL),
        dist AS (
          SELECT r.ord, count(DISTINCT a.key) AS d
          FROM reuse r LEFT JOIN acc a
            ON a.ord > r.prev_ord AND a.ord < r.ord
          GROUP BY 1),
        tot AS (SELECT count(*) AS n_total FROM acc)
        SELECT CAST(cap AS BIGINT) AS cap,
               CAST(sum(CASE WHEN d < cap THEN 1 ELSE 0 END) AS BIGINT)
                 AS hits,
               count(*) AS reuses, n_total,
               CAST(sum(CASE WHEN d < cap THEN 1 ELSE 0 END) * 10000
                 // n_total AS BIGINT) AS hit_bp
        FROM dist CROSS JOIN (SELECT unnest([4, 8, 16, 32, 64]) AS cap) c
        CROSS JOIN tot
        GROUP BY cap, n_total ORDER BY cap""")),

    // --------------------------------------------------------------- q386
    QDef("q386_psi_drift",
      (s, dir) => {
        val ev = t(s, dir, "events").where(col("value").isNotNull)
          .selectExpr("event_type", s"($tsMs) DIV 86400000 AS d",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents")
          .cache() // read by dmin, both lab passes and the type census
        val d0 = ev.agg(min("d").as("dmin"))
        val lab = ev.crossJoin(broadcast(d0))
          .selectExpr("event_type", "cents",
            "CASE WHEN d < dmin + 15 THEN 0 ELSE 1 END AS per")
        // decile edges over the DISTINCT-cents census: a value v holds
        // rank range [cum-cnt+1, cum], and the r9 row_number form
        // qualified v iff its MIN rank did — so the census cumsum gives
        // the identical edge while the window sorts |distinct cents| rows
        // per type instead of every ref row (5 types ⇒ 5 giant sort
        // tasks, the 4.9s wall)
        val census = lab.where(col("per") === 0)
          .groupBy("event_type", "cents").agg(count(lit(1)).as("cnt"))
        val cum = census
          .withColumn("cum", sum("cnt").over(
            Window.partitionBy("event_type").orderBy("cents")))
          .withColumn("n", sum("cnt").over(
            Window.partitionBy("event_type")))
        val edges = cum.withColumn("i", explode(sequence(lit(1), lit(9))))
          .groupBy("event_type", "i")
          .agg(max(when((col("cum") - col("cnt") + 1) * 10 <= col("n") * col("i"),
            col("cents"))).as("edge"))
        val edgeCols = (1 to 9).map(i =>
          max(when(col("i") === i, col("edge"))).as(s"e$i"))
        val edgerow = edges.groupBy("event_type")
          .agg(edgeCols.head, edgeCols.tail: _*)
        val binned = lab.join(broadcast(edgerow), Seq("event_type"))
          .selectExpr("event_type", "per",
            "1 + " + (1 to 9).map(i =>
              s"(CASE WHEN cents > e$i THEN 1 ELSE 0 END)")
              .mkString(" + ") + " AS bin")
        val perBin = binned.groupBy("event_type", "bin")
          .agg(sum(when(col("per") === 0, 1L).otherwise(0L))
            .cast("bigint").as("cr"),
            sum(when(col("per") === 1, 1L).otherwise(0L))
              .cast("bigint").as("cc"))
        val allb = ev.select("event_type").distinct()
          .withColumn("bin", explode(sequence(lit(1), lit(10))))
          .join(perBin, Seq("event_type", "bin"), "left")
          .withColumn("cr", coalesce(col("cr"), lit(0L)))
          .withColumn("cc", coalesce(col("cc"), lit(0L)))
        val tots = allb.groupBy("event_type")
          .agg(sum("cr").cast("bigint").as("nr"),
            sum("cc").cast("bigint").as("nc"))
        allb.join(tots, Seq("event_type"))
          .selectExpr("event_type", "nr", "nc",
            s"CAST(floor(($PsiTerm) * 1000000000000) AS BIGINT) AS term_pico")
          .groupBy("event_type", "nr", "nc")
          .agg(sum("term_pico").cast("bigint").as("psi_pico"))
          .selectExpr("event_type", "nr", "nc", "psi_pico")
          .orderBy("event_type")
      },
      Some(s"""
        WITH ev AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS d,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events WHERE value IS NOT NULL),
        mn AS (SELECT min(d) AS dmin FROM ev),
        lab AS (
          SELECT event_type, cents,
                 CASE WHEN d < dmin + 15 THEN 0 ELSE 1 END AS per
          FROM ev, mn),
        ref AS (
          SELECT event_type, cents,
                 row_number() OVER (PARTITION BY event_type ORDER BY cents)
                   AS rk,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM lab WHERE per = 0),
        edges AS (
          SELECT event_type, i,
                 max(CASE WHEN rk * 10 <= n * i THEN cents END) AS edge
          FROM ref
          CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS i) g
          GROUP BY 1, 2),
        edgerow AS (
          SELECT event_type,
                 ${(1 to 9).map(i =>
                   s"max(CASE WHEN i = $i THEN edge END) AS e$i")
                   .mkString(", ")}
          FROM edges GROUP BY 1),
        binned AS (
          SELECT l.event_type, l.per,
                 1 + ${(1 to 9).map(i =>
                   s"(CASE WHEN cents > e$i THEN 1 ELSE 0 END)")
                   .mkString(" + ")} AS bin
          FROM lab l JOIN edgerow USING (event_type)),
        per_bin AS (
          SELECT event_type, bin,
                 CAST(sum(CASE WHEN per = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS cr,
                 CAST(sum(CASE WHEN per = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS cc
          FROM binned GROUP BY 1, 2),
        allb AS (
          SELECT t.event_type, gb.bin,
                 coalesce(pb.cr, 0) AS cr, coalesce(pb.cc, 0) AS cc
          FROM (SELECT DISTINCT event_type FROM ev) t
          CROSS JOIN (SELECT unnest(generate_series(1, 10)) AS bin) gb
          LEFT JOIN per_bin pb USING (event_type, bin)),
        tots AS (
          SELECT event_type, CAST(sum(cr) AS BIGINT) AS nr,
                 CAST(sum(cc) AS BIGINT) AS nc
          FROM allb GROUP BY 1),
        terms AS (
          SELECT a.event_type, nr, nc,
                 CAST(floor(($PsiTerm) * 1000000000000) AS BIGINT)
                   AS term_pico
          FROM allb a JOIN tots USING (event_type))
        SELECT event_type, nr, nc,
               CAST(sum(term_pico) AS BIGINT) AS psi_pico
        FROM terms GROUP BY 1, 2, 3 ORDER BY event_type"""))
  )

  /** 95% Wilson lower bound with z = 1.96 spelled in ONE IEEE op order
    * (shared by the Spark plan and the DuckDB oracle). */
  private val WilsonLcb: String =
    """(CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)
       + 3.8416 / (2.0 * CAST(n AS DOUBLE))
       - 1.96 * sqrt((CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)
           * (1.0 - CAST(pos AS DOUBLE) / CAST(n AS DOUBLE))
           + 3.8416 / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
           / CAST(n AS DOUBLE)))
       / (1.0 + 3.8416 / CAST(n AS DOUBLE))"""

  /** One PSI summand (p−q)·ln(p/q) with Laplace smoothing, ONE op order.
    * Always ≥ 0 (sign(p−q) == sign(ln(p/q))) so floor-pico is safe. */
  private val PsiTerm: String =
    """((CAST(cr AS DOUBLE) + 1.0) / (CAST(nr AS DOUBLE) + 10.0)
       - (CAST(cc AS DOUBLE) + 1.0) / (CAST(nc AS DOUBLE) + 10.0))
      * ln(((CAST(cr AS DOUBLE) + 1.0) / (CAST(nr AS DOUBLE) + 10.0))
         / ((CAST(cc AS DOUBLE) + 1.0) / (CAST(nc AS DOUBLE) + 10.0)))"""
}
