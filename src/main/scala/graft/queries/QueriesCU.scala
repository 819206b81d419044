package graft.queries

import graft.Tables.t
import graft.functions.TextFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 92 — columnar encoding economics,
  * queueing conservation, computational geometry, collocation mining:
  *
  *  - q391: frame-of-reference bit-packing — price cents in storage
  *    order, 128-value blocks, per-block (max−min) bit width via
  *    length(bin(range)) (no IEEE log2); bytes packed vs raw and the
  *    savings histogram by width. The parquet/ORC encoding cost model
  *    (pairs with q324 delta bits, q353 dictionary, q203 RLE).
  *  - q392: Little's law conservation — time-averaged concurrency from
  *    a +1/−1 sweep integration vs Σduration/T computed independently;
  *    the integral identity L = λ·W proven exactly in BIGINT ms. The
  *    sweep (delta → running sum × time gap) is the scalable
  *    concurrency operator; the identity is its correctness proof.
  *  - q393: directional width — rotating-calipers-style support widths
  *    max⟨d,p⟩ − min⟨d,p⟩ in 8 integer directions per event type over
  *    the synthetic point field (exact centi-degree ints); the convex-
  *    envelope extent summary (hull without hull ordering).
  *  - q394: PMI collocations — adjacent-pair pointwise mutual
  *    information ln(c2·N²/(Nb·c1·cy)) over document bigrams,
  *    floor-micro, top pairs by count. The phrase-mining operator on
  *    top of q57's bigram stream.
  *
  * Reference analog: payload column-store sizing, scraper-worker
  * concurrency accounting, AOI point-cloud extent, listing-title
  * phrase extraction.
  */
object QueriesCU extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q391
    QDef("q391_for_bitpack",
      (s, dir) => {
        val cents = graft.operators.ScaleRank.withGlobalRowNumber(
            t(s, dir, "lineitem")
              .selectExpr("l_orderkey", "l_linenumber",
                "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents"),
            // cents joins the sort key: (okey, lineno) alone is NOT
            // unique in this data (11.8k dup pairs at sf0.01, distinct
            // prices) — ties must be broken identically in both engines
            // or block min/max composition is luck-of-the-sort.
            Seq(col("l_orderkey"), col("l_linenumber"), col("cents")), "rn")
          .selectExpr("cents", "(rn - 1) DIV 128 AS blk")
        val blocks = cents.groupBy("blk")
          .agg(count(lit(1)).as("n"), min("cents").as("mn"),
            max("cents").as("mx"))
          .selectExpr("n",
            "CASE WHEN mx = mn THEN 0 ELSE CAST(length(bin(mx - mn)) AS" +
              " BIGINT) END AS bits")
          .selectExpr("n", "bits",
            "16 + (n * bits + 7) DIV 8 AS packed_bytes", "n * 8 AS raw_bytes")
        blocks.groupBy("bits")
          .agg(count(lit(1)).as("n_blocks"),
            sum("packed_bytes").cast("bigint").as("packed_bytes"),
            sum("raw_bytes").cast("bigint").as("raw_bytes"))
          .selectExpr("bits", "n_blocks", "packed_bytes", "raw_bytes",
            "(raw_bytes - packed_bytes) * 10000 DIV raw_bytes AS savings_bp")
          .orderBy("bits")
      },
      Some("""
        WITH cents AS (
          SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
                 (row_number() OVER (ORDER BY l_orderkey, l_linenumber,
                    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) - 1)
                   // 128 AS blk
          FROM lineitem),
        blocks AS (
          SELECT count(*) AS n,
                 CASE WHEN max(cents) = min(cents) THEN 0
                      ELSE CAST(length(bin(max(cents) - min(cents)))
                        AS BIGINT) END AS bits
          FROM cents GROUP BY blk),
        sized AS (
          SELECT n, bits, 16 + (n * bits + 7) // 8 AS packed_bytes,
                 n * 8 AS raw_bytes
          FROM blocks)
        SELECT bits, count(*) AS n_blocks,
               CAST(sum(packed_bytes) AS BIGINT) AS packed_bytes,
               CAST(sum(raw_bytes) AS BIGINT) AS raw_bytes,
               (CAST(sum(raw_bytes) AS BIGINT)
                 - CAST(sum(packed_bytes) AS BIGINT)) * 10000
                 // CAST(sum(raw_bytes) AS BIGINT) AS savings_bp
        FROM sized GROUP BY 1 ORDER BY bits""")),

    // --------------------------------------------------------------- q392
    QDef("q392_littles_law",
      (s, dir) => {
        val iv = t(s, dir, "events").where(col("value").isNotNull)
          .selectExpr("event_type", s"($tsMs) AS start_ms",
            "CAST(floor(value * 1000) AS BIGINT) AS dur_ms")
          .selectExpr("event_type", "start_ms", "dur_ms",
            "start_ms + dur_ms AS end_ms")
        val deltas = iv.selectExpr("event_type", "start_ms AS tm", "1 AS dv")
          .unionAll(iv.selectExpr("event_type", "end_ms AS tm", "-1 AS dv"))
          .groupBy("event_type", "tm")
          .agg(sum("dv").cast("bigint").as("d"))
        val w = Window.partitionBy("event_type").orderBy("tm")
        val area = deltas
          .withColumn("c", sum("d").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("nxt", lead("tm", 1).over(w))
          .where(col("nxt").isNotNull)
          .groupBy("event_type")
          .agg(sum(col("c") * (col("nxt") - col("tm")))
            .cast("bigint").as("area_ms"))
        val direct = iv.groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum("dur_ms").cast("bigint").as("sum_dur_ms"),
            (max("end_ms") - min("start_ms")).cast("bigint").as("t_ms"))
        direct.join(area, Seq("event_type"))
          .selectExpr("event_type", "n", "t_ms", "sum_dur_ms", "area_ms",
            "area_ms * 1000000 DIV t_ms AS l_sweep_micro",
            "sum_dur_ms * 1000000 DIV t_ms AS l_direct_micro",
            "CASE WHEN area_ms = sum_dur_ms THEN 1 ELSE 0 END" +
              " AS identity_ok")
          .orderBy("event_type")
      },
      Some("""
        WITH iv AS (
          SELECT event_type, epoch_ms(ts) AS start_ms,
                 CAST(floor(value * 1000) AS BIGINT) AS dur_ms,
                 epoch_ms(ts) + CAST(floor(value * 1000) AS BIGINT)
                   AS end_ms
          FROM events WHERE value IS NOT NULL),
        deltas AS (
          SELECT event_type, tm, CAST(sum(dv) AS BIGINT) AS d FROM (
            SELECT event_type, start_ms AS tm, 1 AS dv FROM iv
            UNION ALL SELECT event_type, end_ms, -1 FROM iv)
          GROUP BY 1, 2),
        sweep AS (
          SELECT event_type, tm,
                 sum(d) OVER (PARTITION BY event_type ORDER BY tm
                   ROWS UNBOUNDED PRECEDING) AS c,
                 lead(tm) OVER (PARTITION BY event_type ORDER BY tm) AS nxt
          FROM deltas),
        area AS (
          SELECT event_type, CAST(sum(c * (nxt - tm)) AS BIGINT) AS area_ms
          FROM sweep WHERE nxt IS NOT NULL GROUP BY 1),
        direct AS (
          SELECT event_type, count(*) AS n,
                 CAST(sum(dur_ms) AS BIGINT) AS sum_dur_ms,
                 CAST(max(end_ms) - min(start_ms) AS BIGINT) AS t_ms
          FROM iv GROUP BY 1)
        SELECT event_type, n, t_ms, sum_dur_ms, area_ms,
               area_ms * 1000000 // t_ms AS l_sweep_micro,
               sum_dur_ms * 1000000 // t_ms AS l_direct_micro,
               CASE WHEN area_ms = sum_dur_ms THEN 1 ELSE 0 END
                 AS identity_ok
        FROM direct JOIN area USING (event_type)
        ORDER BY event_type""")),

    // --------------------------------------------------------------- q393
    QDef("q393_directional_width",
      (s, dir) => {
        val pts = t(s, dir, "events")
          .selectExpr("event_type",
            "(user_id * 47 + event_id * 13) % 36000 AS x",
            "(user_id * 31 + event_id * 7) % 17000 AS y")
        pts.withColumn("k", explode(sequence(lit(0), lit(7))))
          .selectExpr("event_type", "k", s"($DxExpr) AS dx",
            s"($DyExpr) AS dy", "x", "y")
          .groupBy("event_type", "k", "dx", "dy")
          .agg(count(lit(1)).as("n_points"),
            (max(expr("dx * x + dy * y")) - min(expr("dx * x + dy * y")))
              .cast("bigint").as("width"))
          .selectExpr("event_type", "CAST(k AS BIGINT) AS k", "dx", "dy",
            "n_points", "width")
          .orderBy("event_type", "k")
      },
      Some(s"""
        WITH pts AS (
          SELECT event_type,
                 (user_id * 47 + event_id * 13) % 36000 AS x,
                 (user_id * 31 + event_id * 7) % 17000 AS y
          FROM events),
        proj AS (
          SELECT event_type, k, ($DxExpr) AS dx, ($DyExpr) AS dy, x, y
          FROM pts
          CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS k) g)
        SELECT event_type, CAST(k AS BIGINT) AS k, dx, dy,
               count(*) AS n_points,
               CAST(max(dx * x + dy * y) - min(dx * x + dy * y) AS BIGINT)
                 AS width
        FROM proj GROUP BY 1, 2, 3, 4
        ORDER BY event_type, k""")),

    // --------------------------------------------------------------- q394
    QDef("q394_pmi_collocations",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .withColumn("w", TextFunctions.words(col("text")))
        val toks = docs.select(explode(col("w")).as("tok"))
        val uni = toks.groupBy("tok").agg(count(lit(1)).as("c1"))
        val nTok = toks.agg(count(lit(1)).as("n_tok"))
        val big = docs.filter(size(col("w")) >= 2)
          .select(col("w"), explode(sequence(lit(0), size(col("w")) - 2))
            .as("i"))
          .select(expr("w[i]").as("w1"), expr("w[i+1]").as("w2"))
          .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
        val nBig = big.agg(sum("c2").cast("bigint").as("n_big"))
        big
          .join(uni.selectExpr("tok AS w1", "c1 AS cx"), Seq("w1"))
          .join(uni.selectExpr("tok AS w2", "c1 AS cy"), Seq("w2"))
          .crossJoin(broadcast(nTok)).crossJoin(broadcast(nBig))
          .selectExpr("w1", "w2", "c2", "cx", "cy",
            s"CAST(floor(($PmiExpr) * 1000000) AS BIGINT) AS pmi_micro")
          .orderBy(col("c2").desc, col("w1"), col("w2"))
          .limit(25)
      },
      Some(s"""
        WITH d AS (SELECT ${TextFunctions.wordsSql("text")} AS w
                   FROM documents),
        toks AS (SELECT unnest(w) AS tok FROM d),
        uni AS (SELECT tok, count(*) AS c1 FROM toks GROUP BY 1),
        ntok AS (SELECT count(*) AS n_tok FROM toks),
        big AS (
          SELECT w[i] AS w1, w[i + 1] AS w2, count(*) AS c2
          FROM d, unnest(range(1, len(w))) AS t(i)
          WHERE len(w) >= 2 GROUP BY 1, 2),
        nbig AS (SELECT CAST(sum(c2) AS BIGINT) AS n_big FROM big)
        SELECT w1, w2, c2, ux.c1 AS cx, uy.c1 AS cy,
               CAST(floor(($PmiExpr2) * 1000000) AS BIGINT) AS pmi_micro
        FROM big JOIN uni ux ON big.w1 = ux.tok
        JOIN uni uy ON big.w2 = uy.tok
        CROSS JOIN ntok CROSS JOIN nbig
        ORDER BY c2 DESC, w1, w2 LIMIT 25"""))
  )

  /** 8 integer support directions (k = 0..7), spelled once for both
    * engines: E, ENE, NE, NNE, N, NNW, NW, WNW. */
  private val DxExpr =
    "CASE k WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 1 WHEN 3 THEN 1" +
      " WHEN 4 THEN 0 WHEN 5 THEN -1 WHEN 6 THEN -1 ELSE -2 END"
  private val DyExpr =
    "CASE k WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 1 WHEN 3 THEN 2" +
      " WHEN 4 THEN 1 WHEN 5 THEN 2 WHEN 6 THEN 1 ELSE 1 END"

  /** PMI = ln(c2·N² / (Nb·c1(x)·c1(y))) in ONE IEEE op order. */
  private val PmiExpr =
    """ln(CAST(c2 AS DOUBLE) * CAST(n_tok AS DOUBLE)
       * CAST(n_tok AS DOUBLE)
       / (CAST(n_big AS DOUBLE) * CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE)))"""
  private val PmiExpr2 =
    """ln(CAST(c2 AS DOUBLE) * CAST(n_tok AS DOUBLE)
       * CAST(n_tok AS DOUBLE)
       / (CAST(n_big AS DOUBLE) * CAST(ux.c1 AS DOUBLE)
       * CAST(uy.c1 AS DOUBLE)))"""
}
