package graft.queries

import graft.Tables.t
import graft.functions.PortableHash
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 136 — content-defined chunking,
  * survival inference, leak-free encoding, Katz centrality:
  *
  *  - q558: content-defined chunking (rsync/Borg-style): 4-char
  *    polynomial rolling hash per position, boundaries where
  *    hash % 64 = 0, chunks hashed with the portable md5 — global
  *    chunk-level dedup savings vs whole-doc dedup savings in bp.
  *    All per-doc work is LIST ops (no per-position row explosion);
  *    only the ~len/64 chunks explode. The storage-economics op
  *    behind incremental corpus snapshots.
  *  - q559: log-rank test comparing fulfillment survival (order date →
  *    last ship, event = status F) between urgent (priority 1–2) and
  *    other orders: at-risk counts from suffix sums on the bounded
  *    duration domain, per-time hypergeometric terms floor-quantized
  *    micro then exactly summed, z floor-milli. The inferential
  *    companion to q152/q404's KM curves.
  *  - q560: ordered target statistics (CatBoost-style leak-free
  *    encoding): expanding-window return-rate encoding per brand
  *    (partitioned cumulative window, prior-smoothed a=10), audited
  *    against the full-data encoding — mean |gap| ppm and the
  *    class separation of the ordered encoding.
  *  - q561: Katz centrality by three quantized matvec rounds
  *    x' = 1000 + (Σ_{j∈N(i)} x_j) DIV 4 on the mod-64 co-purchase
  *    graph — join-based distributed matvec, exact integers; top 10.
  *    Completes the centrality family (q148 PageRank, q308 HITS).
  *
  * Scale shapes: q558/q560 are per-row list ops + hash aggregations /
  * partitioned windows; q559 aggregates to the bounded duration
  * domain; q561 is 3 rounds of edge–vector joins (matvec shape).
  */
object QueriesEM extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q558
    QDef("q558_cdc_chunking",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .where(col("text").isNotNull && length(col("text")) >= 4)
          .select(col("doc_id"), col("text"), length(col("text")).as("len"))
        // native one-pass chunker (graft.expressions.CdcChunks): O(len)
        // per doc vs the composed transform/substring form's O(len²) —
        // value-identical boundary rule (4-gram first-byte hash % 64 = 0,
        // final boundary at len); the oracle SQL below keeps the composed
        // form, so parity is still checked end-to-end.
        val ch = d
          .select(col("doc_id"), explode(org.apache.spark.sql.GraftColumnBridge
            .column(graft.expressions.CdcChunks(
              org.apache.spark.sql.GraftColumnBridge.expression(col("text"))))
            ).as("chunk"))
          .select(PortableHash.md5Long(col("chunk")).as("h"),
            length(col("chunk")).as("clen"))
        val chunkStats = ch.agg(
          count(lit(1)).as("n_chunks"),
          sum("clen").cast("long").as("total_bytes"))
        val distinctStats = ch.groupBy("h").agg(
            first("clen").as("clen1"))
          .agg(count(lit(1)).as("n_distinct_chunks"),
            sum("clen1").cast("long").as("distinct_bytes"))
        val docStats = d.select(PortableHash.md5Long(col("text")).as("th"),
            col("len"))
          .groupBy("th").agg(first("len").as("len1"))
          .agg(count(lit(1)).as("n_distinct_docs"),
            sum("len1").cast("long").as("doc_distinct_bytes"))
        chunkStats.crossJoin(broadcast(distinctStats))
          .crossJoin(broadcast(docStats))
          .where(expr("total_bytes > 0"))
          .selectExpr("n_chunks", "n_distinct_chunks", "total_bytes",
            "distinct_bytes",
            "(total_bytes - distinct_bytes) * 10000 DIV total_bytes AS cdc_savings_bp",
            "(total_bytes - doc_distinct_bytes) * 10000 DIV total_bytes AS doc_savings_bp")
      },
      Some(s"""
        WITH d AS (
          SELECT doc_id, text, length(text) AS len
          FROM documents WHERE text IS NOT NULL AND length(text) >= 4),
        b AS (
          SELECT doc_id, text, len,
                 list_concat(
                   list_filter(list_transform(range(4, len + 1), i ->
                     CASE WHEN (ascii(substring(text, CAST(i - 3 AS INT), 1)) * 29791
                         + ascii(substring(text, CAST(i - 2 AS INT), 1)) * 961
                         + ascii(substring(text, CAST(i - 1 AS INT), 1)) * 31
                         + ascii(substring(text, CAST(i AS INT), 1))) % 64 = 0
                       AND i < len THEN i ELSE NULL END), x -> x IS NOT NULL),
                   [CAST(len AS BIGINT)]) AS bpos
          FROM d),
        chunks AS (
          SELECT doc_id,
                 substring(text,
                   CAST(CASE WHEN j = 1 THEN 1 ELSE bpos[j - 1] + 1 END AS INT),
                   CAST(bpos[j] -
                     CASE WHEN j = 1 THEN 0 ELSE bpos[j - 1] END AS INT))
                   AS chunk
          FROM b, unnest(range(1, len(bpos) + 1)) AS t(j)),
        ch AS (
          SELECT ${PortableHash.md5LongSql("chunk")} AS h,
                 CAST(length(chunk) AS BIGINT) AS clen
          FROM chunks),
        cs AS (SELECT CAST(count(*) AS BIGINT) AS n_chunks,
                      CAST(sum(clen) AS BIGINT) AS total_bytes FROM ch),
        ds AS (
          SELECT CAST(count(*) AS BIGINT) AS n_distinct_chunks,
                 CAST(sum(clen1) AS BIGINT) AS distinct_bytes
          FROM (SELECT h, min(clen) AS clen1 FROM ch GROUP BY h)),
        docs AS (
          SELECT CAST(count(*) AS BIGINT) AS n_distinct_docs,
                 CAST(sum(len1) AS BIGINT) AS doc_distinct_bytes
          FROM (SELECT ${PortableHash.md5LongSql("text")} AS th,
                       CAST(min(len) AS BIGINT) AS len1
                FROM d GROUP BY 1))
        SELECT n_chunks, n_distinct_chunks, total_bytes, distinct_bytes,
               (total_bytes - distinct_bytes) * 10000 // total_bytes
                 AS cdc_savings_bp,
               (total_bytes - doc_distinct_bytes) * 10000 // total_bytes
                 AS doc_savings_bp
        FROM cs, ds, docs WHERE total_bytes > 0""")),

    // --------------------------------------------------------------- q559
    QDef("q559_logrank",
      (s, dir) => {
        val base = t(s, dir, "orders")
          .join(t(s, dir, "lineitem"), expr("o_orderkey = l_orderkey"))
          .groupBy("o_orderkey", "o_orderpriority", "o_orderstatus",
            "o_orderdate")
          .agg(max(expr("unix_millis(CAST(l_shipdate AS TIMESTAMP))"))
            .as("last_ship"))
          .selectExpr(
            """(last_ship - unix_millis(CAST(o_orderdate AS TIMESTAMP)))
               DIV 86400000 AS tt""",
            "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev",
            """CASE WHEN CAST(substring(o_orderpriority, 1, 1) AS INT) <= 2
               THEN 1 ELSE 0 END AS g""")
          .where(expr("tt >= 0"))
        // bounded duration domain: per (time, group) death/at-risk counts
        val cells = base.groupBy("tt").agg(
          sum(when(col("g") === 1 && col("ev") === 1, 1L).otherwise(0L)).as("d1"),
          sum(when(col("g") === 0 && col("ev") === 1, 1L).otherwise(0L)).as("d0"),
          sum(when(col("g") === 1, 1L).otherwise(0L)).as("c1"),
          sum(when(col("g") === 0, 1L).otherwise(0L)).as("c0"))
        val w = Window.orderBy("tt")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = base.agg(
          sum(when(col("g") === 1, 1L).otherwise(0L)).as("n1tot"),
          sum(when(col("g") === 0, 1L).otherwise(0L)).as("n0tot"))
        val risk = cells.crossJoin(broadcast(tot))
          .withColumn("cum1", sum("c1").over(w).cast("long"))
          .withColumn("cum0", sum("c0").over(w).cast("long"))
          .selectExpr("tt", "d1", "d0",
            "n1tot - cum1 + c1 AS r1", "n0tot - cum0 + c0 AS r0")
          .where(expr("d1 + d0 > 0 AND r1 + r0 > 1"))
          .selectExpr("d1", "d0", "r1", "r0",
            """CAST(floor((d1 - CAST(d1 + d0 AS DOUBLE) * r1 / (r1 + r0))
                 * 1000000) AS BIGINT) AS oe_micro""",
            """CAST(floor(CAST(d1 + d0 AS DOUBLE) * r1 / (r1 + r0)
                 * r0 / (r1 + r0) * (r1 + r0 - d1 - d0) / (r1 + r0 - 1)
                 * 1000000) AS BIGINT) AS v_micro""")
        risk.agg(
            sum("d1").cast("long").as("obs1"),
            sum("d0").cast("long").as("obs0"),
            sum("oe_micro").cast("long").as("oe_sum_micro"),
            sum("v_micro").cast("long").as("v_sum_micro"))
          .where(expr("v_sum_micro > 0"))
          .selectExpr("obs1", "obs0", "oe_sum_micro",
            """CAST(floor(CAST(oe_sum_micro AS DOUBLE) / 1e6
                 / sqrt(CAST(v_sum_micro AS DOUBLE) / 1e6) * 1000) AS BIGINT)
               AS z_milli""")
      },
      Some("""
        WITH base AS (
          SELECT (max(epoch_ms(l.l_shipdate)) - epoch_ms(o.o_orderdate))
                   // 86400000 AS tt,
                 CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev,
                 CASE WHEN CAST(substring(o.o_orderpriority, 1, 1) AS INT) <= 2
                   THEN 1 ELSE 0 END AS g
          FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
          GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderstatus,
                   o.o_orderdate
          HAVING (max(epoch_ms(l.l_shipdate)) - epoch_ms(o.o_orderdate))
                   // 86400000 >= 0),
        cells AS (
          SELECT tt,
                 CAST(sum(CASE WHEN g = 1 AND ev = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS d1,
                 CAST(sum(CASE WHEN g = 0 AND ev = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS d0,
                 CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                 CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0
          FROM base GROUP BY 1),
        tot AS (
          SELECT CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1tot,
                 CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n0tot
          FROM base),
        risk AS (
          SELECT d1, d0,
                 n1tot - CAST(sum(c1) OVER (ORDER BY tt
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) + c1 AS r1,
                 n0tot - CAST(sum(c0) OVER (ORDER BY tt
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) + c0 AS r0
          FROM cells, tot),
        terms AS (
          SELECT d1, d0, r1, r0,
                 CAST(floor((d1 - CAST(d1 + d0 AS DOUBLE) * r1 / (r1 + r0))
                   * 1000000) AS BIGINT) AS oe_micro,
                 CAST(floor(CAST(d1 + d0 AS DOUBLE) * r1 / (r1 + r0)
                   * r0 / (r1 + r0) * (r1 + r0 - d1 - d0) / (r1 + r0 - 1)
                   * 1000000) AS BIGINT) AS v_micro
          FROM risk WHERE d1 + d0 > 0 AND r1 + r0 > 1),
        c AS (
          SELECT CAST(sum(d1) AS BIGINT) AS obs1,
                 CAST(sum(d0) AS BIGINT) AS obs0,
                 CAST(sum(oe_micro) AS BIGINT) AS oe_sum_micro,
                 CAST(sum(v_micro) AS BIGINT) AS v_sum_micro
          FROM terms)
        SELECT obs1, obs0, oe_sum_micro,
               CAST(floor(CAST(oe_sum_micro AS DOUBLE) / 1e6
                 / sqrt(CAST(v_sum_micro AS DOUBLE) / 1e6) * 1000) AS BIGINT)
                 AS z_milli
        FROM c WHERE v_sum_micro > 0""")),

    // --------------------------------------------------------------- q560
    QDef("q560_ordered_target_stats",
      (s, dir) => {
        val rows = t(s, dir, "lineitem")
          .join(broadcast(t(s, dir, "part")
            .select(col("p_partkey"), col("p_brand"))),
            expr("l_partkey = p_partkey"))
          .selectExpr("p_brand AS brand",
            "unix_millis(CAST(l_shipdate AS TIMESTAMP)) DIV 86400000 AS day",
            "CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END AS y")
        val prior = rows.agg(
          (sum("y") * 1000000L / count(lit(1))).cast("long").as("prior_ppm"))
        // DAY-granularity ordered statistics: the prefix window runs on
        // the bounded (brand, day) aggregate, never on raw rows — the
        // encoding for day d uses strictly-prior days (leak-free AND
        // scale-safe; a per-brand raw-row window would serialize 1/25
        // of the fact table into one task at 100×)
        val daily = rows.groupBy("brand", "day").agg(
          count(lit(1)).as("dn"), sum("y").cast("long").as("dx"))
        // r12 DUAL PATH: every output is a sum over (brand, day) groups —
        // rows in one group share enc_ppm, so s_pos = Σ dx·enc, n_pos =
        // Σ dx, s_neg = Σ (dn−dx)·enc, s_gap = Σ dn·|enc−full| — and the
        // prior/full encodings are sums of the same census. Under the
        // gate ONE census job replaces 4 separate passes over the
        // lineitem⋈part join (prior, window side, enc join side, fullEnc).
        // limit(gate+1) bounds driver memory without a count job.
        val gate = 2000000
        val censusRows = daily.limit(gate + 1).collect()
        if (censusRows.length <= gate) {
          val sc2 = s
          import sc2.implicits._
          val d = censusRows.map(r => (r.getString(0), r.getLong(1),
            r.getLong(2), r.getLong(3))) // brand, day, dn, dx
          val nTotal = d.iterator.map(_._3).sum
          val xTotal = d.iterator.map(_._4).sum
          if (nTotal == 0) {
            Seq.empty[(Long, Long, Long, Long, Long)]
              .toDF("n_rows", "mean_enc_pos_ppm", "mean_enc_neg_ppm",
                "separation_ppm", "mean_abs_gap_ppm")
          } else {
            // frames compute prior as Divide(BIGINT, BIGINT) → DOUBLE →
            // cast long; replicate that exact IEEE path
            val prior = ((xTotal * 1000000L).toDouble / nTotal.toDouble).toLong
            val byBrand = d.groupBy(_._1)
            var (sPos, nPos, sNeg, nNeg, sGap) = (0L, 0L, 0L, 0L, 0L)
            byBrand.foreach { case (_, g) =>
              val gs = g.sortBy(_._2)
              val bn = gs.iterator.map(_._3).sum
              val bx = gs.iterator.map(_._4).sum
              val full = (bx * 1000000L + 10 * prior) / (bn + 10)
              var cumx = 0L; var cumn = 0L
              gs.foreach { case (_, _, dn, dx) =>
                val enc = (cumx * 1000000L + 10 * prior) / (cumn + 10)
                cumx += dx; cumn += dn
                sPos += dx * enc; nPos += dx
                sNeg += (dn - dx) * enc; nNeg += dn - dx
                sGap += dn * (enc - full).abs
              }
            }
            if (nPos > 0 && nNeg > 0)
              Seq((nTotal, sPos / nPos, sNeg / nNeg,
                sPos / nPos - sNeg / nNeg, sGap / nTotal))
                .toDF("n_rows", "mean_enc_pos_ppm", "mean_enc_neg_ppm",
                  "separation_ppm", "mean_abs_gap_ppm")
            else
              Seq.empty[(Long, Long, Long, Long, Long)]
                .toDF("n_rows", "mean_enc_pos_ppm", "mean_enc_neg_ppm",
                  "separation_ppm", "mean_abs_gap_ppm")
          }
        } else {
        val wb = Window.partitionBy("brand").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, -1)
        val dayEnc = daily.crossJoin(broadcast(prior))
          .withColumn("cumx", coalesce(sum("dx").over(wb), lit(0L)).cast("long"))
          .withColumn("cumn", coalesce(sum("dn").over(wb), lit(0L)).cast("long"))
          .withColumn("enc_ppm",
            expr("(cumx * 1000000 + 10 * prior_ppm) DIV (cumn + 10)"))
          .select("brand", "day", "enc_ppm")
        val enc = rows.join(dayEnc, Seq("brand", "day"))
        val fullEnc = rows.crossJoin(broadcast(prior))
          .groupBy("brand", "prior_ppm").agg(
            count(lit(1)).as("n"), sum("y").cast("long").as("x"))
          .selectExpr("brand",
            "(x * 1000000 + 10 * prior_ppm) DIV (n + 10) AS full_ppm")
        enc.join(broadcast(fullEnc), "brand")
          .agg(
            count(lit(1)).as("n_rows"),
            sum(when(col("y") === 1, col("enc_ppm")).otherwise(0L))
              .cast("long").as("s_pos"),
            sum(when(col("y") === 1, 1L).otherwise(0L)).as("n_pos"),
            sum(when(col("y") === 0, col("enc_ppm")).otherwise(0L))
              .cast("long").as("s_neg"),
            sum(when(col("y") === 0, 1L).otherwise(0L)).as("n_neg"),
            sum(abs(col("enc_ppm") - col("full_ppm"))).cast("long").as("s_gap"))
          .where(expr("n_pos > 0 AND n_neg > 0"))
          .selectExpr("n_rows",
            "s_pos DIV n_pos AS mean_enc_pos_ppm",
            "s_neg DIV n_neg AS mean_enc_neg_ppm",
            "s_pos DIV n_pos - s_neg DIV n_neg AS separation_ppm",
            "s_gap DIV n_rows AS mean_abs_gap_ppm")
        }
      },
      Some("""
        WITH rows_ AS (
          SELECT p.p_brand AS brand,
                 epoch_ms(l.l_shipdate) // 86400000 AS day,
                 CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS y
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        prior AS (
          SELECT CAST(sum(y) * 1000000 // count(*) AS BIGINT) AS prior_ppm
          FROM rows_),
        daily AS (
          SELECT brand, day, CAST(count(*) AS BIGINT) AS dn,
                 CAST(sum(y) AS BIGINT) AS dx
          FROM rows_ GROUP BY 1, 2),
        dayenc AS (
          SELECT brand, day,
                 (coalesce(CAST(sum(dx) OVER (PARTITION BY brand
                    ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING) AS BIGINT), 0) * 1000000
                  + 10 * prior_ppm)
                 // (coalesce(CAST(sum(dn) OVER (PARTITION BY brand
                    ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING) AS BIGINT), 0) + 10) AS enc_ppm
          FROM daily, prior),
        enc AS (
          SELECT r.y, r.brand, d.enc_ppm
          FROM rows_ r JOIN dayenc d ON r.brand = d.brand AND r.day = d.day),
        fullenc AS (
          SELECT brand,
                 (CAST(sum(y) AS BIGINT) * 1000000 + 10 * max(prior_ppm))
                   // (CAST(count(*) AS BIGINT) + 10) AS full_ppm
          FROM rows_, prior GROUP BY brand),
        c AS (
          SELECT CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(sum(CASE WHEN e.y = 1 THEN e.enc_ppm ELSE 0 END)
                   AS BIGINT) AS s_pos,
                 CAST(sum(CASE WHEN e.y = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_pos,
                 CAST(sum(CASE WHEN e.y = 0 THEN e.enc_ppm ELSE 0 END)
                   AS BIGINT) AS s_neg,
                 CAST(sum(CASE WHEN e.y = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_neg,
                 CAST(sum(abs(e.enc_ppm - f.full_ppm)) AS BIGINT) AS s_gap
          FROM enc e JOIN fullenc f ON e.brand = f.brand)
        SELECT n_rows,
               s_pos // n_pos AS mean_enc_pos_ppm,
               s_neg // n_neg AS mean_enc_neg_ppm,
               s_pos // n_pos - s_neg // n_neg AS separation_ppm,
               s_gap // n_rows AS mean_abs_gap_ppm
        FROM c WHERE n_pos > 0 AND n_neg > 0""")),

    // --------------------------------------------------------------- q561
    QDef("q561_katz_centrality",
      (s, dir) => {
        val lp = t(s, dir, "lineitem")
          .selectExpr("l_orderkey AS ok", "l_partkey % 64 AS pk")
        // one map-side-combinable shuffle instead of distinct + ok-keyed
        // self-join (the q464 pattern): collect_set(pk) per order dedups
        // AND generates the co-occurrence pairs locally (≤ C(items,2) per
        // order); co-occurrence counts are symmetric so only a < b pairs
        // travel, mirrored after the collect.
        val half = lp.groupBy("ok")
          .agg(sort_array(collect_set(col("pk"))).as("pks"))
          .select(col("pks"), posexplode(col("pks")).as(Seq("i", "a")))
          .select(col("a"), explode(slice(col("pks"), col("i") + lit(2),
            size(col("pks")))).as("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("w"))
          .where(col("w") >= 2).select("a", "b")
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        // the node domain is pk % 64 — the edge census is ≤ 64·63 rows BY
        // CONSTRUCTION, so the three power iterations run driver-side in
        // exact Long arithmetic over one collected census (the q597/q625
        // pattern) instead of 3 × (join + agg + left-join) ≈ 9 shuffles
        // of a ≤4032-row frame (r8: 3.0 s of pure job floors).
        val edges = half ++ half.map(_.swap)
        val nodes = edges.map(_._1).distinct.sorted
        var x: Map[Long, Long] = nodes.map(_ -> 1000L).toMap
        for (_ <- 1 to 3) {
          val sx = edges.groupMapReduce(_._1)(t => x(t._2))(_ + _)
          x = nodes.map(id => id -> (1000L + sx.getOrElse(id, 0L) / 4)).toMap
        }
        val sc2 = s
        import sc2.implicits._
        nodes.map(id => (id, x(id))).sortBy { case (id, v) => (-v, id) }
          .take(10).toSeq.toDF("id", "katz_milli")
      },
      Some("""
        WITH lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey % 64 AS pk
                    FROM lineitem),
        e AS (
          SELECT a.pk AS a, b.pk AS b
          FROM lp a JOIN lp b ON a.ok = b.ok AND a.pk <> b.pk
          GROUP BY 1, 2 HAVING count(*) >= 2),
        nodes AS (SELECT DISTINCT a AS id FROM e),
        x0 AS (SELECT id, CAST(1000 AS BIGINT) AS x FROM nodes),
        x1 AS (
          SELECT n.id, 1000 + coalesce(s.sx, 0) // 4 AS x
          FROM nodes n LEFT JOIN (
            SELECT e.a, CAST(sum(x0.x) AS BIGINT) AS sx
            FROM e JOIN x0 ON e.b = x0.id GROUP BY e.a) s ON n.id = s.a),
        x2 AS (
          SELECT n.id, 1000 + coalesce(s.sx, 0) // 4 AS x
          FROM nodes n LEFT JOIN (
            SELECT e.a, CAST(sum(x1.x) AS BIGINT) AS sx
            FROM e JOIN x1 ON e.b = x1.id GROUP BY e.a) s ON n.id = s.a),
        x3 AS (
          SELECT n.id, 1000 + coalesce(s.sx, 0) // 4 AS x
          FROM nodes n LEFT JOIN (
            SELECT e.a, CAST(sum(x2.x) AS BIGINT) AS sx
            FROM e JOIN x2 ON e.b = x2.id GROUP BY e.a) s ON n.id = s.a)
        SELECT id, CAST(x AS BIGINT) AS katz_milli
        FROM x3 ORDER BY x DESC, id LIMIT 10"""))
  )
}
