package graft.queries

import graft.Tables.t
import graft.functions.{PortableHash, PortableHll}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 24 — sketch-driven planning ops:
  *
  *  - q138: join-cardinality estimation via Count-Min inner product
  *    (est = min over rows of Σ_b cmsR[b]·cmsS[b]) vs the exact join
  *    size — the classic sketch-based join planner input; CMS rows are
  *    the same portable-deterministic construction as q96.
  *  - q139: day-of-week seasonal index — per-dow mean vs overall mean,
  *    exact BIGINT sums, one fixed IEEE division order, floor-micro.
  *  - q140: market-basket co-occurrence — part pairs in the same order
  *    (pair fan-out bounded by basket size, never O(n²) on the table),
  *    support + lift. The "customers also bought" mining shape.
  *  - q141: zone-map pruning planner — per-bin min/max over the q136
  *    file layout, then which bins a BETWEEN predicate scans/skips and
  *    how many scanned bins are false positives. Parquet row-group
  *    pruning economics, computed exactly.
  *  - q142: HLL set operations — union via sketch property (HLL of the
  *    concatenated stream == merged sketch), intersection via
  *    inclusion–exclusion, vs exact counts. The 100 TB audience-overlap
  *    estimator (PortableHll: bit-identical in both engines).
  */
object QueriesAE extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    QDef("q138_cms_join_estimate",
      (s, dir) => {
        val ok = t(s, dir, "orders").select(col("o_custkey").cast("string").as("k")).cache()
        val ek = t(s, dir, "events").select(col("user_id").cast("string").as("k")).cache()
        ok.count(); ek.count()
        def cells(df: org.apache.spark.sql.DataFrame, cName: String) =
          (0 until 3).map { r =>
            df.groupBy(pmod(PortableHash.md5Long(col("k"), salt = s"cmsj$r~"), lit(64L))
                .as("bucket"))
              .agg(count(lit(1)).as(cName)).withColumn("row", lit(r))
          }.reduce(_ unionByName _)
        val ip = cells(ok, "c_o").join(cells(ek, "c_e"), Seq("row", "bucket"))
          .groupBy("row").agg(sum(expr("c_o * c_e")).as("ip"))
        val est = ip.agg(min("ip").cast("bigint").as("cms_est"))
        val exact = ok.groupBy("k").agg(count(lit(1)).as("no"))
          .join(ek.groupBy("k").agg(count(lit(1)).as("ne")), "k")
          .agg(sum(expr("no * ne")).cast("bigint").as("exact_size"))
        exact.crossJoin(est)
          .selectExpr("exact_size", "cms_est",
            "cms_est * 10000 DIV exact_size AS over_bp")
      },
      Some {
        def bSql(r: Int) =
          s"${PortableHash.md5LongSql("k", salt = s"cmsj$r~")} % 64"
        def cellsSql(src: String, cName: String) = (0 until 3).map(r =>
          s"SELECT $r AS row, ${bSql(r)} AS bucket, count(*) AS $cName FROM $src GROUP BY 1, 2")
          .mkString(" UNION ALL ")
        s"""
        WITH ok AS (SELECT CAST(o_custkey AS VARCHAR) AS k FROM orders),
        ek AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
        co AS (${cellsSql("ok", "c_o")}),
        ce AS (${cellsSql("ek", "c_e")}),
        ip AS (
          SELECT co.row, CAST(sum(co.c_o * ce.c_e) AS BIGINT) AS ip
          FROM co JOIN ce ON co.row = ce.row AND co.bucket = ce.bucket
          GROUP BY 1),
        est AS (SELECT CAST(min(ip) AS BIGINT) AS cms_est FROM ip),
        ex AS (
          SELECT CAST(sum(a.no * b.ne) AS BIGINT) AS exact_size
          FROM (SELECT k, count(*) AS no FROM ok GROUP BY 1) a
          JOIN (SELECT k, count(*) AS ne FROM ek GROUP BY 1) b ON a.k = b.k)
        SELECT exact_size, cms_est, cms_est * 10000 // exact_size AS over_bp
        FROM ex, est"""
      }),

    QDef("q139_seasonal_index",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .selectExpr(s"((($tsMs) DIV 86400000) + 4) % 7 AS dow",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc")
        val tot = ev.agg(sum("vc").as("tot_sum"), count(lit(1)).as("tot_n"))
        ev.groupBy("dow")
          .agg(count(lit(1)).as("n"), sum("vc").cast("bigint").as("sum_cents"))
          .crossJoin(broadcast(tot))
          .selectExpr("dow", "n", "sum_cents",
            """CAST(floor(
                 (CAST(sum_cents AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(tot_sum AS DOUBLE) / CAST(tot_n AS DOUBLE))
                 * 1000000) AS BIGINT) AS index_micro""")
          .orderBy("dow")
      },
      Some("""
        WITH ev AS (
          SELECT ((epoch_ms(ts) // 86400000) + 4) % 7 AS dow,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
          FROM events),
        tot AS (SELECT CAST(sum(vc) AS BIGINT) AS tot_sum, count(*) AS tot_n FROM ev)
        SELECT dow, count(*) AS n, CAST(sum(vc) AS BIGINT) AS sum_cents,
               CAST(floor(
                 (CAST(sum(vc) AS DOUBLE) / CAST(count(*) AS DOUBLE))
                 / (CAST(tot.tot_sum AS DOUBLE) / CAST(tot.tot_n AS DOUBLE))
                 * 1000000) AS BIGINT) AS index_micro
        FROM ev, tot GROUP BY dow, tot.tot_sum, tot.tot_n ORDER BY dow""")),

    QDef("q140_cooccurrence",
      (s, dir) => {
        // Three jobs total (the r9 distinct→self-join + two broadcast
        // builds ran 5-6 at ~0.3s floor each — 2.1-3.2s window-dependent,
        // a rotating gate flag): (1) one shuffle builds the per-order
        // basket (collect_set dedups in the agg — no separate distinct)
        // and its eager count IS the n_orders scalar; (2) the ≤7-part
        // basket yields its ≤21 ordered pairs MAP-SIDE from the sorted
        // array, TakeOrdered15 to the driver; (3) support counts for the
        // ≤30 parts those pairs name — a bounded census. Lift assembles
        // driver-side in the oracle's exact double-op order.
        val sc3 = s
        import sc3.implicits._
        val baskets = t(s, dir, "lineitem")
          .groupBy(col("l_orderkey").as("ok"))
          .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
          .cache()
        val nOrders = baskets.count() // eager cache AND the n_orders scalar
        val top = baskets.select(explode(expr(
            """flatten(transform(ps, (x, i) ->
               transform(slice(ps, i + 2, size(ps)), y -> struct(x AS p1, y AS p2))))"""))
            .as("pr"))
          .select(col("pr.p1"), col("pr.p2"))
          .groupBy("p1", "p2").agg(count(lit(1)).as("support"))
          .orderBy(col("support").desc, col("p1"), col("p2")).limit(15)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        val parts = top.flatMap(p => Seq(p._1, p._2)).distinct.toSeq
        val sup = baskets.select(explode(col("ps")).as("p"))
          .where(col("p").isin(parts: _*))
          .groupBy("p").agg(count(lit(1)).as("sup"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        top.toSeq.map { case (p1, p2, support) =>
          val (sa, sb) = (sup(p1), sup(p2))
          val lift = math.floor(support.toDouble * nOrders.toDouble
            / sa.toDouble / sb.toDouble * 1000000).toLong
          (p1, p2, support, sa, sb, lift)
        }.toDF("p1", "p2", "support", "sup_a", "sup_b", "lift_micro")
      },
      Some("""
        WITH lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey FROM lineitem),
        no AS (SELECT count(DISTINCT ok) AS n_orders FROM lp),
        supp AS (SELECT l_partkey, count(*) AS sup FROM lp GROUP BY 1),
        pairs AS (
          SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS support
          FROM lp a JOIN lp b ON a.ok = b.ok AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2),
        top AS (SELECT * FROM pairs ORDER BY support DESC, p1, p2 LIMIT 15)
        SELECT t.p1, t.p2, CAST(t.support AS BIGINT) AS support,
               CAST(sa.sup AS BIGINT) AS sup_a, CAST(sb.sup AS BIGINT) AS sup_b,
               CAST(floor(CAST(t.support AS DOUBLE) * CAST(no.n_orders AS DOUBLE)
                 / CAST(sa.sup AS DOUBLE) / CAST(sb.sup AS DOUBLE)
                 * 1000000) AS BIGINT) AS lift_micro
        FROM top t
        JOIN supp sa ON t.p1 = sa.l_partkey
        JOIN supp sb ON t.p2 = sb.l_partkey, no
        ORDER BY support DESC, p1, p2""")),

    QDef("q141_zonemap_prune",
      (s, dir) => {
        val target = 2048L
        val w = Window.partitionBy("source").orderBy("doc_id")
        val zones = t(s, dir, "documents")
          .select(col("source"), col("doc_id"), col("n_chars"))
          .withColumn("before", coalesce(sum("n_chars")
            .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .withColumn("bin", expr(s"before DIV $target"))
          .groupBy("source", "bin")
          .agg(min("n_chars").as("mn"), max("n_chars").as("mx"),
            count(lit(1)).as("n"),
            sum(expr("CASE WHEN n_chars BETWEEN 200 AND 400 THEN 1 ELSE 0 END"))
              .as("matched"))
        zones.groupBy("source")
          .agg(count(lit(1)).as("n_bins"),
            sum("n").cast("bigint").as("n_files"),
            sum(expr("CASE WHEN mn <= 400 AND mx >= 200 THEN 1 ELSE 0 END"))
              .cast("bigint").as("n_scanned"),
            sum(expr("CASE WHEN mn <= 400 AND mx >= 200 AND matched = 0 THEN 1 ELSE 0 END"))
              .cast("bigint").as("fp_bins"),
            sum("matched").cast("bigint").as("rows_matched"))
          .withColumn("n_skipped", col("n_bins") - col("n_scanned"))
          .withColumn("sel_bp", expr("rows_matched * 10000 DIV n_files"))
          .orderBy("source")
      },
      Some("""
        WITH b AS (
          SELECT source, doc_id, n_chars,
                 CAST(coalesce(sum(n_chars) OVER (PARTITION BY source
                   ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) // 2048 AS bin
          FROM documents),
        z AS (
          SELECT source, bin, min(n_chars) AS mn, max(n_chars) AS mx,
                 count(*) AS n,
                 CAST(sum(CASE WHEN n_chars BETWEEN 200 AND 400 THEN 1 ELSE 0 END)
                   AS BIGINT) AS matched
          FROM b GROUP BY 1, 2)
        SELECT source, count(*) AS n_bins,
               CAST(sum(n) AS BIGINT) AS n_files,
               CAST(sum(CASE WHEN mn <= 400 AND mx >= 200 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_scanned,
               CAST(sum(CASE WHEN mn <= 400 AND mx >= 200 AND matched = 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS fp_bins,
               CAST(sum(matched) AS BIGINT) AS rows_matched,
               count(*) - CAST(sum(CASE WHEN mn <= 400 AND mx >= 200 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_skipped,
               CAST(sum(matched) AS BIGINT) * 10000 // CAST(sum(n) AS BIGINT) AS sel_bp
        FROM z GROUP BY 1 ORDER BY 1""")),

    QDef("q142_hll_setops",
      (s, dir) => {
        val ev = t(s, dir, "events")
        def users(ty: String) = ev.where(col("event_type") === ty)
          .select(lit(1).as("g"), col("user_id").cast("string").as("u"))
        val both = users("click").unionByName(users("purchase"))
        def est(df: org.apache.spark.sql.DataFrame, out: String) =
          PortableHll.approxDistinct(df, col("u"), Seq("g"), out).drop("g")
        val exact = ev.agg(
          countDistinct(when(col("event_type") === "click", col("user_id")))
            .as("exact_click"),
          countDistinct(when(col("event_type") === "purchase", col("user_id")))
            .as("exact_purchase"))
        val exactI = ev.where(col("event_type") === "click")
          .select("user_id").distinct()
          .join(ev.where(col("event_type") === "purchase")
            .select("user_id").distinct(), "user_id")
          .agg(count(lit(1)).as("exact_both"))
        est(users("click"), "est_click")
          .crossJoin(est(users("purchase"), "est_purchase"))
          .crossJoin(est(both, "est_union"))
          .crossJoin(broadcast(exact))
          .crossJoin(broadcast(exactI))
          .selectExpr("est_click", "est_purchase", "est_union",
            "est_click + est_purchase - est_union AS est_both",
            "exact_click", "exact_purchase", "exact_both")
      },
      Some {
        def estSql(where: String, out: String) = PortableHll.approxDistinctSql(
          s"(SELECT 1 AS g, user_id FROM events WHERE $where) t_",
          "user_id", "g", "g", out)
        s"""
        WITH ec AS ${estSql("event_type = 'click'", "est_click")},
        ep AS ${estSql("event_type = 'purchase'", "est_purchase")},
        eu AS ${estSql("event_type IN ('click','purchase')", "est_union")},
        ex AS (
          SELECT CAST(count(DISTINCT CASE WHEN event_type = 'click' THEN user_id END)
                   AS BIGINT) AS exact_click,
                 CAST(count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END)
                   AS BIGINT) AS exact_purchase
          FROM events),
        ei AS (
          SELECT CAST(count(*) AS BIGINT) AS exact_both FROM
            (SELECT DISTINCT user_id FROM events WHERE event_type = 'click') a
            JOIN (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase') b
            ON a.user_id = b.user_id)
        SELECT est_click, est_purchase, est_union,
               est_click + est_purchase - est_union AS est_both,
               exact_click, exact_purchase, exact_both
        FROM ec, ep, eu, ex, ei"""
      })
  )
}
