package graft.queries

import graft.Tables.t
import graft.functions.PortableHash
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 coverage additions, part 143 — cluster-placement, seasonal
  * decomposition, approximate-query-processing, and planner-statistics
  * operators:
  *
  *  - q590: rendezvous (HRW) hashing placement audit: every customer
  *    key scored against 8 nodes with the portable md5 (argmax = its
  *    node), then against 9 — the moved fraction must be ≈ 1/9 (the
  *    minimal-disruption property that motivates HRW over mod-N,
  *    whose reshuffle is ≈ 8/9). Exact integer censuses.
  *  - q591: day-of-week seasonal decomposition: centered 7-day moving
  *    average on the bounded day series (full windows only), exact
  *    milli detrending, per-dow seasonal means and residual size.
  *    The STL-lite sibling of q582's Holt trend.
  *  - q592: universe (key-level) join sampling, the correlated-
  *    sampling AQP technique: sample the JOIN KEY space at p = 1/16
  *    by portable hash, join only sampled keys, scale up by 16 —
  *    per-key sampling keeps the join unbiased where independent
  *    row-level sampling of two sides would quadratically under-
  *    sample; reports exact-vs-estimate error bp.
  *  - q593: equi-depth histogram (10 buckets) of order value from
  *    exact rank math on the bounded dollar census — the optimizer-
  *    statistics construction; per-bucket deviation from n/10 bp.
  *
  * Scale shapes: q590/q592 are hash joins/aggs with 8-9× constant
  * fan-out; q591/q593 window only bounded aggregated domains.
  */
object QueriesET extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q590
    QDef("q590_rendezvous_hashing",
      (s, dir) => {
        val keys = t(s, dir, "customer").select(col("c_custkey"))
        def assign(n: Int) = keys
          .select(col("c_custkey"), explode(array(
            (1 to n).map(i => lit(s"node$i")): _*)).as("node"))
          .withColumn("score", PortableHash.md5Long(
            concat(col("c_custkey").cast("string"), lit("|"), col("node")),
            "hrw"))
          .groupBy("c_custkey")
          .agg(max(struct(col("score"), col("node"))).as("m"))
          .selectExpr("c_custkey", "m.node AS node")
        val moved = assign(8).selectExpr("c_custkey", "node AS n8")
          .join(assign(9).selectExpr("c_custkey", "node AS n9"), "c_custkey")
          .agg(count(lit(1)).as("n_keys"),
            sum(when(col("n8") =!= col("n9"), 1L).otherwise(0L))
              .cast("long").as("moved"))
        val balance = assign(8).groupBy("node").agg(count(lit(1)).as("c"))
          .agg(max("c").cast("long").as("max_load8"),
            min("c").cast("long").as("min_load8"))
        moved.crossJoin(broadcast(balance))
          .selectExpr("n_keys", "moved",
            "moved * 10000 DIV n_keys AS moved_bp",
            "max_load8", "min_load8")
      },
      Some(s"""
        WITH keys AS (SELECT c_custkey FROM customer),
        n8 AS (SELECT unnest(['node1','node2','node3','node4','node5',
                 'node6','node7','node8']) AS node),
        n9 AS (SELECT node FROM n8 UNION ALL SELECT 'node9'),
        a8 AS (
          SELECT c_custkey, node FROM (
            SELECT k.c_custkey, n.node,
                   row_number() OVER (PARTITION BY k.c_custkey ORDER BY
                     ${PortableHash.md5LongSql(
                       "CAST(k.c_custkey AS VARCHAR) || '|' || n.node",
                       "hrw")} DESC, n.node DESC) AS rn
            FROM keys k CROSS JOIN n8 n) WHERE rn = 1),
        a9 AS (
          SELECT c_custkey, node FROM (
            SELECT k.c_custkey, n.node,
                   row_number() OVER (PARTITION BY k.c_custkey ORDER BY
                     ${PortableHash.md5LongSql(
                       "CAST(k.c_custkey AS VARCHAR) || '|' || n.node",
                       "hrw")} DESC, n.node DESC) AS rn
            FROM keys k CROSS JOIN n9 n) WHERE rn = 1),
        mv AS (
          SELECT CAST(count(*) AS BIGINT) AS n_keys,
                 CAST(sum(CASE WHEN a8.node <> a9.node THEN 1 ELSE 0 END)
                   AS BIGINT) AS moved
          FROM a8 JOIN a9 USING (c_custkey)),
        bal AS (
          SELECT CAST(max(c) AS BIGINT) AS max_load8,
                 CAST(min(c) AS BIGINT) AS min_load8
          FROM (SELECT count(*) AS c FROM a8 GROUP BY node))
        SELECT n_keys, moved, moved * 10000 // n_keys AS moved_bp,
               max_load8, min_load8
        FROM mv, bal""")),

    // --------------------------------------------------------------- q591
    QDef("q591_seasonal_dow",
      (s, dir) => {
        val daily = t(s, dir, "orders")
          .selectExpr(
            "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS day")
          .groupBy("day").agg(count(lit(1)).as("y"))
        val w7 = Window.orderBy("day").rowsBetween(-3, 3)
        val detr = daily
          .withColumn("s7", sum("y").over(w7).cast("long"))
          .withColumn("n7", count(lit(1)).over(w7))
          .where(col("n7") === 7)
          .selectExpr("day % 7 AS dow",
            "y * 1000 - s7 * 1000 DIV 7 AS detr_milli")
        // floor(double quotient) on BOTH sides: Spark's long-cast
        // truncates while DuckDB's rounds, and detr sums are signed —
        // floor() is unambiguous in both engines
        val seas = detr.groupBy("dow").agg(
          count(lit(1)).as("n_days"),
          expr("""CAST(floor(CAST(sum(detr_milli) AS DOUBLE) / count(1))
            AS BIGINT)""").as("seasonal_milli"))
        detr.join(broadcast(seas), "dow")
          .selectExpr("dow", "n_days", "seasonal_milli",
            "abs(detr_milli - seasonal_milli) AS ar")
          .groupBy("dow", "n_days", "seasonal_milli")
          .agg(expr("CAST(floor(CAST(sum(ar) AS DOUBLE) / count(1)) AS BIGINT)")
            .as("mean_abs_resid_milli"))
          .orderBy("dow")
      },
      Some("""
        WITH daily AS (
          SELECT epoch_ms(o_orderdate) // 86400000 AS day,
                 CAST(count(*) AS BIGINT) AS y
          FROM orders GROUP BY 1),
        detr AS (
          SELECT day % 7 AS dow, y * 1000 - s7 * 1000 // 7 AS detr_milli
          FROM (
            SELECT day, y,
                   CAST(sum(y) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING
                     AND 3 FOLLOWING) AS BIGINT) AS s7,
                   count(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING
                     AND 3 FOLLOWING) AS n7
            FROM daily)
          WHERE n7 = 7),
        seas AS (
          SELECT dow, CAST(count(*) AS BIGINT) AS n_days,
                 CAST(floor(CAST(sum(detr_milli) AS DOUBLE) / count(*))
                   AS BIGINT) AS seasonal_milli
          FROM detr GROUP BY 1)
        SELECT d.dow, s.n_days, s.seasonal_milli,
               CAST(floor(CAST(sum(abs(d.detr_milli - s.seasonal_milli))
                 AS DOUBLE) / count(*)) AS BIGINT) AS mean_abs_resid_milli
        FROM detr d JOIN seas s ON d.dow = s.dow
        GROUP BY 1, 2, 3 ORDER BY 1""")),

    // --------------------------------------------------------------- q592
    QDef("q592_universe_sample",
      (s, dir) => {
        val sampledKeys = t(s, dir, "customer")
          .where(PortableHash.md5Long(col("c_custkey").cast("string"),
            "universe") % 16 === 0)
          .select(col("c_custkey").as("sk"))
        val o = t(s, dir, "orders")
          .selectExpr("o_custkey",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DIV 100 AS dollars")
        val est = o.join(sampledKeys, col("o_custkey") === col("sk"))
          .join(t(s, dir, "customer").select("c_custkey", "c_mktsegment"),
            expr("o_custkey = c_custkey"))
          .agg(count(lit(1)).as("s_rows"),
            sum("dollars").cast("long").as("s_dollars"))
          .selectExpr("s_rows * 16 AS est_rows",
            "s_dollars * 16 AS est_dollars")
        val exact = o
          .join(t(s, dir, "customer").select("c_custkey"),
            expr("o_custkey = c_custkey"))
          .agg(count(lit(1)).as("exact_rows"),
            sum("dollars").cast("long").as("exact_dollars"))
        exact.crossJoin(broadcast(est))
          .where(expr("exact_rows > 0 AND exact_dollars > 0"))
          .selectExpr("exact_rows", "est_rows",
            "abs(est_rows - exact_rows) * 10000 DIV exact_rows AS row_err_bp",
            "exact_dollars", "est_dollars",
            """abs(est_dollars - exact_dollars) * 10000
               DIV exact_dollars AS dollar_err_bp""")
      },
      Some(s"""
        WITH sk AS (
          SELECT c_custkey AS sk FROM customer
          WHERE ${PortableHash.md5LongSql("CAST(c_custkey AS VARCHAR)",
            "universe")} % 16 = 0),
        o AS (
          SELECT o_custkey,
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 100
                   AS dollars
          FROM orders),
        est AS (
          SELECT CAST(count(*) AS BIGINT) * 16 AS est_rows,
                 CAST(sum(o.dollars) AS BIGINT) * 16 AS est_dollars
          FROM o JOIN sk ON o.o_custkey = sk.sk
          JOIN customer c ON o.o_custkey = c.c_custkey),
        ex AS (
          SELECT CAST(count(*) AS BIGINT) AS exact_rows,
                 CAST(sum(o.dollars) AS BIGINT) AS exact_dollars
          FROM o JOIN customer c ON o.o_custkey = c.c_custkey)
        SELECT exact_rows, est_rows,
               abs(est_rows - exact_rows) * 10000 // exact_rows AS row_err_bp,
               exact_dollars, est_dollars,
               abs(est_dollars - exact_dollars) * 10000 // exact_dollars
                 AS dollar_err_bp
        FROM ex, est
        WHERE exact_rows > 0 AND exact_dollars > 0""")),

    // --------------------------------------------------------------- q593
    QDef("q593_equidepth_histogram",
      (s, dir) => {
        val census = t(s, dir, "orders")
          .selectExpr(
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DIV 100 AS v")
          .groupBy("v").agg(count(lit(1)).as("c"))
        val w = Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = census
          .withColumn("cum", sum("c").over(w).cast("long"))
        val tot = census.agg(sum("c").cast("long").as("n"))
        val s2 = s
        import s2.implicits._
        val ks = (1 to 10).map(_.toLong).toDF("k")
        // boundary_k = smallest v with cum ≥ ceil(k·n/10)
        // cum is monotone in v, so the min-v qualifying row also has the
        // min cum — no struct argmin needed
        val bounds = cum.crossJoin(broadcast(tot))
          .crossJoin(broadcast(ks))
          .where(expr("cum * 10 >= k * n"))
          .groupBy("k", "n")
          .agg(min("v").as("boundary"), min("cum").cast("long").as("cum_at"))
        bounds
          .withColumn("prev_cum", coalesce(lag("cum_at", 1).over(
            Window.orderBy("k")), lit(0L)))
          .selectExpr("k", "boundary",
            "cum_at - prev_cum AS bucket_count",
            "abs((cum_at - prev_cum) * 10 - n) * 10000 DIV n AS dev_bp")
          .orderBy("k")
      },
      Some("""
        WITH census AS (
          SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 100 AS v,
                 CAST(count(*) AS BIGINT) AS c
          FROM orders GROUP BY 1),
        cum AS (
          SELECT v, CAST(sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                   AS BIGINT) AS cum
          FROM census),
        tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM census),
        ks AS (SELECT unnest(range(1, 11)) AS k),
        bounds AS (
          SELECT k, n, min(v) AS boundary, CAST(min(cum) AS BIGINT) AS cum_at
          FROM cum, tot, ks WHERE cum * 10 >= k * n
          GROUP BY 1, 2)
        SELECT CAST(k AS BIGINT) AS k, boundary,
               cum_at - coalesce(lag(cum_at) OVER (ORDER BY k), 0)
                 AS bucket_count,
               abs((cum_at - coalesce(lag(cum_at) OVER (ORDER BY k), 0))
                 * 10 - n) * 10000 // n AS dev_bp
        FROM bounds ORDER BY k"""))
  )
}
