package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 59 — basket shape, dispersion,
  * correlation-by-group, customer lifetime value:
  *
  *  - q262: basket-size profile — lines-per-order histogram per order
  *    priority with exact mean milli. The order-shape distribution
  *    that sizes the co-occurrence fan-out (q140/q184's cost driver).
  *  - q263: price dispersion — squared coefficient of variation per
  *    brand in exact milli via CV² = (n·S2 − S1²)/S1²: which
  *    categories have homogeneous vs spread pricing (q248's identity
  *    on a value column instead of counts).
  *  - q264: length–quality correlation per language — sign and r²
  *    (micro) between doc length and stopword count from exact BIGINT
  *    component sums (q84's machinery per group, sqrt avoided by
  *    reporting signed r²).
  *  - q265: LTV curve — average cumulative revenue (cents) after the
  *    1st / 3rd / 5th order per market segment: one rank window, three
  *    conditional aggregates. The cohort-free lifetime-value report.
  *
  * Reference analog: basket profile = listings-per-survey-response
  * distribution; dispersion = price spread per room-type; correlation
  * = does review length predict quality signals; LTV = repeat-booking
  * value accrual per segment.
  */
object QueriesBN extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q262
    QDef("q262_basket_profile",
      (s, dir) => {
        val sizes = t(s, dir, "lineitem")
          .groupBy("l_orderkey").agg(count(lit(1)).as("n_lines"))
        t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority"))
          .join(sizes, col("o_orderkey") === col("l_orderkey"))
          .selectExpr("o_orderpriority", "n_lines",
            "least(n_lines, 7L) AS size_bucket")
          .groupBy("o_orderpriority", "size_bucket")
          .agg(count(lit(1)).as("n_orders"),
            expr("CAST(sum(n_lines) AS BIGINT) * 1000 DIV count(1)").as("mean_lines_milli"))
          .orderBy("o_orderpriority", "size_bucket")
      },
      Some("""
        WITH sz AS (
          SELECT l_orderkey, count(*) AS n_lines FROM lineitem GROUP BY 1)
        SELECT o.o_orderpriority, least(sz.n_lines, 7) AS size_bucket,
               count(*) AS n_orders,
               CAST(sum(sz.n_lines) AS BIGINT) * 1000 // count(*) AS mean_lines_milli
        FROM orders o JOIN sz ON o.o_orderkey = sz.l_orderkey
        GROUP BY 1, 2 ORDER BY o_orderpriority, size_bucket""")),

    // --------------------------------------------------------------- q263
    QDef("q263_price_dispersion",
      (s, dir) => {
        t(s, dir, "part")
          .selectExpr("p_brand",
            "CAST(floor(p_retailprice + 0.5) AS BIGINT) AS v")
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n"),
            sum("v").cast("bigint").as("s1"),
            sum(col("v") * col("v")).cast("bigint").as("s2"))
          .selectExpr("p_brand", "n", "s1 AS total_dollars",
            "CASE WHEN s1 > 0 THEN (n * s2 - s1 * s1) * 1000 DIV (s1 * s1) END AS cv2_milli")
          .orderBy("p_brand")
      },
      Some("""
        SELECT p_brand, count(*) AS n,
               CAST(sum(CAST(floor(p_retailprice + 0.5) AS BIGINT)) AS BIGINT) AS total_dollars,
               CASE WHEN CAST(sum(CAST(floor(p_retailprice + 0.5) AS BIGINT)) AS BIGINT) > 0
                    THEN (count(*) * CAST(sum(CAST(floor(p_retailprice + 0.5) AS BIGINT)
                                              * CAST(floor(p_retailprice + 0.5) AS BIGINT)) AS BIGINT)
                          - CAST(sum(CAST(floor(p_retailprice + 0.5) AS BIGINT)) AS BIGINT)
                            * CAST(sum(CAST(floor(p_retailprice + 0.5) AS BIGINT)) AS BIGINT))
                         * 1000
                         // (CAST(sum(CAST(floor(p_retailprice + 0.5) AS BIGINT)) AS BIGINT)
                            * CAST(sum(CAST(floor(p_retailprice + 0.5) AS BIGINT)) AS BIGINT))
               END AS cv2_milli
        FROM part GROUP BY 1 ORDER BY p_brand""")),

    // --------------------------------------------------------------- q264
    QDef("q264_len_quality_corr",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars").cast("bigint").as("x"),
            explode(split(col("text"), " ")).as("word"))
          .groupBy("doc_id", "lang", "x")
          .agg(sum(when(col("word").isin("the", "a", "of", "and", "to", "in"), 1L)
            .otherwise(0L)).cast("bigint").as("y"))
        d.groupBy("lang")
          .agg(count(lit(1)).as("n"),
            sum("x").cast("bigint").as("sx"), sum("y").cast("bigint").as("sy"),
            sum(col("x") * col("y")).cast("bigint").as("sxy"),
            sum(col("x") * col("x")).cast("bigint").as("sxx"),
            sum(col("y") * col("y")).cast("bigint").as("syy"))
          .selectExpr("lang", "n",
            "n * sxy - sx * sy AS num",
            "n * sxx - sx * sx AS dx",
            "n * syy - sy * sy AS dy")
          // num² and dx·dy overflow BIGINT: one fixed IEEE op order +
          // floor-micro (the q133/q204 pattern) — bit-identical doubles
          // in both engines, then an exact floor
          .selectExpr("lang", "n",
            "CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END AS sign",
            """CASE WHEN dx > 0 AND dy > 0 THEN CAST(floor(
                 CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
                   / (CAST(dx AS DOUBLE) * CAST(dy AS DOUBLE)) * 1000000.0)
               AS BIGINT) END AS r2_micro""")
          .orderBy("lang")
      },
      Some("""
        WITH d AS (
          SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS x,
                 CAST(sum(CASE WHEN word IN ('the','a','of','and','to','in')
                               THEN 1 ELSE 0 END) AS BIGINT) AS y
          FROM (SELECT doc_id, lang, n_chars,
                       unnest(string_split(text, ' ')) AS word
                FROM documents)
          GROUP BY 1, 2, 3),
        c AS (
          SELECT lang, count(*) AS n,
                 CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * y) AS BIGINT) AS sxy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(y * y) AS BIGINT) AS syy
          FROM d GROUP BY 1),
        f AS (
          SELECT lang, n, n * sxy - sx * sy AS num,
                 n * sxx - sx * sx AS dx, n * syy - sy * sy AS dy
          FROM c)
        SELECT lang, n,
               CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END AS sign,
               CASE WHEN dx > 0 AND dy > 0 THEN CAST(floor(
                 CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
                   / (CAST(dx AS DOUBLE) * CAST(dy AS DOUBLE)) * 1000000.0)
               AS BIGINT) END AS r2_micro
        FROM f ORDER BY lang""")),

    // --------------------------------------------------------------- q265
    QDef("q265_ltv_curve",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy("ord_ms", "o_orderkey")
        val ranked = t(s, dir, "orders")
          .selectExpr("o_custkey", "o_orderkey",
            "unix_millis(CAST(o_orderdate AS TIMESTAMP)) AS ord_ms",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
          .withColumn("rk", row_number().over(w))
          .withColumn("cum", sum("cents").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val seg = t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment").as("seg"))
        ranked.join(broadcast(seg), col("o_custkey") === col("c_custkey"))
          .groupBy("seg")
          .agg(countDistinct("o_custkey").as("n_customers"),
            expr("CAST(sum(CASE WHEN rk = 1 THEN cum END) AS BIGINT)" +
              " DIV count(CASE WHEN rk = 1 THEN 1 END)").as("ltv1_cents"),
            expr("CAST(sum(CASE WHEN rk = 3 THEN cum END) AS BIGINT)" +
              " DIV count(CASE WHEN rk = 3 THEN 1 END)").as("ltv3_cents"),
            expr("CAST(sum(CASE WHEN rk = 5 THEN cum END) AS BIGINT)" +
              " DIV count(CASE WHEN rk = 5 THEN 1 END)").as("ltv5_cents"))
          .orderBy("seg")
      },
      Some("""
        WITH r AS (
          SELECT o_custkey, o_orderkey,
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
                 row_number() OVER w AS rk,
                 CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   OVER (PARTITION BY o_custkey ORDER BY epoch_ms(o_orderdate), o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
          FROM orders
          WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_ms(o_orderdate), o_orderkey)),
        j AS (
          SELECT c.c_mktsegment AS seg, r.o_custkey, r.rk, r.cum
          FROM r JOIN customer c ON r.o_custkey = c.c_custkey)
        SELECT seg, count(DISTINCT o_custkey) AS n_customers,
               CAST(sum(CASE WHEN rk = 1 THEN cum END) AS BIGINT)
                 // count(CASE WHEN rk = 1 THEN 1 END) AS ltv1_cents,
               CAST(sum(CASE WHEN rk = 3 THEN cum END) AS BIGINT)
                 // count(CASE WHEN rk = 3 THEN 1 END) AS ltv3_cents,
               CAST(sum(CASE WHEN rk = 5 THEN cum END) AS BIGINT)
                 // count(CASE WHEN rk = 5 THEN 1 END) AS ltv5_cents
        FROM j GROUP BY 1 ORDER BY seg"""))
  )
}
