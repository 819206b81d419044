package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 61 — discount response, status mix,
  * length quartiles:
  *
  *  - q270: discount lift — mean quantity (milli) and revenue share at
  *    discount tiers (0-2% / 3-5% / ≥6%): does discounting move
  *    volume. One scan, conditional tiers, exact integers.
  *  - q271: order-status mix per year (bp) — the composition drift of
  *    the order lifecycle over time.
  *  - q272: document-length quartiles per language — ntile(4) with
  *    deterministic tiebreak, per-quartile min/max/count: the compact
  *    length-distribution summary the curation filters (q211) are
  *    tuned against.
  *
  * Reference analog: discount lift = price-promotion response;
  * status mix = task-state composition per epoch; quartiles =
  * review-length profile per language.
  */
object QueriesBP extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q270
    QDef("q270_discount_lift",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
          .selectExpr(
            "CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS disc_pct",
            "CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty",
            "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents")
          .selectExpr("""
            CASE WHEN disc_pct <= 2 THEN 'a_0_2'
                 WHEN disc_pct <= 5 THEN 'b_3_5'
                 ELSE 'c_6_plus' END AS tier""", "qty", "cents")
        l.groupBy("tier")
          .agg(count(lit(1)).as("n"),
            expr("CAST(sum(qty) AS BIGINT) * 1000 DIV count(1)").as("mean_qty_milli"),
            sum("cents").cast("bigint").as("rev_cents"))
          .withColumn("rev_share_bp", expr(
            "CAST(rev_cents * 10000 DIV (sum(rev_cents) OVER ()) AS BIGINT)"))
          .selectExpr("tier", "n", "mean_qty_milli", "rev_cents", "rev_share_bp")
          .orderBy("tier")
      },
      Some("""
        WITH l AS (
          SELECT CASE WHEN CAST(floor(l_discount * 100 + 0.5) AS BIGINT) <= 2 THEN 'a_0_2'
                      WHEN CAST(floor(l_discount * 100 + 0.5) AS BIGINT) <= 5 THEN 'b_3_5'
                      ELSE 'c_6_plus' END AS tier,
                 CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty,
                 CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
          FROM lineitem),
        g AS (
          SELECT tier, count(*) AS n,
                 CAST(sum(qty) AS BIGINT) * 1000 // count(*) AS mean_qty_milli,
                 CAST(sum(cents) AS BIGINT) AS rev_cents
          FROM l GROUP BY 1)
        SELECT tier, n, mean_qty_milli, rev_cents,
               CAST(rev_cents * 10000 // (sum(rev_cents) OVER ()) AS BIGINT) AS rev_share_bp
        FROM g ORDER BY tier""")),

    // --------------------------------------------------------------- q271
    QDef("q271_status_mix",
      (s, dir) => {
        t(s, dir, "orders")
          .selectExpr("year(CAST(o_orderdate AS TIMESTAMP)) AS yr", "o_orderstatus")
          .groupBy("yr", "o_orderstatus").agg(count(lit(1)).as("n"))
          .withColumn("share_bp",
            expr("CAST(n * 10000 DIV (sum(n) OVER (PARTITION BY yr)) AS BIGINT)"))
          .orderBy("yr", "o_orderstatus")
      },
      Some("""
        WITH y AS (
          SELECT CAST(year(o_orderdate) AS INT) AS yr, o_orderstatus, count(*) AS n
          FROM orders GROUP BY 1, 2)
        SELECT yr, o_orderstatus, n,
               CAST(n * 10000 // (sum(n) OVER (PARTITION BY yr)) AS BIGINT) AS share_bp
        FROM y ORDER BY yr, o_orderstatus""")),

    // --------------------------------------------------------------- q272
    QDef("q272_length_quartiles",
      (s, dir) => {
        val w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
        t(s, dir, "documents")
          .select(col("lang"), col("n_chars"), col("doc_id"))
          .withColumn("q", ntile(4).over(w))
          .groupBy("lang", "q")
          .agg(count(lit(1)).as("n_docs"),
            min("n_chars").cast("bigint").as("min_chars"),
            max("n_chars").cast("bigint").as("max_chars"))
          .selectExpr("lang", "CAST(q AS BIGINT) AS quartile", "n_docs",
            "min_chars", "max_chars")
          .orderBy("lang", "quartile")
      },
      Some("""
        WITH q AS (
          SELECT lang, n_chars,
                 ntile(4) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS q
          FROM documents)
        SELECT lang, CAST(q AS BIGINT) AS quartile, count(*) AS n_docs,
               CAST(min(n_chars) AS BIGINT) AS min_chars,
               CAST(max(n_chars) AS BIGINT) AS max_chars
        FROM q GROUP BY 1, 2 ORDER BY lang, quartile"""))
  )
}
