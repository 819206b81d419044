package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 35 — audit/forensics ops:
  *
  *  - q172: Benford's-law first-digit audit — observed first-digit shares
  *    of the price stream vs Benford expectation. The expected shares are
  *    INTEGER CONSTANT literals (floor(log10(1+1/d)·10⁴)), so the whole
  *    query is exact BIGINT arithmetic: the classic fraud/synthetic-data
  *    detector with zero FP surface.
  *  - q173: Pareto concentration (80/20 audit) — rank users by revenue
  *    desc, cumulative share: how many users cover 80% of revenue, and
  *    the top-10% users' revenue share. Exact integer cross-multiply
  *    comparisons (cum·total vs thresholds), one window over the
  *    (bounded) per-user aggregate.
  */
object QueriesAP extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    QDef("q172_benford",
      (s, dir) => {
        // floor(log10(1 + 1/d) * 10000) for d = 1..9
        val benford = "CASE digit WHEN 1 THEN 3010 WHEN 2 THEN 1760 WHEN 3 THEN 1249 " +
          "WHEN 4 THEN 969 WHEN 5 THEN 791 WHEN 6 THEN 669 WHEN 7 THEN 579 " +
          "WHEN 8 THEN 511 WHEN 9 THEN 457 END"
        val digits = t(s, dir, "lineitem")
          .selectExpr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS pc")
          .where(col("pc") > 0)
          .selectExpr("CAST(substring(CAST(pc AS STRING), 1, 1) AS BIGINT) AS digit")
          .groupBy("digit").agg(count(lit(1)).as("n"))
        digits
          .withColumn("tot", sum("n").over(Window.partitionBy()))
          .selectExpr("digit", "n",
            "n * 10000 DIV tot AS share_bp",
            s"$benford AS benford_bp",
            s"abs(n * 10000 DIV tot - ($benford)) AS dev_bp")
          .orderBy("digit")
      },
      Some("""
        WITH d AS (
          SELECT CAST(substring(CAST(pc AS VARCHAR), 1, 1) AS BIGINT) AS digit
          FROM (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS pc
                FROM lineitem)
          WHERE pc > 0),
        c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
        t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c),
        b AS (SELECT digit, n,
                     CASE digit WHEN 1 THEN 3010 WHEN 2 THEN 1760 WHEN 3 THEN 1249
                       WHEN 4 THEN 969 WHEN 5 THEN 791 WHEN 6 THEN 669
                       WHEN 7 THEN 579 WHEN 8 THEN 511 WHEN 9 THEN 457 END AS benford_bp
              FROM c)
        SELECT digit, CAST(n AS BIGINT) AS n,
               n * 10000 // tot AS share_bp,
               benford_bp,
               abs(n * 10000 // tot - benford_bp) AS dev_bp
        FROM b, t ORDER BY digit""")),

    QDef("q173_pareto",
      (s, dir) => {
        val rev = t(s, dir, "events")
          .where(col("event_type") === "purchase")
          .selectExpr("user_id", "CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc")
          .groupBy("user_id").agg(sum("vc").cast("bigint").as("rev"))
        // exact rank + Lorenz cumsum in one two-phase pass; totals via
        // broadcast agg — no single-task window over all users
        val SR = graft.operators.ScaleRank
        val ranked = SR.withTotals(
          SR.withGlobalRankAndSum(rev,
            Seq(col("rev").desc, col("user_id")), col("rev"), "rn", "cum"),
          Seq(count(lit(1)).as("nu"), sum("rev").cast("bigint").as("tot")))
        ranked.agg(
          max("nu").as("n_users"),
          max("tot").as("total_rev_cents"),
          min(when(expr("cum * 10 >= tot * 8"), col("rn"))).as("users_for_80pct"),
          max(when(expr("rn * 10 <= nu"), col("cum"))).as("top_decile_rev"))
          .selectExpr("n_users", "total_rev_cents", "users_for_80pct",
            "users_for_80pct * 10000 DIV n_users AS users_for_80pct_bp",
            "coalesce(top_decile_rev, 0) * 10000 DIV total_rev_cents AS top_decile_share_bp")
      },
      Some("""
        WITH rev AS (
          SELECT user_id,
                 CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        ranked AS (
          SELECT user_id, rev,
                 row_number() OVER (ORDER BY rev DESC, user_id) AS rn,
                 CAST(sum(rev) OVER (ORDER BY rev DESC, user_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
                 count(*) OVER () AS nu,
                 CAST(sum(rev) OVER () AS BIGINT) AS tot
          FROM rev),
        agg AS (
          SELECT max(nu) AS n_users, max(tot) AS total_rev_cents,
                 min(CASE WHEN cum * 10 >= tot * 8 THEN rn END) AS users_for_80pct,
                 max(CASE WHEN rn * 10 <= nu THEN cum END) AS top_decile_rev
          FROM ranked)
        SELECT CAST(n_users AS BIGINT) AS n_users, total_rev_cents,
               CAST(users_for_80pct AS BIGINT) AS users_for_80pct,
               CAST(users_for_80pct * 10000 // n_users AS BIGINT) AS users_for_80pct_bp,
               CAST(coalesce(top_decile_rev, 0) * 10000 // total_rev_cents AS BIGINT)
                 AS top_decile_share_bp
        FROM agg"""))
  )
}
