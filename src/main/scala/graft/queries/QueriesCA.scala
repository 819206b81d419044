package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 72 — planning/scheduling shapes and
  * multiset algebra:
  *
  *  - q311: greedy budget knapsack per brand — rank parts by cents-per-
  *    size-unit (one IEEE division as the sort key only; all reported
  *    numbers exact BIGINT), take while running weight fits a quarter of
  *    the brand's total. The crawl-scheduling shape: maximize estimated
  *    yield under a scan-time budget.
  *  - q312: autoscaling simulation — per-hour arrival counts → workers =
  *    ⌈rate/50⌉, count scale-up/down transitions and utilization; the
  *    Lindley-free version of capacity planning (pairs with q124).
  *  - q313: BAG semantics set ops — Spark's exceptAll/intersectAll
  *    physical operators vs DuckDB EXCEPT ALL / INTERSECT ALL on the
  *    (user, event_type) multiset split by odd/even epoch-day;
  *    multiplicities matter, so this is NOT q82 (distinct set algebra).
  *  - q314: Q-Q decile table — per-source document-length deciles vs the
  *    global deciles by exact rank selection (percentile_disc semantics,
  *    ceil(k·n/10) rank), the distribution-shift companion to q166's KS.
  *
  * Reference analog: budget-bounded grid scans, worker-pool sizing for
  * harvest bursts, response-stream diffing between collection epochs,
  * per-source corpus length profiling.
  */
object QueriesCA extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q311
    QDef("q311_budget_knapsack",
      (s, dir) => {
        val parts = t(s, dir, "part").selectExpr("p_partkey", "p_brand",
          "CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS v",
          "CAST(p_size AS BIGINT) AS wt")
        val wBrand = Window.partitionBy("p_brand")
        val wGreedy = Window.partitionBy("p_brand")
          .orderBy((col("v").cast("double") / col("wt").cast("double")).desc,
            col("p_partkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        parts
          .withColumn("budget", (sum("wt").over(wBrand) / lit(4)).cast("long"))
          .withColumn("cumw", sum("wt").over(wGreedy))
          .where(col("cumw") <= col("budget"))
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n_chosen"),
            sum("v").cast("bigint").as("tot_value"),
            sum("wt").cast("bigint").as("tot_weight"),
            max("budget").cast("bigint").as("budget"))
          .selectExpr("p_brand", "n_chosen", "tot_value", "tot_weight",
            "budget", "tot_weight * 1000000 DIV budget AS util_micro")
          .orderBy("p_brand")
      },
      Some("""
        WITH parts AS (
          SELECT p_partkey, p_brand,
                 CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS v,
                 CAST(p_size AS BIGINT) AS wt
          FROM part),
        ranked AS (
          SELECT p_brand, v, wt,
                 CAST(sum(wt) OVER (PARTITION BY p_brand) AS BIGINT) // 4
                   AS budget,
                 CAST(sum(wt) OVER (PARTITION BY p_brand
                   ORDER BY CAST(v AS DOUBLE) / CAST(wt AS DOUBLE) DESC,
                            p_partkey
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumw
          FROM parts),
        chosen AS (SELECT * FROM ranked WHERE cumw <= budget)
        SELECT p_brand, count(*) AS n_chosen,
               CAST(sum(v) AS BIGINT) AS tot_value,
               CAST(sum(wt) AS BIGINT) AS tot_weight,
               CAST(max(budget) AS BIGINT) AS budget,
               CAST(sum(wt) AS BIGINT) * 1000000 // max(budget) AS util_micro
        FROM chosen GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q312
    QDef("q312_autoscale_sim",
      (s, dir) => {
        val cap = 50L
        val hourly = t(s, dir, "events")
          .selectExpr(s"($tsMs) DIV 3600000 AS h")
          .groupBy("h").agg(count(lit(1)).as("rate"))
          .withColumn("workers", expr(s"(rate + ${cap - 1}) DIV $cap"))
        val wOrd = Window.orderBy("h")
        hourly
          .withColumn("prev", coalesce(lag("workers", 1).over(wOrd), lit(0L)))
          .agg(count(lit(1)).as("n_hours"),
            max("workers").cast("bigint").as("max_workers"),
            sum("workers").cast("bigint").as("worker_hours"),
            sum("rate").cast("bigint").as("n_events"),
            expr("CAST(sum(GREATEST(workers - prev, 0)) AS BIGINT)").as("scale_ups"),
            expr("CAST(sum(GREATEST(prev - workers, 0)) AS BIGINT)").as("scale_downs"))
          .selectExpr("n_hours", "max_workers", "worker_hours", "n_events",
            "scale_ups", "scale_downs",
            s"n_events * 1000000 DIV (worker_hours * $cap) AS util_micro")
      },
      Some("""
        WITH hourly AS (
          SELECT epoch_ms(ts) // 3600000 AS h, count(*) AS rate,
                 (count(*) + 49) // 50 AS workers
          FROM events GROUP BY 1),
        seq AS (
          SELECT h, rate, workers,
                 coalesce(lag(workers, 1) OVER (ORDER BY h), 0) AS prev
          FROM hourly)
        SELECT count(*) AS n_hours,
               CAST(max(workers) AS BIGINT) AS max_workers,
               CAST(sum(workers) AS BIGINT) AS worker_hours,
               CAST(sum(rate) AS BIGINT) AS n_events,
               CAST(sum(GREATEST(workers - prev, 0)) AS BIGINT) AS scale_ups,
               CAST(sum(GREATEST(prev - workers, 0)) AS BIGINT) AS scale_downs,
               CAST(sum(rate) AS BIGINT) * 1000000
                 // (CAST(sum(workers) AS BIGINT) * 50) AS util_micro
        FROM seq""")),

    // --------------------------------------------------------------- q313
    QDef("q313_bag_setops",
      (s, dir) => {
        val base = t(s, dir, "events")
          .selectExpr("user_id", "event_type",
            s"(($tsMs) DIV 86400000) % 2 AS par")
        val a = base.where(col("par") === 1).select("user_id", "event_type")
        val b = base.where(col("par") === 0).select("user_id", "event_type")
        def cnt(op: String, df: org.apache.spark.sql.DataFrame) =
          df.agg(count(lit(1)).as("n")).select(lit(op).as("op"), col("n"))
        cnt("a_minus_b_all", a.exceptAll(b))
          .union(cnt("b_minus_a_all", b.exceptAll(a)))
          .union(cnt("intersect_all", a.intersectAll(b)))
          .union(cnt("union_all", a.unionAll(b)))
          .orderBy("op")
      },
      Some("""
        WITH base AS (
          SELECT user_id, event_type,
                 (epoch_ms(ts) // 86400000) % 2 AS par
          FROM events),
        a AS (SELECT user_id, event_type FROM base WHERE par = 1),
        b AS (SELECT user_id, event_type FROM base WHERE par = 0)
        SELECT 'a_minus_b_all' AS op, count(*) AS n
          FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
        UNION ALL
        SELECT 'b_minus_a_all', count(*)
          FROM (SELECT * FROM b EXCEPT ALL SELECT * FROM a)
        UNION ALL
        SELECT 'intersect_all', count(*)
          FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
        UNION ALL
        SELECT 'union_all', count(*)
          FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
        ORDER BY op""")),

    // --------------------------------------------------------------- q314
    QDef("q314_qq_deciles",
      (s, dir) => {
        val docs = t(s, dir, "documents").select(col("source"),
          col("n_chars"), col("doc_id"))
        def deciles(df: org.apache.spark.sql.DataFrame, parts: Seq[String]) = {
          val w = Window.partitionBy(parts.map(col): _*)
            .orderBy(col("n_chars"), col("doc_id"))
          val wn = Window.partitionBy(parts.map(col): _*)
          df.withColumn("rn", row_number().over(w).cast("long"))
            .withColumn("nn", count(lit(1)).over(wn))
            .withColumn("k", explode(array((1 to 9).map(lit(_)): _*)))
            .where(col("rn") === expr("(k * nn + 9) DIV 10"))
        }
        val perSource = deciles(docs, Seq("source"))
          .select(col("source"), col("k"), col("n_chars").as("v_source"))
        // global arm: partitionBy(lit(1)) constant-folds to an
        // unpartitioned (single-task) window — use the distinct-value
        // cumsum instead; value at rank ceil(k·n/10) ⇔ min v with
        // cum(v)·10 ≥ k·n
        val SR = graft.operators.ScaleRank
        val byV = docs.groupBy("n_chars").agg(count(lit(1)).as("c"))
        val global = SR.withTotals(
            SR.withGlobalRunningSum(byV, Seq(col("n_chars")), col("c"), "cum"),
            Seq(sum("c").cast("bigint").as("nn")))
          .withColumn("k", explode(array((1 to 9).map(lit(_)): _*)))
          .where(col("cum") * 10 >= col("k") * col("nn"))
          .groupBy("k").agg(min("n_chars").as("v_global"))
        perSource.join(broadcast(global), "k")
          .selectExpr("source", "CAST(k AS INT) AS k", "v_source", "v_global",
            "v_source - v_global AS gap")
          .orderBy("source", "k")
      },
      Some("""
        WITH ks AS (SELECT * FROM (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9)) t(k)),
        ranked AS (
          SELECT source, n_chars,
                 CAST(row_number() OVER (PARTITION BY source
                   ORDER BY n_chars, doc_id) AS BIGINT) AS rn,
                 count(*) OVER (PARTITION BY source) AS nn
          FROM documents),
        per_source AS (
          SELECT source, k, n_chars AS v_source
          FROM ranked, ks WHERE rn = (k * nn + 9) // 10),
        granked AS (
          SELECT n_chars,
                 CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS rn,
                 count(*) OVER () AS nn
          FROM documents),
        gdec AS (
          SELECT k, n_chars AS v_global
          FROM granked, ks WHERE rn = (k * nn + 9) // 10)
        SELECT source, CAST(k AS INT) AS k, v_source, v_global,
               v_source - v_global AS gap
        FROM per_source JOIN gdec USING (k)
        ORDER BY source, k""")
    )
  )
}
