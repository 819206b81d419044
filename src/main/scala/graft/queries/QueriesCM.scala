package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 84 — window-function surface,
  * array algebra, regex mining, bidirectional imputation:
  *
  *  - q359: window-function suite — per customer order history in one
  *    pass: first/second/last order price (nth_value / first_value /
  *    last_value with explicit frames), rank-vs-dense_rank gap on price
  *    ties; exercises the full ranking family the reference's
  *    `Meta.ordering` views rely on.
  *  - q360: array set algebra — per-user event-type sets for the two
  *    month-halves compared via array_intersect/except/union SIZES
  *    (sizes are order-free, so both engines agree without canonical
  *    array ordering), rolled into a Jaccard histogram.
  *  - q361: regex number mining — regexp_extract_all of integer tokens
  *    in document text: counts, numeric density, exact digit sums per
  *    language (the structured-fact extraction shape).
  *  - q362: nearest-neighbor gap fill — missing days in the daily
  *    revenue series imputed from the NEARER of last-before /
  *    first-after observation (ties → earlier), via two count-over
  *    grouping passes (no IGNORE NULLS dependence); pandas
  *    `interpolate(method=nearest)` semantics, q90's LOCF generalized.
  *
  * Reference analog: latest-N-responses views, listing amenity-set
  * drift between scrape epochs, price/number extraction from raw
  * payload text, calendar series repair.
  */
object QueriesCM extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q359
    QDef("q359_window_suite",
      (s, dir) => {
        val ord = t(s, dir, "orders").selectExpr("o_custkey",
          "o_orderkey",
          "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS d",
          "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
        val wSeq = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
        val wFull = wSeq.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)
        val wPrice = Window.partitionBy("o_custkey")
          .orderBy(col("cents").desc, col("o_orderkey"))
        val wPriceTies = Window.partitionBy("o_custkey")
          .orderBy(col("cents").desc)
        ord
          .withColumn("first_cents", first("cents").over(wFull))
          .withColumn("second_cents", expr(
            "nth_value(cents, 2) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"))
          .withColumn("last_cents", last("cents").over(wFull))
          .withColumn("rk", rank().over(wPriceTies).cast("long"))
          .withColumn("drk", dense_rank().over(wPriceTies).cast("long"))
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders"),
            max("first_cents").cast("bigint").as("first_cents"),
            max(coalesce(col("second_cents"), lit(0L))).cast("bigint")
              .as("second_cents"),
            max("last_cents").cast("bigint").as("last_cents"),
            expr("CAST(max(rk - drk) AS BIGINT)").as("max_rank_gap"))
          .where(col("n_orders") >= 3)
          .orderBy("o_custkey").limit(50)
      },
      Some("""
        WITH ord AS (
          SELECT o_custkey, o_orderkey,
                 epoch_ms(o_orderdate) // 86400000 AS d,
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
          FROM orders),
        win AS (
          SELECT o_custkey,
                 first_value(cents) OVER wf AS first_cents,
                 nth_value(cents, 2) OVER wf AS second_cents,
                 last_value(cents) OVER wf AS last_cents,
                 CAST(rank() OVER wp AS BIGINT) AS rk,
                 CAST(dense_rank() OVER wp AS BIGINT) AS drk
          FROM ord
          WINDOW wf AS (PARTITION BY o_custkey ORDER BY d, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING),
                 wp AS (PARTITION BY o_custkey ORDER BY cents DESC))
        SELECT o_custkey, count(*) AS n_orders,
               CAST(max(first_cents) AS BIGINT) AS first_cents,
               CAST(max(coalesce(second_cents, 0)) AS BIGINT) AS second_cents,
               CAST(max(last_cents) AS BIGINT) AS last_cents,
               CAST(max(rk - drk) AS BIGINT) AS max_rank_gap
        FROM win GROUP BY 1 HAVING count(*) >= 3
        ORDER BY o_custkey LIMIT 50""")),

    // --------------------------------------------------------------- q360
    QDef("q360_array_setops",
      (s, dir) => {
        val halves = t(s, dir, "events")
          .selectExpr("user_id", "event_type",
            s"CASE WHEN (($tsMs) DIV 86400000) % 2 = 0 THEN 1 ELSE 2 END AS half")
          .distinct()
          .groupBy("user_id")
          .agg(
            expr("sort_array(collect_set(CASE WHEN half = 1 THEN event_type END)) AS t1"),
            expr("sort_array(collect_set(CASE WHEN half = 2 THEN event_type END)) AS t2"))
        halves
          .selectExpr("user_id",
            "size(array_intersect(t1, t2)) AS n_both",
            "size(array_except(t1, t2)) AS n_only1",
            "size(array_except(t2, t1)) AS n_only2",
            "size(array_union(t1, t2)) AS n_union")
          .where(col("n_union") > 0)
          .selectExpr("n_both * 10 DIV n_union AS jaccard_decile",
            "n_both", "n_only1", "n_only2")
          .groupBy("jaccard_decile")
          .agg(count(lit(1)).as("n_users"),
            sum("n_both").cast("bigint").as("sum_both"),
            sum("n_only1").cast("bigint").as("sum_only1"),
            sum("n_only2").cast("bigint").as("sum_only2"))
          .orderBy("jaccard_decile")
      },
      Some("""
        WITH dt AS (
          SELECT DISTINCT user_id, event_type,
                 CASE WHEN (epoch_ms(ts) // 86400000) % 2 = 0
                      THEN 1 ELSE 2 END AS half
          FROM events),
        sets AS (
          SELECT user_id,
                 list_sort(list(DISTINCT CASE WHEN half = 1
                   THEN event_type END)) AS t1raw,
                 list_sort(list(DISTINCT CASE WHEN half = 2
                   THEN event_type END)) AS t2raw
          FROM dt GROUP BY 1),
        clean AS (
          SELECT user_id,
                 list_filter(t1raw, x -> x IS NOT NULL) AS t1,
                 list_filter(t2raw, x -> x IS NOT NULL) AS t2
          FROM sets),
        sized AS (
          SELECT user_id,
                 len(list_intersect(t1, t2)) AS n_both,
                 len(list_filter(t1, x -> NOT list_contains(t2, x))) AS n_only1,
                 len(list_filter(t2, x -> NOT list_contains(t1, x))) AS n_only2,
                 len(list_distinct(list_concat(t1, t2))) AS n_union
          FROM clean)
        SELECT n_both * 10 // n_union AS jaccard_decile,
               count(*) AS n_users,
               CAST(sum(n_both) AS BIGINT) AS sum_both,
               CAST(sum(n_only1) AS BIGINT) AS sum_only1,
               CAST(sum(n_only2) AS BIGINT) AS sum_only2
        FROM sized WHERE n_union > 0
        GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q361
    QDef("q361_regex_extract",
      (s, dir) => {
        t(s, dir, "documents")
          .selectExpr("lang",
            "regexp_extract_all(text, '[0-9]+', 0) AS nums")
          .selectExpr("lang", "size(nums) AS n_nums",
            // fold: exact digit-count sum (value sums may overflow; digit
            // counts are bounded)
            "aggregate(nums, 0L, (acc, x) -> acc + length(x)) AS digit_chars",
            "CASE WHEN size(nums) > 0 THEN 1 ELSE 0 END AS has_num")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_nums").cast("bigint").as("numbers_found"),
            sum("digit_chars").cast("bigint").as("digit_chars"),
            sum("has_num").cast("bigint").as("docs_with_numbers"))
          .orderBy("lang")
      },
      Some("""
        WITH d AS (
          SELECT lang, regexp_extract_all(text, '[0-9]+') AS nums
          FROM documents),
        per AS (
          SELECT lang, len(nums) AS n_nums,
                 CAST(coalesce(list_sum(list_transform(nums,
                   x -> length(x))), 0) AS BIGINT) AS digit_chars,
                 CASE WHEN len(nums) > 0 THEN 1 ELSE 0 END AS has_num
          FROM d)
        SELECT lang, count(*) AS n_docs,
               CAST(sum(n_nums) AS BIGINT) AS numbers_found,
               CAST(sum(digit_chars) AS BIGINT) AS digit_chars,
               CAST(sum(has_num) AS BIGINT) AS docs_with_numbers
        FROM per GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q362
    QDef("q362_nearest_fill",
      (s, dir) => {
        val daily = t(s, dir, "orders")
          .where(col("o_orderkey") % 3 === 0) // thin the series → real gaps
          .selectExpr(
            "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS d",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
          .groupBy("d").agg(sum("cents").cast("bigint").as("rev"))
        val span = daily.agg(min("d").as("d0"), max("d").as("d1"))
        val cal = span.selectExpr("explode(sequence(d0, d1)) AS d")
        val joined = cal.join(daily, Seq("d"), "left")
        val wAsc = Window.orderBy("d")
        val filled = joined
          .withColumn("grp_b", count(when(col("rev").isNotNull, 1)).over(
            wAsc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("prev_rev", max(when(col("rev").isNotNull, col("rev")))
            .over(Window.partitionBy("grp_b")))
          .withColumn("prev_d", max(when(col("rev").isNotNull, col("d")))
            .over(Window.partitionBy("grp_b")))
          .withColumn("grp_f", count(when(col("rev").isNotNull, 1)).over(
            wAsc.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
          .withColumn("next_rev", max(when(col("rev").isNotNull, col("rev")))
            .over(Window.partitionBy("grp_f")))
          .withColumn("next_d", min(when(col("rev").isNotNull, col("d")))
            .over(Window.partitionBy("grp_f")))
          .selectExpr("d", "rev",
            """CASE WHEN rev IS NOT NULL THEN rev
               WHEN prev_d IS NULL THEN next_rev
               WHEN next_d IS NULL THEN prev_rev
               WHEN d - prev_d <= next_d - d THEN prev_rev
               ELSE next_rev END AS filled_rev""",
            "CASE WHEN rev IS NULL THEN 1 ELSE 0 END AS was_gap")
        filled.agg(count(lit(1)).as("n_days"),
            expr("CAST(sum(was_gap) AS BIGINT)").as("n_gaps"),
            expr("CAST(sum(filled_rev) AS BIGINT)").as("sum_filled"),
            expr("CAST(sum(CASE WHEN was_gap = 1 THEN filled_rev ELSE 0 END) AS BIGINT)")
              .as("imputed_total"))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_ms(o_orderdate) // 86400000 AS d,
                 CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS BIGINT) AS rev
          FROM orders WHERE o_orderkey % 3 = 0 GROUP BY 1),
        span AS (SELECT min(d) AS d0, max(d) AS d1 FROM daily),
        cal AS (SELECT unnest(range(d0, d1 + 1)) AS d FROM span),
        j AS (SELECT cal.d, daily.rev FROM cal LEFT JOIN daily USING (d)),
        marked AS (
          SELECT d, rev,
                 count(CASE WHEN rev IS NOT NULL THEN 1 END) OVER
                   (ORDER BY d ROWS UNBOUNDED PRECEDING) AS grp_b,
                 count(CASE WHEN rev IS NOT NULL THEN 1 END) OVER
                   (ORDER BY d ROWS BETWEEN CURRENT ROW
                    AND UNBOUNDED FOLLOWING) AS grp_f
          FROM j),
        filled AS (
          SELECT d, rev,
                 max(CASE WHEN rev IS NOT NULL THEN rev END) OVER
                   (PARTITION BY grp_b) AS prev_rev,
                 max(CASE WHEN rev IS NOT NULL THEN d END) OVER
                   (PARTITION BY grp_b) AS prev_d,
                 max(CASE WHEN rev IS NOT NULL THEN rev END) OVER
                   (PARTITION BY grp_f) AS next_rev,
                 min(CASE WHEN rev IS NOT NULL THEN d END) OVER
                   (PARTITION BY grp_f) AS next_d
          FROM marked),
        out AS (
          SELECT d, rev,
                 CASE WHEN rev IS NOT NULL THEN rev
                      WHEN prev_d IS NULL THEN next_rev
                      WHEN next_d IS NULL THEN prev_rev
                      WHEN d - prev_d <= next_d - d THEN prev_rev
                      ELSE next_rev END AS filled_rev,
                 CASE WHEN rev IS NULL THEN 1 ELSE 0 END AS was_gap
          FROM filled)
        SELECT count(*) AS n_days,
               CAST(sum(was_gap) AS BIGINT) AS n_gaps,
               CAST(sum(filled_rev) AS BIGINT) AS sum_filled,
               CAST(sum(CASE WHEN was_gap = 1 THEN filled_rev ELSE 0 END)
                 AS BIGINT) AS imputed_total
        FROM out"""))
  )
}
