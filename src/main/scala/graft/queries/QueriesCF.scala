package graft.queries

import graft.Tables.t
import graft.functions.PortableHash
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 77 — cluster-membership routing,
  * aggregate pushdown, contingency construction, NULL semantics:
  *
  *  - q331: consistent hashing via Highest-Random-Weight (rendezvous):
  *    every key scores all buckets with the portable hash and lands on
  *    the argmax — growing the ring 16→17 moves EXACTLY the keys whose
  *    new bucket wins (≈1/17), vs mod-hashing which moves ~16/17. The
  *    shard-rebalancing math every stateful 100 TB service relies on.
  *  - q332: partial-aggregation pushdown proof — revenue per nation
  *    computed with per-orderkey then per-custkey pre-aggregation
  *    below the joins (shuffle shrinks from |lineitem| to |orders| to
  *    |customer|); oracle computes the naive join-then-aggregate:
  *    hash-match proves the rewrite is lossless.
  *  - q333: contingency-table construction via Spark's
  *    `DataFrameStatFunctions.crosstab` physical operator (event_type ×
  *    day-of-week), mirrored by conditional sums in the oracle.
  *  - q334: three-valued-logic audit — TRUE/FALSE/UNKNOWN counts for a
  *    predicate over a NULLable measure, NOT-inversion keeping UNKNOWN
  *    fixed, IN-list containing NULL (never FALSE), and null-safe
  *    equality (`<=>` / IS NOT DISTINCT FROM); engine-parity proof of
  *    ANSI NULL semantics on both sides.
  *
  * Reference analog: task-queue shard assignment across workers,
  * reporting rollup reuse, status×time admin matrices, NULLable
  * payload-field accounting.
  */
object QueriesCF extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q331
    QDef("q331_consistent_hash",
      (s, dir) => {
        val keys = t(s, dir, "customer").select(col("c_custkey"))
        val scored = keys
          .withColumn("b", explode(array((0 to 16).map(lit(_)): _*)))
          .withColumn("score", PortableHash.md5Long(
            concat(col("c_custkey"), lit("#"), col("b")), salt = "hrw~"))
        val w16 = Window.partitionBy("c_custkey")
          .orderBy(col("score").desc, col("b"))
        val b16 = scored.where(col("b") < 16)
          .withColumn("rk", row_number().over(w16)).where(col("rk") === 1)
          .select(col("c_custkey"), col("b").as("b16"))
        val b17 = scored
          .withColumn("rk", row_number().over(w16)).where(col("rk") === 1)
          .select(col("c_custkey").as("ck"), col("b").as("b17"))
        val joined = b16.join(b17, col("c_custkey") === col("ck")).cache()
        joined.count()
        val moved = joined.agg(
          count(lit(1)).as("n_keys"),
          expr("CAST(sum(CASE WHEN b16 <> b17 THEN 1 ELSE 0 END) AS BIGINT)")
            .as("n_moved"))
        val load16 = joined.groupBy("b16").agg(count(lit(1)).as("l"))
          .agg(max("l").cast("bigint").as("max_load_16"))
        val load17 = joined.groupBy("b17").agg(count(lit(1)).as("l"))
          .agg(max("l").cast("bigint").as("max_load_17"))
        moved.crossJoin(broadcast(load16)).crossJoin(broadcast(load17))
          .selectExpr("n_keys", "n_moved",
            "n_moved * 10000 DIV n_keys AS moved_bp",
            "max_load_16", "max_load_17")
      },
      Some {
        val h = PortableHash.md5LongSql(
          "concat(CAST(c_custkey AS VARCHAR), '#', CAST(b AS VARCHAR))",
          salt = "hrw~")
        s"""
        WITH scored AS (
          SELECT c_custkey, b, $h AS score
          FROM customer, (SELECT unnest(generate_series(0, 16)) AS b)),
        b16 AS (
          SELECT c_custkey, b AS b16 FROM (
            SELECT c_custkey, b, row_number() OVER (PARTITION BY c_custkey
              ORDER BY score DESC, b) AS rk
            FROM scored WHERE b < 16) WHERE rk = 1),
        b17 AS (
          SELECT c_custkey, b AS b17 FROM (
            SELECT c_custkey, b, row_number() OVER (PARTITION BY c_custkey
              ORDER BY score DESC, b) AS rk
            FROM scored) WHERE rk = 1),
        j AS (SELECT b16.c_custkey, b16, b17 FROM b16 JOIN b17 USING (c_custkey)),
        mv AS (
          SELECT count(*) AS n_keys,
                 CAST(sum(CASE WHEN b16 <> b17 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_moved
          FROM j),
        l16 AS (SELECT CAST(max(l) AS BIGINT) AS max_load_16
                FROM (SELECT count(*) AS l FROM j GROUP BY b16)),
        l17 AS (SELECT CAST(max(l) AS BIGINT) AS max_load_17
                FROM (SELECT count(*) AS l FROM j GROUP BY b17))
        SELECT n_keys, n_moved, n_moved * 10000 // n_keys AS moved_bp,
               max_load_16, max_load_17
        FROM mv, l16, l17"""
      }),

    // --------------------------------------------------------------- q332
    QDef("q332_preagg_pushdown",
      (s, dir) => {
        // partial aggregates pushed below each join: the shuffled row
        // count collapses at every level (lineitem → orderkey groups →
        // custkey groups → nation rows)
        val perOrder = t(s, dir, "lineitem")
          .selectExpr("l_orderkey",
            "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents")
          .groupBy("l_orderkey")
          .agg(sum("cents").cast("bigint").as("o_cents"),
            count(lit(1)).as("o_items"))
        val perCust = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
          .join(perOrder, col("o_orderkey") === col("l_orderkey"))
          .groupBy("o_custkey")
          .agg(sum("o_cents").cast("bigint").as("c_cents"),
            sum("o_items").cast("bigint").as("c_items"))
        t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
          .join(perCust, col("c_custkey") === col("o_custkey"))
          .groupBy("c_nationkey")
          .agg(sum("c_cents").cast("bigint").as("rev_cents"),
            sum("c_items").cast("bigint").as("n_items"))
          .orderBy("c_nationkey")
      },
      // oracle: the naive join-then-aggregate — identical by associativity
      Some("""
        SELECT c_nationkey,
               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                 AS BIGINT) AS rev_cents,
               count(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q333
    QDef("q333_crosstab",
      (s, dir) => {
        val base = t(s, dir, "events")
          .selectExpr("event_type",
            s"CAST(((($tsMs) DIV 86400000) + 4) % 7 AS STRING) AS dow")
        base.stat.crosstab("event_type", "dow")
          .orderBy("event_type_dow")
      },
      Some {
        val cols = (0 to 6).map(d =>
          s"""CAST(sum(CASE WHEN dow = '$d' THEN 1 ELSE 0 END) AS BIGINT) AS "$d"""")
          .mkString(", ")
        s"""
        WITH base AS (
          SELECT event_type,
                 CAST(((epoch_ms(ts) // 86400000) + 4) % 7 AS VARCHAR) AS dow
          FROM events)
        SELECT event_type AS event_type_dow, $cols
        FROM base GROUP BY 1 ORDER BY 1"""
      }),

    // --------------------------------------------------------------- q334
    QDef("q334_null_semantics",
      (s, dir) => {
        t(s, dir, "events")
          .selectExpr("value")
          .agg(
            count(lit(1)).as("n_rows"),
            expr("CAST(sum(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT)").as("p_true"),
            expr("CAST(sum(CASE WHEN NOT (value > 50) THEN 1 ELSE 0 END) AS BIGINT)").as("p_false"),
            expr("CAST(sum(CASE WHEN (value > 50) IS NULL THEN 1 ELSE 0 END) AS BIGINT)").as("p_unknown"),
            expr("CAST(sum(CASE WHEN value IN (10.5, 20.0, NULL) THEN 1 ELSE 0 END) AS BIGINT)").as("in_true"),
            expr("CAST(sum(CASE WHEN (value IN (10.5, 20.0, NULL)) IS NULL THEN 1 ELSE 0 END) AS BIGINT)").as("in_unknown"),
            expr("CAST(sum(CASE WHEN value <=> CAST(NULL AS DOUBLE) THEN 1 ELSE 0 END) AS BIGINT)").as("nullsafe_null"),
            expr("CAST(sum(CASE WHEN NOT (value <=> 10.5) THEN 1 ELSE 0 END) AS BIGINT)").as("distinct_from"))
      },
      Some("""
        SELECT count(*) AS n_rows,
               CAST(sum(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT) AS p_true,
               CAST(sum(CASE WHEN NOT (value > 50) THEN 1 ELSE 0 END) AS BIGINT) AS p_false,
               CAST(sum(CASE WHEN (value > 50) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS p_unknown,
               CAST(sum(CASE WHEN value IN (10.5, 20.0, NULL) THEN 1 ELSE 0 END) AS BIGINT) AS in_true,
               CAST(sum(CASE WHEN (value IN (10.5, 20.0, NULL)) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS in_unknown,
               CAST(sum(CASE WHEN value IS NOT DISTINCT FROM CAST(NULL AS DOUBLE) THEN 1 ELSE 0 END) AS BIGINT) AS nullsafe_null,
               CAST(sum(CASE WHEN NOT (value IS NOT DISTINCT FROM 10.5) THEN 1 ELSE 0 END) AS BIGINT) AS distinct_from
        FROM events"""))
  )
}
