package graft.queries

import graft.Tables.t
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 86 — script detection, value-range
  * frames, argmin/argmax, ordered string aggregation:
  *
  *  - q367: Unicode script mix — per-language shares of CJK / digit /
  *    whitespace characters via replace-difference counting (the regex
  *    ranges are embedded as LITERAL unicode characters so the exact
  *    same pattern string feeds Java regex and RE2); the script-based
  *    language-ID signal behind q50.
  *  - q368: value-based RANGE window frame — for each part, how many
  *    parts price within 100 cents below it (RANGE BETWEEN 100
  *    PRECEDING AND CURRENT ROW on the price axis, not time); local
  *    price density for competitive positioning.
  *  - q369: deterministic argmin/argmax — richest/poorest customer per
  *    segment via max_by/min_by over a collision-free composite key
  *    (cents·10⁵ + custkey) so ties cannot make the answer
  *    nondeterministic in either engine.
  *  - q370: ordered string aggregation — per nation the top-3 market
  *    segments by customer count as a comma-joined ranked string
  *    (sort_array of (rank, name) structs → array_join vs string_agg
  *    ORDER BY): the "summary label" reporting shape.
  *
  * Reference analog: script detection over review text, price-band
  * competition density, extreme-listing lookups, per-AOI top-category
  * labels.
  */
object QueriesCO extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q367
    QDef("q367_script_mix",
      (s, dir) => {
        val cjk = "[一-鿿]"
        t(s, dir, "documents")
          .selectExpr("lang",
            "CAST(length(text) AS BIGINT) AS n_chars",
            s"CAST(length(text) - length(regexp_replace(text, '$cjk', '')) AS BIGINT) AS n_cjk",
            "CAST(length(text) - length(regexp_replace(text, '[0-9]', '')) AS BIGINT) AS n_digit",
            "CAST(length(text) - length(regexp_replace(text, ' ', '')) AS BIGINT) AS n_space")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").cast("bigint").as("chars"),
            sum("n_cjk").cast("bigint").as("cjk"),
            sum("n_digit").cast("bigint").as("digits"),
            sum("n_space").cast("bigint").as("spaces"))
          .selectExpr("lang", "n_docs", "chars",
            "cjk * 10000 DIV chars AS cjk_bp",
            "digits * 10000 DIV chars AS digit_bp",
            "spaces * 10000 DIV chars AS space_bp")
          .orderBy("lang")
      },
      Some {
        val cjk = "[一-鿿]"
        s"""
        WITH per AS (
          SELECT lang,
                 CAST(length(text) AS BIGINT) AS n_chars,
                 CAST(length(text) - length(regexp_replace(text, '$cjk', '',
                   'g')) AS BIGINT) AS n_cjk,
                 CAST(length(text) - length(regexp_replace(text, '[0-9]', '',
                   'g')) AS BIGINT) AS n_digit,
                 CAST(length(text) - length(regexp_replace(text, ' ', '',
                   'g')) AS BIGINT) AS n_space
          FROM documents)
        SELECT lang, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS chars,
               CAST(sum(n_cjk) AS BIGINT) * 10000
                 // CAST(sum(n_chars) AS BIGINT) AS cjk_bp,
               CAST(sum(n_digit) AS BIGINT) * 10000
                 // CAST(sum(n_chars) AS BIGINT) AS digit_bp,
               CAST(sum(n_space) AS BIGINT) * 10000
                 // CAST(sum(n_chars) AS BIGINT) AS space_bp
        FROM per GROUP BY 1 ORDER BY 1"""
      }),

    // --------------------------------------------------------------- q368
    QDef("q368_value_range_frame",
      (s, dir) => {
        t(s, dir, "part")
          .selectExpr("p_partkey", "p_brand",
            "CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS cents")
          .withColumn("n_within_100_below", expr(
            """count(*) OVER (PARTITION BY p_brand ORDER BY cents
               RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) - 1"""))
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n_parts"),
            max("n_within_100_below").cast("bigint").as("max_density"),
            expr("CAST(sum(n_within_100_below) AS BIGINT)").as("sum_density"))
          .selectExpr("p_brand", "n_parts", "max_density", "sum_density",
            "sum_density * 1000000 DIV n_parts AS mean_density_micro")
          .orderBy("p_brand")
      },
      Some("""
        WITH pr AS (
          SELECT p_partkey, p_brand,
                 CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS cents
          FROM part),
        dens AS (
          SELECT p_brand,
                 count(*) OVER (PARTITION BY p_brand ORDER BY cents
                   RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) - 1
                   AS n_within_100_below
          FROM pr)
        SELECT p_brand, count(*) AS n_parts,
               CAST(max(n_within_100_below) AS BIGINT) AS max_density,
               CAST(sum(n_within_100_below) AS BIGINT) AS sum_density,
               CAST(sum(n_within_100_below) AS BIGINT) * 1000000 // count(*)
                 AS mean_density_micro
        FROM dens GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q369
    QDef("q369_argminmax",
      (s, dir) => {
        t(s, dir, "customer")
          .selectExpr("c_mktsegment", "c_custkey",
            // collision-free composite: custkey < 1e5 at every test SF
            "(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) + 100000) * 100000 + c_custkey AS kmax")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"),
            expr("max_by(c_custkey, kmax)").as("richest_custkey"),
            expr("min_by(c_custkey, kmax)").as("poorest_custkey"),
            expr("(max(kmax) DIV 100000) - 100000").as("max_cents"),
            expr("(min(kmax) DIV 100000) - 100000").as("min_cents"))
          .orderBy("c_mktsegment")
      },
      Some("""
        WITH c AS (
          SELECT c_mktsegment, c_custkey,
                 (CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) + 100000)
                   * 100000 + c_custkey AS kmax
          FROM customer)
        SELECT c_mktsegment, count(*) AS n,
               max_by(c_custkey, kmax) AS richest_custkey,
               min_by(c_custkey, kmax) AS poorest_custkey,
               (max(kmax) // 100000) - 100000 AS max_cents,
               (min(kmax) // 100000) - 100000 AS min_cents
        FROM c GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q370
    QDef("q370_ordered_string_agg",
      (s, dir) => {
        val counts = t(s, dir, "customer")
          .groupBy("c_nationkey", "c_mktsegment")
          .agg(count(lit(1)).as("cnt"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("c_nationkey")
          .orderBy(col("cnt").desc, col("c_mktsegment"))
        counts
          .withColumn("rk", row_number().over(w))
          .where(col("rk") <= 3)
          .groupBy("c_nationkey")
          .agg(expr(
            """array_join(transform(
                 sort_array(collect_list(struct(rk, c_mktsegment))),
                 x -> x.c_mktsegment), ',') AS top_segments"""),
            sum("cnt").cast("bigint").as("covered_customers"))
          .orderBy("c_nationkey")
      },
      Some("""
        WITH counts AS (
          SELECT c_nationkey, c_mktsegment, count(*) AS cnt
          FROM customer GROUP BY 1, 2),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY c_nationkey
                   ORDER BY cnt DESC, c_mktsegment) AS rk
          FROM counts)
        SELECT c_nationkey,
               string_agg(c_mktsegment, ',' ORDER BY rk) AS top_segments,
               CAST(sum(cnt) AS BIGINT) AS covered_customers
        FROM ranked WHERE rk <= 3
        GROUP BY 1 ORDER BY 1"""))
  )
}
