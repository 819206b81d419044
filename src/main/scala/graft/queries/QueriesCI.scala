package graft.queries

import graft.Tables.t
import graft.functions.TextFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 80 — higher-order functions, schema
  * evolution, incremental SCD2, positional text statistics:
  *
  *  - q343: higher-order array pipeline — per-doc token statistics via
  *    aggregate()/filter()/exists() folds with NO explode (the fold is
  *    sequential in both engines, so integer sums are exact); the
  *    functions-not-UDFs showcase: everything stays in codegen.
  *  - q344: unionByName schema evolution — an old epoch missing a
  *    column unioned with the new epoch (allowMissingColumns=true →
  *    NULL padding), per-segment row accounting across epochs; the
  *    "new scraper version added a field" shape.
  *  - q345: incremental SCD2 merge — base snapshot + two change
  *    batches folded into validity intervals (union → lead() close);
  *    the maintenance step that keeps q05/q115's history table fresh.
  *  - q346: positional token profile — posexplode word positions into
  *    relative deciles: average token length and numeric-token share by
  *    document position (do listings front-load numbers/amenities).
  *
  * Reference analog: payload stats without row explosion, scraper
  * schema drift between rounds, listing-state history maintenance
  * (`workunits.py:124`), structured-description position analysis.
  */
object QueriesCI extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q343
    QDef("q343_array_functional",
      (s, dir) => {
        t(s, dir, "documents")
          .withColumn("w", TextFunctions.words(col("text")))
          .selectExpr("lang",
            "size(w) AS n_tokens",
            // fold: total characters across tokens (sequential, exact)
            "aggregate(w, 0L, (acc, x) -> acc + length(x)) AS n_chars_tok",
            "size(filter(w, x -> length(x) >= 7)) AS n_long",
            "CASE WHEN exists(w, x -> x RLIKE '^[0-9]+$') THEN 1 ELSE 0 END AS has_num")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_tokens").cast("bigint").as("tokens"),
            sum("n_chars_tok").cast("bigint").as("chars_tok"),
            sum("n_long").cast("bigint").as("long_tokens"),
            sum("has_num").cast("bigint").as("docs_with_number"))
          .selectExpr("lang", "n_docs", "tokens", "chars_tok", "long_tokens",
            "docs_with_number",
            "chars_tok * 1000000 DIV tokens AS mean_tok_len_micro")
          .orderBy("lang")
      },
      Some(s"""
        WITH d AS (
          SELECT lang, ${TextFunctions.wordsSql("text")} AS w FROM documents),
        per_doc AS (
          SELECT lang,
                 len(w) AS n_tokens,
                 CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT)
                   AS n_chars_tok,
                 len(list_filter(w, x -> length(x) >= 7)) AS n_long,
                 CASE WHEN len(list_filter(w,
                   x -> regexp_matches(x, '^[0-9]+$$'))) > 0
                   THEN 1 ELSE 0 END AS has_num
          FROM d)
        SELECT lang, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS tokens,
               CAST(sum(coalesce(n_chars_tok, 0)) AS BIGINT) AS chars_tok,
               CAST(sum(n_long) AS BIGINT) AS long_tokens,
               CAST(sum(has_num) AS BIGINT) AS docs_with_number,
               CAST(sum(coalesce(n_chars_tok, 0)) AS BIGINT) * 1000000
                 // CAST(sum(n_tokens) AS BIGINT) AS mean_tok_len_micro
        FROM per_doc GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q344
    QDef("q344_union_by_name",
      (s, dir) => {
        val cust = t(s, dir, "customer")
        // epoch 1: old scraper — no segment column collected
        val epoch1 = cust.where(col("c_custkey") % 2 === 0)
          .select(col("c_custkey"), col("c_nationkey"),
            lit(1L).as("epoch"))
        // epoch 2: new scraper added c_mktsegment
        val epoch2 = cust.where(col("c_custkey") % 2 === 1)
          .select(col("c_custkey"), col("c_nationkey"),
            col("c_mktsegment"), lit(2L).as("epoch"))
        epoch1.unionByName(epoch2, allowMissingColumns = true)
          .selectExpr("coalesce(c_mktsegment, '(missing)') AS segment", "epoch")
          .groupBy("segment")
          .agg(expr("CAST(sum(CASE WHEN epoch = 1 THEN 1 ELSE 0 END) AS BIGINT)")
            .as("n_epoch1"),
            expr("CAST(sum(CASE WHEN epoch = 2 THEN 1 ELSE 0 END) AS BIGINT)")
              .as("n_epoch2"))
          .orderBy("segment")
      },
      Some("""
        WITH unioned AS (
          SELECT c_custkey, CAST(NULL AS VARCHAR) AS c_mktsegment, 1 AS epoch
          FROM customer WHERE c_custkey % 2 = 0
          UNION ALL
          SELECT c_custkey, c_mktsegment, 2
          FROM customer WHERE c_custkey % 2 = 1)
        SELECT coalesce(c_mktsegment, '(missing)') AS segment,
               CAST(sum(CASE WHEN epoch = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_epoch1,
               CAST(sum(CASE WHEN epoch = 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_epoch2
        FROM unioned GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q345
    QDef("q345_scd2_merge",
      (s, dir) => {
        val base = t(s, dir, "customer").selectExpr("c_custkey AS k",
          "CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS val", "0L AS vf")
        val delta1 = base.where(col("k") % 5 === 0)
          .selectExpr("k", "val + 10000 AS val", "1000L AS vf")
        val delta2 = base.where(col("k") % 7 === 0)
          .selectExpr("k", "val + 20000 AS val", "2000L AS vf")
        val w = Window.partitionBy("k").orderBy("vf")
        base.union(delta1).union(delta2)
          .withColumn("vt", coalesce(lead("vf", 1).over(w),
            lit(Long.MaxValue)))
          .selectExpr("k % 10 AS bucket",
            "CASE WHEN vt < 9223372036854775807 THEN 1 ELSE 0 END AS closed",
            "val", "vf")
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_intervals"),
            expr("CAST(sum(closed) AS BIGINT)").as("n_closed"),
            expr("CAST(sum(vf) AS BIGINT)").as("sum_valid_from"),
            expr("CAST(sum(val) AS BIGINT)").as("sum_vals"))
          .orderBy("bucket")
      },
      Some("""
        WITH base AS (
          SELECT c_custkey AS k,
                 CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS val,
                 CAST(0 AS BIGINT) AS vf
          FROM customer),
        merged AS (
          SELECT k, val, vf FROM base
          UNION ALL
          SELECT k, val + 10000, 1000 FROM base WHERE k % 5 = 0
          UNION ALL
          SELECT k, val + 20000, 2000 FROM base WHERE k % 7 = 0),
        intervals AS (
          SELECT k, val, vf,
                 coalesce(lead(vf, 1) OVER (PARTITION BY k ORDER BY vf),
                   9223372036854775807) AS vt
          FROM merged)
        SELECT k % 10 AS bucket, count(*) AS n_intervals,
               CAST(sum(CASE WHEN vt < 9223372036854775807 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_closed,
               CAST(sum(vf) AS BIGINT) AS sum_valid_from,
               CAST(sum(val) AS BIGINT) AS sum_vals
        FROM intervals GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q346
    QDef("q346_positional_profile",
      (s, dir) => {
        t(s, dir, "documents")
          .withColumn("w", TextFunctions.words(col("text")))
          .where(size(col("w")) >= 10)
          .select(col("doc_id"), col("w"), size(col("w")).as("n"),
            posexplode(col("w")).as(Seq("pos", "word")))
          .selectExpr("CAST(pos AS BIGINT) * 10 DIV n AS decile",
            "CAST(length(word) AS BIGINT) AS wl",
            "CASE WHEN word RLIKE '^[0-9]+$' THEN 1 ELSE 0 END AS is_num")
          .groupBy("decile")
          .agg(count(lit(1)).as("n_tokens"),
            sum("wl").cast("bigint").as("sum_len"),
            expr("CAST(sum(is_num) AS BIGINT)").as("n_numeric"))
          .selectExpr("decile", "n_tokens",
            "sum_len * 1000000 DIV n_tokens AS mean_len_micro",
            "n_numeric * 10000 DIV n_tokens AS numeric_bp")
          .orderBy("decile")
      },
      Some(s"""
        WITH d AS (
          SELECT doc_id, ${TextFunctions.wordsSql("text")} AS w FROM documents),
        f AS (SELECT doc_id, w, len(w) AS n FROM d WHERE len(w) >= 10),
        toks AS (
          SELECT CAST(i AS BIGINT) * 10 // n AS decile,
                 CAST(length(w[i + 1]) AS BIGINT) AS wl,
                 CASE WHEN regexp_matches(w[i + 1], '^[0-9]+$$')
                   THEN 1 ELSE 0 END AS is_num
          FROM f, unnest(range(len(w))) AS r(i))
        SELECT decile, count(*) AS n_tokens,
               CAST(sum(wl) AS BIGINT) * 1000000 // count(*) AS mean_len_micro,
               CAST(sum(is_num) AS BIGINT) * 10000 // count(*) AS numeric_bp
        FROM toks GROUP BY 1 ORDER BY 1"""))
  )
}
