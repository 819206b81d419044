package graft.queries

import graft.Tables.t
import graft.functions.{PortableHash, TextFunctions}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 89 — prefix indexing, logarithmic
  * binning, experimentation variance reduction, pseudonymization:
  *
  *  - q379: prefix (autocomplete) index — 3-char word prefixes per
  *    language with vocabulary size, occurrence mass, and the top
  *    completion per prefix (deterministic argmax); the trie top level
  *    as a relation.
  *  - q380: log2 histogram — order values bucketed by bit length
  *    (length(bin(cents)) — both engines, no IEEE log), the
  *    power-of-two binning every latency dashboard uses.
  *  - q381: CUPED variance reduction — per-user pre/post value sums,
  *    θ from exact scaled covariance/variance, adjusted-metric variance
  *    vs raw variance in bp; the experimentation-platform adjustment
  *    (all sums exact BIGINT in dollar units to stay in 64-bit).
  *  - q382: pseudonymized-join proof — orders↔customer joined on
  *    md5-token(key) vs raw key: identical per-segment counts prove
  *    deterministic tokenization preserves the join graph (the
  *    GDPR-safe analytics contract; q335 is the deletion side).
  *
  * Reference analog: listing-title autocomplete, price magnitude
  * dashboards, scrape-policy experiments with pre-period adjustment,
  * user-id pseudonymization in shared datasets.
  */
object QueriesCR extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q379
    QDef("q379_prefix_index",
      (s, dir) => {
        val toks = t(s, dir, "documents")
          .withColumn("w", TextFunctions.words(col("text")))
          .select(col("lang"), explode(col("w")).as("word"))
          .where(length(col("word")) >= 3)
          .withColumn("prefix", expr("substring(word, 1, 3)"))
        val perWord = toks.groupBy("lang", "prefix", "word")
          .agg(count(lit(1)).as("occ"))
        val w = Window.partitionBy("lang", "prefix")
          .orderBy(col("occ").desc, col("word"))
        perWord
          .withColumn("rk", row_number().over(w))
          .groupBy("lang", "prefix")
          .agg(count(lit(1)).as("n_words"),
            sum("occ").cast("bigint").as("occurrences"),
            max(when(col("rk") === 1, col("word"))).as("top_completion"))
          .orderBy(col("occurrences").desc, col("lang"), col("prefix"))
          .limit(30)
      },
      Some(s"""
        WITH toks AS (
          SELECT lang, unnest(${TextFunctions.wordsSql("text")}) AS word
          FROM documents),
        pre AS (
          SELECT lang, substring(word, 1, 3) AS prefix, word
          FROM toks WHERE length(word) >= 3),
        per_word AS (
          SELECT lang, prefix, word, count(*) AS occ
          FROM pre GROUP BY 1, 2, 3),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY lang, prefix
                   ORDER BY occ DESC, word) AS rk
          FROM per_word)
        SELECT lang, prefix, count(*) AS n_words,
               CAST(sum(occ) AS BIGINT) AS occurrences,
               max(CASE WHEN rk = 1 THEN word END) AS top_completion
        FROM ranked GROUP BY 1, 2
        ORDER BY occurrences DESC, lang, prefix LIMIT 30""")),

    // --------------------------------------------------------------- q380
    QDef("q380_log2_histogram",
      (s, dir) => {
        t(s, dir, "orders")
          .selectExpr(
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
          .selectExpr("CAST(length(bin(cents)) AS BIGINT) AS bits")
          .groupBy("bits").agg(count(lit(1)).as("n"))
          .withColumn("share_bp",
            expr("n * 10000 DIV (sum(n) OVER ())").cast("long"))
          .selectExpr("bits", "n", "share_bp")
          .orderBy("bits")
      },
      Some("""
        WITH b AS (
          SELECT CAST(length(bin(
            CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))) AS BIGINT)
            AS bits
          FROM orders)
        SELECT bits, count(*) AS n,
               CAST(count(*) * 10000 // (SELECT count(*) FROM b) AS BIGINT)
                 AS share_bp
        FROM b GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q381
    QDef("q381_cuped",
      (s, dir) => {
        // period split: the observed mean day — deterministic from data
        val ev = t(s, dir, "events")
          .where(col("value").isNotNull)
          .selectExpr("user_id", s"($tsMs) DIV 86400000 AS d",
            "CAST(floor(value) AS BIGINT) AS v") // whole units keep 64-bit
        val split = ev.agg(expr("CAST(floor(avg(d)) AS BIGINT)").as("dmid"))
        val per = ev.crossJoin(broadcast(split))
          .selectExpr("user_id",
            "CASE WHEN d < dmid THEN v ELSE 0L END AS pre",
            "CASE WHEN d >= dmid THEN v ELSE 0L END AS post")
          .groupBy("user_id")
          .agg(sum("pre").cast("bigint").as("x"),
            sum("post").cast("bigint").as("y"))
        val stats = per.agg(count(lit(1)).as("n"),
          sum("x").cast("bigint").as("sx"), sum("y").cast("bigint").as("sy"),
          expr("CAST(sum(x * x) AS BIGINT)").as("sxx"),
          expr("CAST(sum(x * y) AS BIGINT)").as("sxy"),
          expr("CAST(sum(y * y) AS BIGINT)").as("syy"))
        stats.selectExpr("n",
          // θ = cov/var = (n·Σxy − ΣxΣy)/(n·Σx² − (Σx)²), micro-quantized
          """CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) * 1000000) AS BIGINT)
             AS theta_micro""",
          "n * syy - sy * sy AS var_raw_n2",
          // var(y−θx)·n² = n·Σ(y−θx)² − (Σ(y−θx))², expanded exactly with
          // θ in micro: scale everything by 1e12
          """CAST(floor((CAST(n * syy - sy * sy AS DOUBLE)
             - CAST(n * sxy - sx * sy AS DOUBLE)
               * CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE))) AS BIGINT)
             AS var_adj_n2""",
          """CAST(floor((CAST(n * sxy - sx * sy AS DOUBLE)
             * CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE)
             / CAST(n * syy - sy * sy AS DOUBLE)) * 10000) AS BIGINT)
             AS reduction_bp""")
      },
      Some("""
        WITH ev AS (
          SELECT user_id, epoch_ms(ts) // 86400000 AS d,
                 CAST(floor(value) AS BIGINT) AS v
          FROM events WHERE value IS NOT NULL),
        split AS (SELECT CAST(floor(avg(d)) AS BIGINT) AS dmid FROM ev),
        per AS (
          SELECT user_id,
                 CAST(sum(CASE WHEN d < dmid THEN v ELSE 0 END) AS BIGINT)
                   AS x,
                 CAST(sum(CASE WHEN d >= dmid THEN v ELSE 0 END) AS BIGINT)
                   AS y
          FROM ev, split GROUP BY 1),
        stats AS (
          SELECT count(*) AS n,
                 CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(x * y) AS BIGINT) AS sxy,
                 CAST(sum(y * y) AS BIGINT) AS syy
          FROM per)
        SELECT n,
               CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) * 1000000) AS BIGINT)
                 AS theta_micro,
               n * syy - sy * sy AS var_raw_n2,
               CAST(floor((CAST(n * syy - sy * sy AS DOUBLE)
                 - CAST(n * sxy - sx * sy AS DOUBLE)
                   * CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE))) AS BIGINT)
                 AS var_adj_n2,
               CAST(floor((CAST(n * sxy - sx * sy AS DOUBLE)
                 * CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE)
                 / CAST(n * syy - sy * sy AS DOUBLE)) * 10000) AS BIGINT)
                 AS reduction_bp
        FROM stats""")),

    // --------------------------------------------------------------- q382
    QDef("q382_pseudonym_join",
      (s, dir) => {
        val tokO = t(s, dir, "orders")
          .withColumn("tok", PortableHash.md5Long(col("o_custkey"), salt = "pseu~"))
        val tokC = t(s, dir, "customer")
          .withColumn("tok", PortableHash.md5Long(col("c_custkey"), salt = "pseu~"))
          .select(col("tok").as("ctok"), col("c_mktsegment"))
        tokO.join(tokC, col("tok") === col("ctok"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_tokenized"))
          .join(
            t(s, dir, "orders").join(t(s, dir, "customer"),
              col("o_custkey") === col("c_custkey"))
              .groupBy("c_mktsegment").agg(count(lit(1)).as("n_raw")),
            Seq("c_mktsegment"))
          .selectExpr("c_mktsegment", "n_tokenized", "n_raw",
            "CASE WHEN n_tokenized = n_raw THEN 1 ELSE 0 END AS joins_preserved")
          .orderBy("c_mktsegment")
      },
      Some {
        val hO = PortableHash.md5LongSql("CAST(o_custkey AS VARCHAR)", salt = "pseu~")
        val hC = PortableHash.md5LongSql("CAST(c_custkey AS VARCHAR)", salt = "pseu~")
        s"""
        WITH toko AS (SELECT $hO AS tok FROM orders),
        tokc AS (SELECT $hC AS tok, c_mktsegment FROM customer),
        tk AS (
          SELECT c_mktsegment, count(*) AS n_tokenized
          FROM toko JOIN tokc USING (tok) GROUP BY 1),
        raw AS (
          SELECT c_mktsegment, count(*) AS n_raw
          FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1)
        SELECT c_mktsegment, n_tokenized, n_raw,
               CASE WHEN n_tokenized = n_raw THEN 1 ELSE 0 END
                 AS joins_preserved
        FROM tk JOIN raw USING (c_mktsegment)
        ORDER BY c_mktsegment"""
      })
  )
}
