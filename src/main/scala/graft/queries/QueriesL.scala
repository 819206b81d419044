package graft.queries

import graft.Tables.t
import graft.dedup.Dedup
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 5:
  *
  *  - q11c: ONE-PASS histogram quantiles — the 100 TB approx-quantile
  *    path. q11b's exact rank quantiles need a per-group sort; this
  *    needs one mergeable histogram (fixed buckets, integer counts) and
  *    reads the quantile off the cumulative curve. Deterministic — unlike
  *    t-digest/GK sketches it is bit-identical on any partitioning AND
  *    oracle-matchable; at unit bucket width it returns exactly
  *    floor(percentile_disc) (spec-checked against a driver-side exact
  *    rank computation).
  *  - q95: near-dup graph degree distribution over the q31 LSH candidate
  *    edges — how connected is the duplicate graph (the practical gate
  *    before transitive clustering: a hub node means a degenerate band).
  */
object QueriesL extends QueryPack {

  def defs: Seq[QDef] = Seq(
    // --------------------------------------------------------------- q11c
    QDef("q11c_hist_quantiles",
      (s, dir) => {
        // floor() then cast: DuckDB CAST(double AS BIGINT) rounds while
        // Spark truncates — floor first makes both exact (SURVEY §4)
        val hist = t(s, dir, "events")
          .select(col("event_type"),
            expr("CAST(floor(value) AS BIGINT)").as("bucket"))
          .groupBy("event_type", "bucket")
          .agg(count(lit(1)).as("c"))
        val wCum = Window.partitionBy("event_type").orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = hist.withColumn("cum", sum(col("c")).over(wCum))
        val tot = hist.groupBy("event_type").agg(sum(col("c")).as("n"))
        def qAt(p: Int) = // ceil(n*p/100) rank, smallest bucket reaching it
          min(when(col("cum") >= expr(s"(n * $p + 99) DIV 100"), col("bucket")))
            .as(s"q$p")
        cum.join(broadcast(tot), "event_type")
          .groupBy("event_type")
          .agg(max(col("n")).cast("bigint").as("n"), qAt(50), qAt(95), qAt(99))
          .orderBy("event_type")
      },
      Some("""
        WITH hist AS (
          SELECT event_type, CAST(floor(value) AS BIGINT) AS bucket, count(*) AS c
          FROM events GROUP BY 1, 2),
        cum AS (
          SELECT event_type, bucket, c,
                 sum(c) OVER (PARTITION BY event_type ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM hist),
        tot AS (SELECT event_type, sum(c) AS n FROM hist GROUP BY 1)
        SELECT c.event_type AS event_type, CAST(max(n) AS BIGINT) AS n,
               min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN bucket END) AS q50,
               min(CASE WHEN cum >= (n * 95 + 99) // 100 THEN bucket END) AS q95,
               min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN bucket END) AS q99
        FROM cum c JOIN tot t ON c.event_type = t.event_type
        GROUP BY 1
        ORDER BY event_type""")),

    // ---------------------------------------------------------------- q95
    QDef("q95_dup_graph_degree",
      (s, dir) => {
        val docs = QueriesC.shingled(s, dir)
        val pairs = Dedup.lshCandidates(docs.select("doc_id", "sig"),
          "doc_id", "sig", nHashes = 6, bandSize = 2)
        val incident = pairs.select(col("id_a").as("id"))
          .union(pairs.select(col("id_b").as("id")))
        incident.groupBy("id").agg(count(lit(1)).as("degree"))
          .groupBy("degree")
          .agg(count(lit(1)).as("n_nodes"), min(col("id")).as("min_id"))
          .orderBy("degree")
      },
      Some {
        s"""
        WITH pairs0 AS (${QueriesC.candidatePairsSql} SELECT id_a, id_b FROM pairs),
        incident AS (SELECT id_a AS id FROM pairs0 UNION ALL SELECT id_b FROM pairs0),
        deg AS (SELECT id, count(*) AS degree FROM incident GROUP BY 1)
        SELECT degree, count(*) AS n_nodes, min(id) AS min_id
        FROM deg
        GROUP BY 1
        ORDER BY degree"""
      }),

    // ---------------------------------------------------------------- q64
    // URL query-parameter parsing (reference: convenience.py:4
    // query_params_from_url, feeding the pagination-offset math of
    // workunits.py:14): pagination URLs are CONSTRUCTED from events, then
    // params are parsed back from the string and aggregated — the same
    // construct→parse roundtrip proof shape as q09b. Row-local string
    // ops: full scan, one tiny shuffle on the parsed session key.
    QDef("q64_url_params",
      (s, dir) => {
        t(s, dir, "events")
          .withColumn("url", expr(
            "concat('https://api.example.com/v2/search?offset=', " +
              "(event_id % 50) * 20, '&limit=20&session=', user_id % 100)"))
          .withColumn("qs", expr("substring_index(url, '?', -1)"))
          .withColumn("m", expr("str_to_map(qs, '&', '=')"))
          .select(expr("CAST(m['session'] AS BIGINT)").as("session"),
            expr("CAST(m['offset'] AS BIGINT)").as("off"),
            expr("CAST(m['limit'] AS BIGINT)").as("lim"))
          .groupBy("session")
          .agg(count(lit(1)).as("n"),
            max(col("off")).as("max_offset"),
            countDistinct(col("off")).as("n_offsets"),
            max(col("lim")).as("lim"))
          .orderBy("session")
      },
      Some("""
        WITH u AS (
          SELECT 'https://api.example.com/v2/search?offset=' || (event_id % 50) * 20
                 || '&limit=20&session=' || (user_id % 100) AS url
          FROM events),
        parsed AS (
          SELECT CAST(split_part(list_filter(string_split(split_part(url, '?', 2), '&'),
                   x -> starts_with(x, 'session='))[1], '=', 2) AS BIGINT) AS session,
                 CAST(split_part(list_filter(string_split(split_part(url, '?', 2), '&'),
                   x -> starts_with(x, 'offset='))[1], '=', 2) AS BIGINT) AS off,
                 CAST(split_part(list_filter(string_split(split_part(url, '?', 2), '&'),
                   x -> starts_with(x, 'limit='))[1], '=', 2) AS BIGINT) AS lim
          FROM u)
        SELECT session, count(*) AS n, max(off) AS max_offset,
               CAST(count(DISTINCT off) AS BIGINT) AS n_offsets, max(lim) AS lim
        FROM parsed
        GROUP BY 1
        ORDER BY session"""))
  )
}
