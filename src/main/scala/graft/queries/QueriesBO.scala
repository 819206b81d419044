package graft.queries

import graft.Tables.t
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 60 — conjunctive retrieval, market
  * concentration, repeat purchasing, join-fanout profiling:
  *
  *  - q266: conjunctive keyword retrieval — docs containing ALL query
  *    terms (exploded term match + HAVING distinct-terms = k), ranked
  *    by total term frequency, top-10. The boolean-retrieval primitive
  *    under q167's BM25 scorer (that ranks; this gates).
  *  - q267: supplier concentration (HHI) — per brand, the Herfindahl
  *    index over suppliers' lineitem-revenue shares, exact bp² DIV
  *    10000: 10000 = monopoly. The market-structure metric beside
  *    q104's Gini and q173's Pareto.
  *  - q268: repeat-purchase rate — (customer, part) pairs ordered ≥2
  *    times over distinct pairs, per brand (bp). The loyalty/reorder
  *    signal; one distinct + one agg.
  *  - q269: join-fanout profile — for each FK edge the engine joins on
  *    (orders→customer, lineitem→part, lineitem→supplier): min / max /
  *    mean-milli fan-out per key. THE statistic that decides broadcast
  *    vs shuffle vs salt (q251 checks balance of one key; this
  *    profiles every relation).
  *
  * Reference analog: keyword gate = listing-description filtered
  * search; HHI = host-market concentration per area; repeat rate =
  * re-booking share; fanout = responses-per-listing / listings-per-host
  * profiling before join planning.
  */
object QueriesBO extends QueryPack {
  import Q._

  private val Terms = Seq("spark", "table")

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q266
    QDef("q266_keyword_search",
      (s, dir) => {
        t(s, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
          .where(col("word").isin(Terms: _*))
          .groupBy("doc_id")
          .agg(countDistinct("word").as("n_terms"),
            count(lit(1)).as("tf"))
          .where(col("n_terms") === Terms.length.toLong)
          .orderBy(col("tf").desc, col("doc_id"))
          .limit(10)
          .select(col("doc_id"), col("tf"))
      },
      Some(s"""
        WITH w AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS word
          FROM documents),
        m AS (
          SELECT doc_id, count(DISTINCT word) AS n_terms, count(*) AS tf
          FROM w WHERE word IN (${Terms.map("'" + _ + "'").mkString(", ")})
          GROUP BY 1)
        SELECT doc_id, tf FROM m WHERE n_terms = ${Terms.length}
        ORDER BY tf DESC, doc_id LIMIT 10""")),

    // --------------------------------------------------------------- q267
    QDef("q267_hhi",
      (s, dir) => {
        val rev = t(s, dir, "lineitem")
          .selectExpr("l_partkey", "l_suppkey",
            "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents")
          .join(t(s, dir, "part").select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand", "l_suppkey")
          .agg(sum("cents").cast("bigint").as("rev"))
        val tot = rev.groupBy("p_brand").agg(sum("rev").cast("bigint").as("tot"))
        rev.join(tot, "p_brand")
          .withColumn("share_bp", expr("rev * 10000 DIV tot"))
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n_suppliers"),
            expr("CAST(sum(share_bp * share_bp) AS BIGINT) DIV 10000").as("hhi"))
          .orderBy("p_brand")
      },
      Some("""
        WITH rev AS (
          SELECT p.p_brand, l.l_suppkey,
                 CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          GROUP BY 1, 2),
        tot AS (SELECT p_brand, CAST(sum(rev) AS BIGINT) AS tot FROM rev GROUP BY 1),
        sh AS (
          SELECT rev.p_brand, rev.rev * 10000 // tot.tot AS share_bp
          FROM rev JOIN tot ON rev.p_brand = tot.p_brand)
        SELECT p_brand, count(*) AS n_suppliers,
               CAST(sum(share_bp * share_bp) AS BIGINT) // 10000 AS hhi
        FROM sh GROUP BY 1 ORDER BY p_brand""")),

    // --------------------------------------------------------------- q268
    QDef("q268_repeat_purchase",
      (s, dir) => {
        val cp = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
          .join(t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey")),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy("o_custkey", "l_partkey")
          .agg(countDistinct("o_orderkey").as("n_orders"))
        cp.join(broadcast(t(s, dir, "part").select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n_pairs"),
            sum(when(col("n_orders") >= 2L, 1L).otherwise(0L))
              .cast("bigint").as("n_repeat"))
          .withColumn("repeat_bp", expr("n_repeat * 10000 DIV n_pairs"))
          .orderBy("p_brand")
      },
      Some("""
        WITH cp AS (
          SELECT o.o_custkey, l.l_partkey, count(DISTINCT o.o_orderkey) AS n_orders
          FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
          GROUP BY 1, 2)
        SELECT p.p_brand, count(*) AS n_pairs,
               CAST(sum(CASE WHEN cp.n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_repeat,
               CAST(sum(CASE WHEN cp.n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                 * 10000 // count(*) AS repeat_bp
        FROM cp JOIN part p ON cp.l_partkey = p.p_partkey
        GROUP BY 1 ORDER BY p_brand""")),

    // --------------------------------------------------------------- q269
    QDef("q269_fanout_profile",
      (s, dir) => {
        def profile(rel: String, df: org.apache.spark.sql.DataFrame, key: String) =
          df.groupBy(key).agg(count(lit(1)).as("c"))
            .agg(lit(rel).as("relation"),
              count(lit(1)).as("n_keys"),
              min("c").cast("bigint").as("min_fanout"),
              max("c").cast("bigint").as("max_fanout"),
              expr("CAST(sum(c) AS BIGINT) * 1000 DIV count(1)").as("mean_fanout_milli"))
        profile("orders_per_customer",
            t(s, dir, "orders").select(col("o_custkey")), "o_custkey")
          .unionByName(profile("lineitems_per_part",
            t(s, dir, "lineitem").select(col("l_partkey")), "l_partkey"))
          .unionByName(profile("lineitems_per_supplier",
            t(s, dir, "lineitem").select(col("l_suppkey")), "l_suppkey"))
          .orderBy("relation")
      },
      Some("""
        WITH a AS (
          SELECT 'orders_per_customer' AS relation, count(*) AS c
          FROM orders GROUP BY o_custkey),
        b AS (
          SELECT 'lineitems_per_part' AS relation, count(*) AS c
          FROM lineitem GROUP BY l_partkey),
        s AS (
          SELECT 'lineitems_per_supplier' AS relation, count(*) AS c
          FROM lineitem GROUP BY l_suppkey),
        u AS (SELECT * FROM a UNION ALL SELECT * FROM b UNION ALL SELECT * FROM s)
        SELECT relation, count(*) AS n_keys,
               CAST(min(c) AS BIGINT) AS min_fanout,
               CAST(max(c) AS BIGINT) AS max_fanout,
               CAST(sum(c) AS BIGINT) * 1000 // count(*) AS mean_fanout_milli
        FROM u GROUP BY 1 ORDER BY relation"""))
  )
}
