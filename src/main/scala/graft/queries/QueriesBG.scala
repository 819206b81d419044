package graft.queries

import graft.Tables.t
import graft.functions.VectorOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 52 — customer deciles, mutual-kNN
  * linkage, graph degree law, behavioral diversity:
  *
  *  - q234: customer decile profile — equal-frequency revenue deciles
  *    (ntile over a deterministic order), per decile the customer
  *    count, revenue share bp and per-customer order intensity
  *    (milli). The classic BI decile report on q202's binning idea,
  *    applied to customers.
  *  - q235: mutual nearest neighbors — within each LSH bucket (q41's
  *    partitioning) every vector's top-1 cosine neighbor; pairs that
  *    pick EACH OTHER are mutual ("best buddies"), the high-precision
  *    candidate set for embedding-space ER; per-label pair counts and
  *    label purity bp. Bucket-bounded quadratic, same complexity class
  *    as q34/q41 — never the global all-pairs.
  *  - q236: degree-distribution power-law audit — co-occurrence graph
  *    node degrees binned by integer log2 (`length(bin(x))-1`, the
  *    q181 trick, zero FP): per bin node count + min/max degree. The
  *    scale-free sanity check beside q176's assortativity.
  *  - q237: behavioral diversity histogram — per-user Gini-Simpson of
  *    the event-type mix in exact bp (10000 − Σc²·10000 ÷ n²), binned
  *    to deciles: how concentrated is each user's activity (q68 is
  *    per-language tokens; this is per-user behavior).
  *
  * Reference analog: decile profile = listing-revenue concentration
  * report; mutual kNN = reciprocal listing-similarity linkage; degree
  * law = co-visibility graph shape check; diversity = scraper-session
  * behavior mix (calendar-only vs mixed-surface users).
  */
object QueriesBG extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q234
    QDef("q234_decile_profile",
      (s, dir) => {
        val rev = t(s, dir, "orders")
          .selectExpr("o_custkey",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
          .groupBy("o_custkey")
          .agg(sum("cents").cast("bigint").as("rev"), count(lit(1)).as("n_orders"))
        // two-phase global ntile + broadcast total (was: single-task
        // ntile window + sum-over-() across all customers)
        val SR = graft.operators.ScaleRank
        SR.withTotals(
            SR.withGlobalNtile(rev,
              Seq(col("rev").desc, col("o_custkey")), 10, "decile"),
            Seq(sum("rev").cast("bigint").as("tot_rev")))
          .groupBy("decile")
          .agg(count(lit(1)).as("n_customers"),
            sum("rev").cast("bigint").as("rev_cents"),
            max("tot_rev").as("tot_rev"),
            sum("n_orders").cast("bigint").as("orders"))
          .selectExpr("decile", "n_customers", "rev_cents",
            "rev_cents * 10000 DIV tot_rev AS rev_share_bp",
            "orders * 1000 DIV n_customers AS orders_per_cust_milli")
          .orderBy("decile")
      },
      Some("""
        WITH rev AS (
          SELECT o_custkey,
                 CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev,
                 count(*) AS n_orders
          FROM orders GROUP BY 1),
        d AS (
          SELECT *, ntile(10) OVER (ORDER BY rev DESC, o_custkey) AS decile,
                 sum(rev) OVER () AS tot_rev
          FROM rev)
        SELECT decile, count(*) AS n_customers,
               CAST(sum(rev) AS BIGINT) AS rev_cents,
               CAST(CAST(sum(rev) AS BIGINT) * 10000 // max(tot_rev) AS BIGINT) AS rev_share_bp,
               CAST(CAST(sum(n_orders) AS BIGINT) * 1000 // count(*) AS BIGINT) AS orders_per_cust_milli
        FROM d GROUP BY 1 ORDER BY decile""")),

    // --------------------------------------------------------------- q235
    QDef("q235_mutual_knn",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"), col("label"),
            VectorOps.lshBucket("embedding", nPlanes = 8, dim = 64).as("bucket"),
            VectorOps.norm("embedding").as("nrm"))
          // single-file scan = ONE partition; repartition or downstream
          // join/cross-join compute runs on one task (see q198)
          .repartition(col("vec_id"))
          .cache()
        e.count() // eager: both self-join sides
        val a = e.select(col("bucket"), col("vec_id").as("ida"),
          col("embedding").as("va"), col("label").as("la"), col("nrm").as("na"))
        val b = e.select(col("bucket"), col("vec_id").as("idb"),
          col("embedding").as("vb"), col("label").as("lb"), col("nrm").as("nb"))
        val w = Window.partitionBy("ida").orderBy(col("cos6").desc, col("idb"))
        val top1 = a.join(b, "bucket")
          .where(col("ida") =!= col("idb"))
          .withColumn("cos6", VectorOps.cosine6Out("va", "vb", "na", "nb"))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("ida"), col("idb"), col("la"), col("lb"))
          .cache()
        top1.count()
        top1.as("x")
          .join(top1.select(col("ida").as("idb"), col("idb").as("ida")).as("y"),
            Seq("ida", "idb"))
          .where(col("ida") < col("idb"))
          .groupBy(col("la").as("label"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(when(col("la") === col("lb"), 1L).otherwise(0L))
              .cast("bigint").as("n_same_label"))
          .withColumn("purity_bp", expr("n_same_label * 10000 DIV n_pairs"))
          .orderBy("label")
      },
      Some(s"""
        WITH e AS (
          SELECT vec_id, embedding, label,
                 ${VectorOps.lshBucketSql("embedding", nPlanes = 8, dim = 64)} AS bucket,
                 ${VectorOps.normSql("embedding")} AS nrm
          FROM embeddings),
        scored AS (
          SELECT a.vec_id AS ida, b.vec_id AS idb, a.label AS la, b.label AS lb,
                 ${VectorOps.cosine6OutSql("a.embedding", "b.embedding", "a.nrm", "b.nrm")} AS cos6
          FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
        top1 AS (
          SELECT ida, idb, la, lb
          FROM (SELECT *, row_number() OVER (PARTITION BY ida
                  ORDER BY cos6 DESC, idb) AS rn FROM scored)
          WHERE rn = 1),
        mutual AS (
          SELECT x.ida, x.idb, x.la, x.lb
          FROM top1 x JOIN top1 y ON x.ida = y.idb AND x.idb = y.ida
          WHERE x.ida < x.idb)
        SELECT la AS label, count(*) AS n_pairs,
               CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT) AS n_same_label,
               CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT)
                 * 10000 // count(*) AS purity_bp
        FROM mutual GROUP BY 1 ORDER BY label""")),

    // --------------------------------------------------------------- q236
    QDef("q236_degree_histogram",
      (s, dir) => {
        // collect_set pair generation (the q464/q428 pattern): one
        // map-side-combinable shuffle + a pair rollup replaces
        // distinct + ok-keyed self-join (r8: 5.7 s at sf1, 6.2x oracle)
        val edges = t(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey"))
          .groupBy("ok")
          .agg(sort_array(collect_set(col("l_partkey"))).as("pks"))
          .select(col("pks"), posexplode(col("pks")).as(Seq("i", "a")))
          .select(col("a"), explode(slice(col("pks"), col("i") + lit(2),
            size(col("pks")))).as("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("w"))
          .where(col("w") >= 2)
        // both endpoint degrees from ONE pass (inline beats a union that
        // would re-derive the pair aggregate per branch — the q464 fix)
        val deg = edges.select(inline(array(
            struct(col("a").as("node")), struct(col("b").as("node")))))
          .groupBy("node").agg(count(lit(1)).as("deg"))
        deg.withColumn("log2_deg", length(bin(col("deg"))) - 1)
          .groupBy("log2_deg")
          .agg(count(lit(1)).as("n_nodes"),
            min("deg").cast("bigint").as("min_deg"),
            max("deg").cast("bigint").as("max_deg"))
          .orderBy("log2_deg")
      },
      Some("""
        WITH lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey FROM lineitem),
        e0 AS (
          SELECT a.l_partkey AS a, b.l_partkey AS b
          FROM lp a JOIN lp b ON a.ok = b.ok AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= 2),
        deg AS (
          SELECT node, count(*) AS deg
          FROM (SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0)
          GROUP BY 1)
        SELECT length(bin(deg)) - 1 AS log2_deg, count(*) AS n_nodes,
               CAST(min(deg) AS BIGINT) AS min_deg,
               CAST(max(deg) AS BIGINT) AS max_deg
        FROM deg GROUP BY 1 ORDER BY log2_deg""")),

    // --------------------------------------------------------------- q237
    QDef("q237_user_mix_diversity",
      (s, dir) => {
        val c = t(s, dir, "events")
          .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
        val gs = c.groupBy("user_id")
          .agg(sum("c").cast("bigint").as("n"),
            sum(col("c") * col("c")).cast("bigint").as("s2"))
          .selectExpr("user_id", "10000 - s2 * 10000 DIV (n * n) AS gs_bp")
        gs.selectExpr("gs_bp DIV 1000 AS bucket", "gs_bp")
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_users"),
            expr("CAST(sum(gs_bp) AS BIGINT) DIV count(1)").as("mean_gs_bp"))
          .orderBy("bucket")
      },
      Some("""
        WITH c AS (
          SELECT user_id, event_type, count(*) AS c
          FROM events GROUP BY 1, 2),
        gs AS (
          SELECT user_id,
                 10000 - CAST(sum(c * c) AS BIGINT) * 10000
                   // (CAST(sum(c) AS BIGINT) * CAST(sum(c) AS BIGINT)) AS gs_bp
          FROM c GROUP BY 1)
        SELECT gs_bp // 1000 AS bucket, count(*) AS n_users,
               CAST(sum(gs_bp) AS BIGINT) // count(*) AS mean_gs_bp
        FROM gs GROUP BY 1 ORDER BY bucket"""))
  )
}
