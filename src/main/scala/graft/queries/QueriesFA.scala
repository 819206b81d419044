package graft.queries

import graft.Tables.t
import graft.dedup.Dedup
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 coverage additions, part 150 — harvest freshness, dedup
  * graph quality, discovery economics, and graph semi-supervision:
  *
  *  - q613: freshness-SLA audit: per-listing consecutive scan gaps
  *    (events as the scan log), per-nation share of listings whose
  *    worst gap meets a 7-day SLA — the observability side of the
  *    HarvestCycle cadence (reference: periodic re-scan scheduling,
  *    `tasks.py` / `operations/bookings.py` staleness selection).
  *  - q614: near-dup transitivity audit: the LSH-verified near-dup
  *    edge set (q31's machinery at jac ≥ 0.5), wedge census, and the
  *    share of closed wedges — measures how safe q35's
  *    cluster-collapse assumption (transitivity) actually is.
  *  - q615: discovery yield curve: first-conversion hour per listing, new
  *    vs cumulative coverage by hour — the diminishing-returns curve
  *    that prices another discovery sweep (reference: discovery.py
  *    grid sweeps).
  *  - q616: one-round semi-supervised label propagation on the
  *    co-purchase graph (customer–part bipartite projection): seeds =
  *    custkey%3==0 keep their true segment, others take the majority
  *    neighbor label (tie → lexicographic min); holdout accuracy per
  *    true segment. Per-part fan-out is constant in TPC-H scaling, so
  *    the projection grows linearly with the corpus.
  *
  * Scale shapes: q613/q615 are per-key windows then bounded-domain
  * censuses; q614 is bucket-scoped edges + two bounded joins; q616 is
  * one equi-join on partkey with constant fan-out.
  */
object QueriesFA extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q613
    QDef("q613_freshness_sla",
      (s, dir) => {
        val slaMs = 7L * 86400000L
        val w = Window.partitionBy("user_id").orderBy("ms", "event_id")
        val gaps = t(s, dir, "events")
          .selectExpr("user_id", s"$tsMs AS ms", "event_id")
          .withColumn("prev", lag("ms", 1).over(w))
          .where(col("prev").isNotNull)
          .groupBy("user_id")
          .agg(max(col("ms") - col("prev")).as("max_gap"),
            count(lit(1)).as("n_gaps"))
        gaps
          .join(t(s, dir, "customer")
            .selectExpr("c_custkey AS user_id", "c_nationkey"), Seq("user_id"))
          .groupBy("c_nationkey")
          .agg(count(lit(1)).cast("long").as("n_listings"),
            sum(when(col("max_gap") <= slaMs, 1L).otherwise(0L))
              .cast("long").as("n_compliant"),
            max("max_gap").cast("long").as("worst_gap_ms"))
          .selectExpr("c_nationkey", "n_listings", "n_compliant",
            "n_compliant * 10000 DIV n_listings AS compliant_bp",
            "worst_gap_ms DIV 3600000 AS worst_gap_hours")
          .orderBy("c_nationkey")
      },
      Some("""
        WITH g0 AS (
          SELECT user_id, epoch_ms(ts) AS ms,
                 lag(epoch_ms(ts)) OVER (PARTITION BY user_id
                   ORDER BY epoch_ms(ts), event_id) AS prev
          FROM events),
        gaps AS (
          SELECT user_id, max(ms - prev) AS max_gap
          FROM g0 WHERE prev IS NOT NULL GROUP BY 1)
        SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_listings,
               CAST(sum(CASE WHEN max_gap <= 604800000 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_compliant,
               CAST(sum(CASE WHEN max_gap <= 604800000 THEN 1 ELSE 0 END)
                 AS BIGINT) * 10000 // count(*) AS compliant_bp,
               CAST(max(max_gap) AS BIGINT) // 3600000 AS worst_gap_hours
        FROM gaps JOIN customer ON user_id = c_custkey
        GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q614
    QDef("q614_dup_transitivity",
      (s, dir) => {
        val docs = QueriesC.shingled(s, dir)
        val edges = Dedup.lshCandidates(docs.select("doc_id", "sig"),
            "doc_id", "sig", nHashes = 6, bandSize = 2)
          .join(docs.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
          .join(docs.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
          .withColumn("inter", Dedup.sortedIntersectCount("sh_a", "sh_b"))
          .withColumn("jac_bp", Dedup.jaccardBpFromInter(col("inter"), "sh_a", "sh_b"))
          .where(col("jac_bp") >= 5000)
          .select("id_a", "id_b")
        edges.cache(); edges.count() // eager: und twice + closure probe
        val und = edges.union(
          edges.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
        val wedges = und.as("e1").join(und.as("e2"),
            col("e1.id_b") === col("e2.id_a") && col("e1.id_a") < col("e2.id_b"))
          .select(col("e1.id_a").as("u"), col("e1.id_b").as("mid"),
            col("e2.id_b").as("v"))
        val closed = wedges.join(
            edges.select(col("id_a").as("u"), col("id_b").as("v"))
              .withColumn("hit", lit(1L)), Seq("u", "v"), "left")
        closed.agg(
            count(lit(1)).cast("long").as("n_wedges"),
            sum(coalesce(col("hit"), lit(0L))).cast("long").as("n_closed"))
          .crossJoin(broadcast(
            edges.agg(count(lit(1)).cast("long").as("n_edges"))))
          .selectExpr("n_edges", "n_wedges", "n_closed",
            """CASE WHEN n_wedges > 0 THEN n_closed * 10000 DIV n_wedges
               ELSE -1 END AS transitivity_bp""")
      },
      Some(s"""
        ${QueriesC.candidatePairsSql},
        edges AS (
          SELECT p.id_a, p.id_b
          FROM pairs p
          JOIN docs da ON da.doc_id = p.id_a
          JOIN docs db ON db.doc_id = p.id_b
          WHERE ${Dedup.jaccardBpSql("da.sh", "db.sh")} >= 5000),
        und AS (
          SELECT id_a, id_b FROM edges
          UNION ALL SELECT id_b, id_a FROM edges),
        wedges AS (
          SELECT e1.id_a AS u, e1.id_b AS mid, e2.id_b AS v
          FROM und e1 JOIN und e2
            ON e1.id_b = e2.id_a AND e1.id_a < e2.id_b),
        closed AS (
          SELECT w.u, w.v,
                 CASE WHEN e.id_a IS NOT NULL THEN 1 ELSE 0 END AS hit
          FROM wedges w LEFT JOIN edges e ON w.u = e.id_a AND w.v = e.id_b)
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_edges,
               CAST(count(*) AS BIGINT) AS n_wedges,
               CAST(sum(hit) AS BIGINT) AS n_closed,
               CASE WHEN count(*) > 0
                 THEN CAST(sum(hit) AS BIGINT) * 10000 // count(*)
                 ELSE -1 END AS transitivity_bp
        FROM closed""")),

    // --------------------------------------------------------------- q615
    QDef("q615_discovery_yield",
      (s, dir) => {
        val t0 = millisOf("2024-01-01 00:00:00")
        val first = t(s, dir, "events")
          .where(col("event_type") === "purchase")
          .selectExpr("user_id", s"$tsMs AS ms")
          .groupBy("user_id").agg(min("ms").as("first_ms"))
          .selectExpr("user_id", s"(first_ms - ${t0}L) DIV 3600000 AS d")
        val byWk = first.groupBy("d")
          .agg(count(lit(1)).cast("long").as("new_listings"))
        // bounded-domain window: the hour census has one row per
        // first-conversion hour bucket (DIV 3600000), never per event
        val w = Window.orderBy("d")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        byWk
          .withColumn("cum_listings", sum("new_listings").over(w).cast("long"))
          .crossJoin(broadcast(first.agg(count(lit(1)).cast("long").as("tot"))))
          .selectExpr("d", "new_listings", "cum_listings",
            "cum_listings * 10000 DIV tot AS cum_bp")
          .orderBy("d")
      },
      Some("""
        WITH f AS (
          SELECT user_id,
                 (min(epoch_ms(ts)) - epoch_ms(TIMESTAMP '2024-01-01 00:00:00'))
                   // 3600000 AS d
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        byd AS (SELECT d, CAST(count(*) AS BIGINT) AS new_listings
                FROM f GROUP BY 1)
        SELECT d, new_listings,
               CAST(sum(new_listings) OVER (ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS cum_listings,
               CAST(sum(new_listings) OVER (ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 * 10000 // (SELECT CAST(count(*) AS BIGINT) FROM f) AS cum_bp
        FROM byd ORDER BY d""")),

    // --------------------------------------------------------------- q616
    QDef("q616_label_prop",
      (s, dir) => {
        val cust = t(s, dir, "customer")
          .selectExpr("c_custkey", "c_mktsegment AS seg",
            "CAST(CASE WHEN c_custkey % 3 = 0 THEN 1 ELSE 0 END AS BIGINT) AS labeled")
        // Basket-array form (r10 verdict #5, the q140/q464 pattern): ONE
        // pk-keyed shuffle builds the per-part unlabeled/labeled customer
        // sets (collect_set dedups map-side, replacing the old
        // distinct(cust,pk) exchange AND the pk self-join); the
        // (unlabeled, labeled-neighbor) vote pairs are enumerated
        // MAP-SIDE from the two arrays. u ≠ nb is structural — labeled
        // (custkey%3=0) and unlabeled are disjoint. countDistinct(nb)
        // still dedups a pair that shares several parts; that pair
        // stream is the inherent cost of the query at any layout.
        val byPk = t(s, dir, "orders").select("o_orderkey", "o_custkey")
          .join(t(s, dir, "lineitem").select("l_orderkey", "l_partkey"),
            expr("o_orderkey = l_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_partkey").as("pk"))
          .agg(
            collect_set(when(col("labeled") === 0L,
              struct(col("c_custkey"), col("seg")))).as("us"),
            collect_set(when(col("labeled") === 1L,
              struct(col("c_custkey").as("nb"), col("seg").as("nb_seg"))))
              .as("ls"))
          .where(size(col("us")) > 0 && size(col("ls")) > 0)
        val votes = byPk
          .select(explode(col("us")).as("u"), col("ls"))
          .select(col("u.c_custkey").as("c_custkey"),
            col("u.seg").as("true_seg"), explode(col("ls")).as("l"))
          .groupBy(col("c_custkey"), col("true_seg"),
            col("l.nb_seg").as("nb_seg"))
          .agg(countDistinct(col("l.nb")).as("votes"))
        // argmax (votes desc, nb_seg asc) as min(struct(-votes, nb_seg))
        // — an aggregate instead of a row_number window pass
        val pred = votes.groupBy("c_custkey", "true_seg")
          .agg(min(struct((-col("votes")).as("nv"), col("nb_seg"))).as("m"))
          .selectExpr("c_custkey", "true_seg", "m.nb_seg AS pred_seg")
        pred.groupBy("true_seg").agg(
            count(lit(1)).cast("long").as("n_eval"),
            sum(when(col("pred_seg") === col("true_seg"), 1L).otherwise(0L))
              .cast("long").as("n_correct"))
          .selectExpr("true_seg", "n_eval", "n_correct",
            "n_correct * 10000 DIV n_eval AS acc_bp")
          .orderBy("true_seg")
      },
      Some("""
        WITH cust AS (
          SELECT c_custkey, c_mktsegment AS seg,
                 CASE WHEN c_custkey % 3 = 0 THEN 1 ELSE 0 END AS labeled
          FROM customer),
        cp AS (
          SELECT DISTINCT o_custkey AS c_custkey, l_partkey AS pk
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        votes AS (
          SELECT u.c_custkey, cu.seg AS true_seg, cl.seg AS nb_seg,
                 count(DISTINCT v.c_custkey) AS votes
          FROM cp u
          JOIN cust cu ON u.c_custkey = cu.c_custkey AND cu.labeled = 0
          JOIN cp v ON u.pk = v.pk AND u.c_custkey <> v.c_custkey
          JOIN cust cl ON v.c_custkey = cl.c_custkey AND cl.labeled = 1
          GROUP BY 1, 2, 3),
        pred AS (
          SELECT c_custkey, true_seg, nb_seg AS pred_seg
          FROM (SELECT *, row_number() OVER (PARTITION BY c_custkey
                  ORDER BY votes DESC, nb_seg) AS rn
                FROM votes)
          WHERE rn = 1)
        SELECT true_seg, CAST(count(*) AS BIGINT) AS n_eval,
               CAST(sum(CASE WHEN pred_seg = true_seg THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_correct,
               CAST(sum(CASE WHEN pred_seg = true_seg THEN 1 ELSE 0 END)
                 AS BIGINT) * 10000 // count(*) AS acc_bp
        FROM pred GROUP BY 1 ORDER BY true_seg"""))
  )
}
