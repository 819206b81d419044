package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 75 — paired tests, storage cost
  * models, distribution distances, distributed top-k:
  *
  *  - q323: Wilcoxon signed-rank — week-over-week daily revenue pairs
  *    (day d vs d+7) per day-of-week: |diff| ranked ascending with
  *    deterministic tiebreak, W⁺/W⁻ exact BIGINT; the PAIRED companion
  *    to q303's independent-samples Mann–Whitney.
  *  - q324: delta-encoding cost model — per-user inter-event gaps,
  *    bits = length(bin(gap)) (identical built-in in both engines, no
  *    IEEE log2), compression ratio vs raw 64-bit timestamps per user
  *    decile; the storage-engine economics behind timestamp columns.
  *  - q325: 1-D Wasserstein (Earth Mover's) distance of each source's
  *    doc-length distribution vs the global one — Σ width·|c_s·n_g −
  *    c_g·n_s| over the merged support, exact BIGINT numerator (the
  *    INTEGRATED companion to q166's sup-norm KS).
  *  - q326: distributed top-k equivalence proof — per-bucket
  *    (partkey mod 16) top-5 partial candidates → global top-5, with
  *    the ORACLE computing the direct global top-5: hash-match proves
  *    the two-phase plan loses nothing when buckets partition the key
  *    space (the map-side top-k pattern every 100 TB leaderboard uses).
  *
  * Reference analog: week-over-week harvest shifts, response-log
  * storage sizing, per-source listing-size drift, top listings at
  * fleet scale.
  */
object QueriesCD extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q323
    QDef("q323_wilcoxon",
      (s, dir) => {
        val daily = t(s, dir, "orders").selectExpr(
          "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS d",
          "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
          .groupBy("d").agg(sum("cents").cast("bigint").as("rev"))
        val nxt = daily.selectExpr("d - 7 AS d", "rev AS rev_next")
        val diffs = daily.join(nxt, "d")
          .selectExpr("(d + 4) % 7 AS dow", "d", "rev_next - rev AS diff")
          .where(col("diff") =!= 0)
        val w = Window.partitionBy("dow").orderBy(abs(col("diff")), col("d"))
        diffs
          .withColumn("rk", row_number().over(w).cast("long"))
          .groupBy("dow")
          .agg(count(lit(1)).as("n_pairs"),
            expr("CAST(sum(CASE WHEN diff > 0 THEN rk ELSE 0 END) AS BIGINT)")
              .as("w_plus"),
            expr("CAST(sum(CASE WHEN diff < 0 THEN rk ELSE 0 END) AS BIGINT)")
              .as("w_minus"))
          .selectExpr("dow", "n_pairs", "w_plus", "w_minus",
            """CAST(floor(CAST(w_plus - w_minus AS DOUBLE)
               / CAST(n_pairs * (n_pairs + 1) DIV 2 AS DOUBLE)
               * 1000000) AS BIGINT) AS effect_micro""")
          .orderBy("dow")
      },
      Some("""
        WITH daily AS (
          SELECT epoch_ms(o_orderdate) // 86400000 AS d,
                 CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS BIGINT) AS rev
          FROM orders GROUP BY 1),
        diffs AS (
          SELECT (a.d + 4) % 7 AS dow, a.d, b.rev - a.rev AS diff
          FROM daily a JOIN daily b ON b.d = a.d + 7
          WHERE b.rev <> a.rev),
        ranked AS (
          SELECT dow, diff,
                 CAST(row_number() OVER (PARTITION BY dow
                   ORDER BY abs(diff), d) AS BIGINT) AS rk
          FROM diffs),
        agg AS (
          SELECT dow, count(*) AS n_pairs,
                 CAST(sum(CASE WHEN diff > 0 THEN rk ELSE 0 END) AS BIGINT) AS w_plus,
                 CAST(sum(CASE WHEN diff < 0 THEN rk ELSE 0 END) AS BIGINT) AS w_minus
          FROM ranked GROUP BY 1)
        SELECT dow, n_pairs, w_plus, w_minus,
               CAST(floor(CAST(w_plus - w_minus AS DOUBLE)
                 / CAST(n_pairs * (n_pairs + 1) // 2 AS DOUBLE)
                 * 1000000) AS BIGINT) AS effect_micro
        FROM agg ORDER BY dow""")),

    // --------------------------------------------------------------- q324
    QDef("q324_delta_bits",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
        t(s, dir, "events")
          .selectExpr("user_id", "event_id", s"($tsMs) AS ts_ms")
          .withColumn("gap", col("ts_ms") - lag("ts_ms", 1).over(w))
          .where(col("gap").isNotNull)
          .selectExpr("user_id % 10 AS bucket",
            "CAST(length(bin(gap)) AS BIGINT) AS bits")
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_gaps"),
            sum("bits").cast("bigint").as("sum_bits"))
          .selectExpr("bucket", "n_gaps", "sum_bits",
            "sum_bits * 1000000 DIV n_gaps AS avg_bits_micro",
            "sum_bits * 10000 DIV (64 * n_gaps) AS ratio_bp")
          .orderBy("bucket")
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events),
        g AS (
          SELECT user_id % 10 AS bucket,
                 ts_ms - lag(ts_ms, 1) OVER (PARTITION BY user_id
                   ORDER BY ts_ms, event_id) AS gap
          FROM e),
        b AS (
          SELECT bucket, CAST(length(bin(gap)) AS BIGINT) AS bits
          FROM g WHERE gap IS NOT NULL)
        SELECT bucket, count(*) AS n_gaps,
               CAST(sum(bits) AS BIGINT) AS sum_bits,
               CAST(sum(bits) AS BIGINT) * 1000000 // count(*) AS avg_bits_micro,
               CAST(sum(bits) AS BIGINT) * 10000 // (64 * count(*)) AS ratio_bp
        FROM b GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q325
    QDef("q325_wasserstein",
      (s, dir) => {
        val docs = t(s, dir, "documents").select(col("source"), col("n_chars"))
        val support = docs.select(col("n_chars").as("v")).distinct()
        val sources = docs.select("source").distinct()
        val grid = sources.crossJoin(support)
        val cs = docs.groupBy(col("source"), col("n_chars").as("v"))
          .agg(count(lit(1)).as("c_s"))
        val cg = docs.groupBy(col("n_chars").as("v"))
          .agg(count(lit(1)).as("c_g"))
        val ns = docs.groupBy("source").agg(count(lit(1)).as("n_s"))
        val ng = docs.agg(count(lit(1)).as("n_g"))
        val wS = Window.partitionBy("source").orderBy("v")
        grid
          .join(cs, Seq("source", "v"), "left")
          .join(broadcast(cg), Seq("v"), "left")
          .na.fill(0L, Seq("c_s", "c_g"))
          .withColumn("cum_s", sum("c_s").over(
            wS.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("cum_g", sum("c_g").over(
            wS.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("width", lead("v", 1).over(wS) - col("v"))
          .where(col("width").isNotNull)
          .join(broadcast(ns), "source").crossJoin(broadcast(ng))
          .groupBy("source")
          .agg(max("n_s").cast("bigint").as("n_s"),
            expr("CAST(sum(width * abs(cum_s * n_g - cum_g * n_s)) AS BIGINT)")
              .as("emd_num"),
            max("n_g").cast("bigint").as("n_g"))
          .selectExpr("source", "n_s", "emd_num",
            """CAST(floor(CAST(emd_num AS DOUBLE)
               / CAST(n_s AS DOUBLE) / CAST(n_g AS DOUBLE)
               * 1000) AS BIGINT) AS emd_milli""")
          .orderBy("source")
      },
      Some("""
        WITH docs AS (SELECT source, n_chars FROM documents),
        support AS (SELECT DISTINCT n_chars AS v FROM docs),
        srcs AS (SELECT DISTINCT source FROM docs),
        grid AS (SELECT source, v FROM srcs, support),
        cs AS (SELECT source, n_chars AS v, count(*) AS c_s
               FROM docs GROUP BY 1, 2),
        cg AS (SELECT n_chars AS v, count(*) AS c_g FROM docs GROUP BY 1),
        ns AS (SELECT source, count(*) AS n_s FROM docs GROUP BY 1),
        ng AS (SELECT count(*) AS n_g FROM docs),
        curve AS (
          SELECT g.source, g.v,
                 sum(coalesce(cs.c_s, 0)) OVER (PARTITION BY g.source
                   ORDER BY g.v ROWS UNBOUNDED PRECEDING) AS cum_s,
                 sum(coalesce(cg.c_g, 0)) OVER (PARTITION BY g.source
                   ORDER BY g.v ROWS UNBOUNDED PRECEDING) AS cum_g,
                 lead(g.v, 1) OVER (PARTITION BY g.source ORDER BY g.v) - g.v
                   AS width
          FROM grid g
          LEFT JOIN cs ON cs.source = g.source AND cs.v = g.v
          LEFT JOIN cg ON cg.v = g.v),
        agg AS (
          SELECT c.source, max(ns.n_s) AS n_s, max(ng.n_g) AS n_g,
                 CAST(sum(c.width * abs(c.cum_s * ng.n_g - c.cum_g * ns.n_s))
                   AS BIGINT) AS emd_num
          FROM curve c JOIN ns ON ns.source = c.source, ng
          WHERE c.width IS NOT NULL
          GROUP BY 1)
        SELECT source, CAST(n_s AS BIGINT) AS n_s, emd_num,
               CAST(floor(CAST(emd_num AS DOUBLE)
                 / CAST(n_s AS DOUBLE) / CAST(n_g AS DOUBLE)
                 * 1000) AS BIGINT) AS emd_milli
        FROM agg ORDER BY source""")),

    // --------------------------------------------------------------- q326
    QDef("q326_partition_topk",
      (s, dir) => {
        val rev = t(s, dir, "lineitem")
          .selectExpr("l_partkey",
            "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents")
          .groupBy("l_partkey").agg(sum("cents").cast("bigint").as("rev"))
        // phase 1: top-5 per disjoint key bucket (map-side candidates)
        val wB = Window.partitionBy(expr("l_partkey % 16"))
          .orderBy(col("rev").desc, col("l_partkey"))
        val candidates = rev.withColumn("rk_b", row_number().over(wB))
          .where(col("rk_b") <= 5)
        // phase 2: global top-5 from the ≤80 candidates via
        // orderBy+limit (TakeOrderedAndProject, no global window at all)
        val wG = Window.orderBy(col("rev").desc, col("l_partkey"))
        candidates
          .orderBy(col("rev").desc, col("l_partkey")).limit(5)
          .withColumn("rk", row_number().over(wG).cast("long"))
          .select("rk", "l_partkey", "rev")
          .orderBy("rk")
      },
      // oracle: the DIRECT global top-5 — hash-match proves the two-phase
      // bucket plan is lossless when buckets partition the key space
      Some("""
        WITH rev AS (
          SELECT l_partkey,
                 CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                   AS BIGINT) AS rev
          FROM lineitem GROUP BY 1)
        SELECT CAST(row_number() OVER (ORDER BY rev DESC, l_partkey) AS BIGINT)
                 AS rk,
               l_partkey, rev
        FROM rev
        ORDER BY rev DESC, l_partkey LIMIT 5"""))
  )
}
