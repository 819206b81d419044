package graft.queries

import graft.Tables.t
import graft.dedup.Dedup
import graft.geo.Distance
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 15:
  *
  *  - q38: MinHash estimator accuracy — for every LSH candidate pair,
  *    the signature-agreement Jaccard estimate vs the exact shingle
  *    Jaccard, bucketed by exact-similarity decile (the dedup-side
  *    counterpart of q43's ANN recall gate: quantifies what the sketch
  *    trades away before you trust it at 100 TB).
  *  - q100: nearest-AOI assignment — each point assigned to its closest
  *    region center by haversine distance (PostGIS KNN-join analog:
  *    ST_Distance + ORDER BY LIMIT 1 per point), via broadcast cross
  *    join + lexicographic struct-min (no shuffle of the fact side).
  */
object QueriesV extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(
    // ---------------------------------------------------------------- q38
    QDef("q38_minhash_accuracy",
      (s, dir) => {
        val docs = QueriesC.shingled(s, dir)
        val pairs = Dedup.lshCandidates(docs.select("doc_id", "sig"),
          "doc_id", "sig", nHashes = 6, bandSize = 2)
        val a = docs.select(col("doc_id").as("id_a"),
          col("sh").as("sh_a"), col("sig").as("sig_a"))
        val b = docs.select(col("doc_id").as("id_b"),
          col("sh").as("sh_b"), col("sig").as("sig_b"))
        pairs.join(a, "id_a").join(b, "id_b")
          .withColumn("matches",
            expr("aggregate(zip_with(sig_a, sig_b, (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END), " +
              "0, (acc, v) -> acc + v)"))
          .withColumn("est_bp", expr("CAST(matches AS BIGINT) * 10000 DIV 6"))
          .withColumn("inter", Dedup.sortedIntersectCount("sh_a", "sh_b"))
          .withColumn("exact_bp", Dedup.jaccardBpFromInter(col("inter"), "sh_a", "sh_b"))
          .groupBy(expr("exact_bp DIV 1000").as("decile"))
          .agg(count(lit(1)).as("n_pairs"),
            expr("sum(abs(est_bp - exact_bp)) DIV count(1)").as("mean_abs_err_bp"))
          .orderBy("decile")
      },
      Some(s"""
        ${QueriesC.candidatePairsSql},
        joined AS (
          SELECT p.id_a, p.id_b,
                 list_reduce(list_prepend(0, list_transform(list_zip(sa.sig, sb.sig),
                   t -> CASE WHEN t[1] = t[2] THEN 1 ELSE 0 END)), (acc, v) -> acc + v)
                   AS matches,
                 ${Dedup.jaccardBpSql("da.sh", "db.sh")} AS exact_bp
          FROM pairs p
          JOIN sigs sa ON sa.doc_id = p.id_a
          JOIN sigs sb ON sb.doc_id = p.id_b
          JOIN docs da ON da.doc_id = p.id_a
          JOIN docs db ON db.doc_id = p.id_b),
        scored AS (
          SELECT exact_bp // 1000 AS decile,
                 CAST(matches AS BIGINT) * 10000 // 6 AS est_bp, exact_bp
          FROM joined)
        SELECT decile, count(*) AS n_pairs,
               CAST(sum(abs(est_bp - exact_bp)) AS BIGINT) // count(*) AS mean_abs_err_bp
        FROM scored GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q100
    QDef("q100_nearest_aoi",
      (s, dir) => {
        val centers = t(s, dir, "region")
          .select(col("r_regionkey"), col("r_name"),
            (col("r_regionkey") * 72 - 144).cast("double").as("cx"),
            lit(0.0).as("cy"))
        val pts = t(s, dir, "events")
          // r12: pre-partition by the downstream group key so the 5-center
          // haversine + the per-event argmin run at full width instead of
          // on the single-row-group scan task, AND the groupBy(event_id)
          // reuses this exchange (no second shuffle) — same exchange
          // count, 32× the parallelism on the trig.
          .repartition(col("event_id"))
          .selectExpr("event_id",
            "((user_id * 47 + event_id * 13) % 36000) / 100.0 - 180 + 0.005 AS lng",
            "((user_id * 31 + event_id * 7) % 17000) / 100.0 - 85 + 0.005 AS lat")
        // distances compare and sum as floor-quantized micro-km BIGINTs:
        // the raw doubles are bit-identical across engines (same formula
        // text), and floor(x*1e6) is pure IEEE arithmetic — unlike
        // round(x, 6), whose half-way handling differs between Spark's
        // shortest-repr BigDecimal path and DuckDB's raw-double round
        // (one row in 600k diverged at sf0.1).
        pts.crossJoin(broadcast(centers))
          .withColumn("d", Distance.haversineKm(col("lat"), col("lng"), col("cy"), col("cx")))
          .withColumn("dukm", floor(col("d") * lit(1000000.0)).cast("bigint"))
          .groupBy("event_id")
          .agg(min(struct(col("dukm"), col("r_regionkey"), col("r_name"))).as("best"))
          .select(col("best.r_name").as("r_name"), col("best.dukm").as("dukm"))
          .groupBy("r_name")
          .agg(count(lit(1)).as("n_points"),
            sum(col("dukm")).cast("bigint").as("sum_dist_ukm"))
          .orderBy("r_name")
      },
      Some(s"""
        WITH centers AS (
          SELECT r_regionkey, r_name, CAST(r_regionkey*72 - 144 AS DOUBLE) AS cx,
                 0.0 AS cy
          FROM region),
        pts AS (
          SELECT event_id,
                 ((user_id * 47 + event_id * 13) % 36000) / 100.0 - 180 + 0.005 AS lng,
                 ((user_id * 31 + event_id * 7) % 17000) / 100.0 - 85 + 0.005 AS lat
          FROM events),
        scored AS (
          SELECT p.event_id, c.r_regionkey, c.r_name,
                 CAST(floor((${Distance.haversineKmSql("p.lat", "p.lng", "c.cy", "c.cx")})
                   * 1000000.0) AS BIGINT) AS dukm
          FROM pts p CROSS JOIN centers c),
        best AS (
          SELECT event_id, r_name, dukm,
                 row_number() OVER (PARTITION BY event_id
                   ORDER BY dukm, r_regionkey) AS rn
          FROM scored)
        SELECT r_name, count(*) AS n_points,
               CAST(sum(dukm) AS BIGINT) AS sum_dist_ukm
        FROM best WHERE rn = 1
        GROUP BY 1 ORDER BY 1"""))
  )
}
