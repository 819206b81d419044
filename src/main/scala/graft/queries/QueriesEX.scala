package graft.queries

import graft.Tables.t
import graft.functions.VectorOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-7 coverage additions, part 147 — the bookings harvest chain.
  *
  *  - q603: bookings-chain cost planner, the reference's
  *    `op_get_booking_detail_periodical` (operations/bookings.py:40-94)
  *    composed with the per-listing chain cost of
  *    `op_get_booking_detail_for_listing_id` (bookings.py:17-37, "Costs
  *    is 2 API calls per action": calendar refresh then booking detail).
  *    Eligible listings are AOI-gated (AOIShape.collect_bookings=True →
  *    nation flag here), stale when the last calendar harvest predates
  *    start-of-today − age_hours or never happened
  *    (calendar_updated_at IS NULL), ordered ASC NULLS FIRST on the
  *    last-harvest time (bookings.py:68) and capped at how_many=500.
  *    Output is the per-AOI API-call budget the batch will spend.
  *
  * Scale shape: one events scan → hash-agg per user (map-side partial);
  * nation is a broadcast dim; the how_many cap is a global top-K
  * (TakeOrderedAndProject — no global window, no single-task sort); the
  * final rollup runs on ≤500 rows. At 100 TB the only shuffles are the
  * per-user aggregate and the ≤500-row top-K merge.
  */
object QueriesEX extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q603
    QDef("q603_bookings_chain",
      (s, dir) => {
        val cutoffMs = millisOf("2024-01-31 01:00:00") // start-of-day − 23h
        // last calendar harvest per listing: purchase events are the
        // completed calendar refreshes (q12's universe convention)
        val lastCal = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(col("user_id").as("c_custkey"))
          .agg(max(expr(tsMs)).as("last_cal_ms"))
        // AOI gate: nations flagged for booking collection
        val aoi = t(s, dir, "nation")
          .filter(col("n_nationkey") % 3 === 0)
          .select(col("n_nationkey"), col("n_name"))
        val selected = t(s, dir, "customer")
          .join(broadcast(aoi), expr("c_nationkey = n_nationkey"))
          .join(lastCal, Seq("c_custkey"), "left")
          .filter(col("last_cal_ms").isNull || col("last_cal_ms") < cutoffMs)
          .orderBy(col("last_cal_ms").asc_nulls_first, col("c_custkey"))
          .limit(500)
        selected.groupBy("n_name")
          .agg(count(lit(1)).as("n_selected"),
            count(when(col("last_cal_ms").isNull, 1)).as("n_never"),
            (count(lit(1)) * 2).cast("bigint").as("api_calls"),
            min("last_cal_ms").cast("bigint").as("oldest_ms"))
          .orderBy("n_name")
      },
      Some(s"""
        WITH last_cal AS (
          SELECT user_id AS c_custkey, max(epoch_ms(ts)) AS last_cal_ms
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        aoi AS (
          SELECT n_nationkey, n_name FROM nation WHERE n_nationkey % 3 = 0),
        selected AS (
          SELECT a.n_name, l.last_cal_ms, c.c_custkey
          FROM customer c
          JOIN aoi a ON c.c_nationkey = a.n_nationkey
          LEFT JOIN last_cal l ON c.c_custkey = l.c_custkey
          WHERE l.last_cal_ms IS NULL
             OR l.last_cal_ms < epoch_ms(TIMESTAMP '2024-01-31 01:00:00')
          ORDER BY l.last_cal_ms ASC NULLS FIRST, c.c_custkey
          LIMIT 500)
        SELECT n_name, count(*) AS n_selected,
               count(CASE WHEN last_cal_ms IS NULL THEN 1 END) AS n_never,
               CAST(count(*) * 2 AS BIGINT) AS api_calls,
               CAST(min(last_cal_ms) AS BIGINT) AS oldest_ms
        FROM selected GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q604
    QDef("q604_semdedup",
      (s, dir) => {
        // cluster-level semantic dedup (SemDeDup-style): LSH-bucket
        // "clusters" → exact integer centroid per bucket → keeper =
        // argmin squared-distance-to-centroid → drop bucket-mates with
        // cos ≥ 0.92 to the keeper. Embedding components quantize to
        // BIGINT micro so centroid sums are exact and order-independent
        // (parallel Spark == sequential DuckDB); squared terms go
        // through DECIMAL(38,0)/HUGEINT (the 10×-probe overflow
        // lesson: (mval·n − Σ)² crosses int64 at ~100× bucket sizes).
        val dim = 64
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"),
            VectorOps.lshBucket("embedding", nPlanes = 6, dim = dim)
              .cast("bigint").as("bucket"),
            VectorOps.norm("embedding").as("nrm"),
            expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)" +
              " * 1000000.0 + 0.5) AS BIGINT))").as("mv"))
          // repartition: single-file scan = ONE partition (see q198)
          .repartition(col("vec_id"))
          .cache()
        e.count() // eager: read by centroid build, dist, and cos stages
        val ex = e.select(col("bucket"), col("vec_id"),
            posexplode(col("mv")))
          .withColumnRenamed("pos", "pos").withColumnRenamed("col", "mval")
        val cent = ex.groupBy("bucket", "pos")
          .agg(sum("mval").cast("bigint").as("sdim"),
            count(lit(1)).cast("bigint").as("n"))
        val dist = ex.join(cent, Seq("bucket", "pos"))
          .withColumn("d", (col("mval") * col("n") - col("sdim"))
            .cast(DecimalType(38, 0)))
          .groupBy("bucket", "vec_id")
          .agg(sum(col("d") * col("d")).as("dist2"))
        val keeper = dist.groupBy("bucket")
          .agg(min(struct(col("dist2"), col("vec_id"))).as("best"))
          .select(col("bucket"), col("best.vec_id").as("kid"))
        val kv = keeper.join(e.select(col("vec_id").as("kid"),
            col("embedding").as("kvec"), col("nrm").as("knrm")), Seq("kid"))
        e.join(broadcast(kv), Seq("bucket")) // ≤2^6 keeper rows
          .withColumn("cos6",
            VectorOps.cosine6Out("embedding", "kvec", "nrm", "knrm"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"), max("kid").as("keeper_id"),
            sum(when(col("vec_id") =!= col("kid") && col("cos6") >= 0.92, 1L)
              .otherwise(0L)).cast("bigint").as("n_dup"))
          .withColumn("n_kept", (col("n") - col("n_dup")).cast("bigint"))
          .orderBy("bucket")
      },
      Some(s"""
        WITH e AS (
          SELECT vec_id, embedding,
                 CAST(${VectorOps.lshBucketSql("embedding", nPlanes = 6, dim = 64)} AS BIGINT) AS bucket,
                 ${VectorOps.normSql("embedding")} AS nrm,
                 list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)
                   * 1000000.0 + 0.5) AS BIGINT)) AS mv
          FROM embeddings),
        ex AS (
          SELECT bucket, vec_id, generate_subscripts(mv, 1) AS pos,
                 unnest(mv) AS mval
          FROM e),
        cent AS (
          SELECT bucket, pos, CAST(sum(mval) AS BIGINT) AS sdim,
                 CAST(count(*) AS BIGINT) AS n
          FROM ex GROUP BY 1, 2),
        dist AS (
          SELECT ex.bucket, vec_id,
                 sum(CAST(mval * n - sdim AS HUGEINT)
                     * CAST(mval * n - sdim AS HUGEINT)) AS dist2
          FROM ex JOIN cent ON ex.bucket = cent.bucket AND ex.pos = cent.pos
          GROUP BY 1, 2),
        keeper AS (
          SELECT bucket, vec_id AS kid FROM (
            SELECT bucket, vec_id,
                   row_number() OVER (PARTITION BY bucket
                     ORDER BY dist2, vec_id) AS rk
            FROM dist) WHERE rk = 1)
        SELECT m.bucket AS bucket, CAST(count(*) AS BIGINT) AS n,
               CAST(max(k.kid) AS BIGINT) AS keeper_id,
               CAST(sum(CASE WHEN m.vec_id <> k.kid AND
                 ${VectorOps.cosine6OutSql("m.embedding", "kv.embedding", "m.nrm", "kv.nrm")} >= 0.92
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
               CAST(count(*) - sum(CASE WHEN m.vec_id <> k.kid AND
                 ${VectorOps.cosine6OutSql("m.embedding", "kv.embedding", "m.nrm", "kv.nrm")} >= 0.92
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        FROM e m
        JOIN keeper k ON m.bucket = k.bucket
        JOIN e kv ON kv.vec_id = k.kid
        GROUP BY 1 ORDER BY 1"""))
  )
}
