package graft.queries

import graft.Tables.t
import graft.functions.VectorOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** §2D similarity search over `embeddings` (SURVEY.md §2D): brute-force
  * cosine top-k as the exactness baseline, hyperplane-LSH-bucketed ANN as
  * the 100 TB path (query side broadcast, corpus shuffled once by bucket).
  * Norms are projected once per side so every scored pair costs a single
  * dot product.
  */
object QueriesD extends QueryPack {

  private val K = 5
  private val NQ = 8 // query vectors: vec_id < NQ
  private val SeedMod = 100 // IVF coarse centroids: every SeedMod-th vector
  private val NProbe = 2 // IVF cells probed per query

  def defs: Seq[QDef] = Seq(
    // ---------------------------------------------------------------- q40
    // Brute-force cosine top-k per query vector: broadcast the (small)
    // query set against the corpus — one scan, no corpus shuffle.
    QDef("q40_knn_brute",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"), VectorOps.norm("embedding").as("nrm"))
          .cache()
        e.count() // eager: corpus + query sides share one job
        val q = e.filter(col("vec_id") < NQ)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"), col("nrm").as("q_nrm"))
        val w = Window.partitionBy("q_id").orderBy(col("cos6").desc, col("vec_id"))
        e.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("cos6", VectorOps.cosine6Out("q_vec", "embedding", "q_nrm", "nrm"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= K)
          .select("q_id", "rn", "vec_id", "cos6")
          .orderBy("q_id", "rn")
      },
      Some(s"""
        WITH e AS (SELECT vec_id, embedding, ${VectorOps.normSql("embedding")} AS nrm
                   FROM embeddings),
        q AS (SELECT vec_id AS q_id, embedding AS q_vec, nrm AS q_nrm FROM e WHERE vec_id < $NQ),
        scored AS (
          SELECT q.q_id, e.vec_id,
                 ${VectorOps.cosine6OutSql("q.q_vec", "e.embedding", "q.q_nrm", "e.nrm")} AS cos6
          FROM e CROSS JOIN q
          WHERE e.vec_id <> q.q_id),
        ranked AS (
          SELECT q_id, vec_id, cos6,
                 row_number() OVER (PARTITION BY q_id ORDER BY cos6 DESC, vec_id) AS rn
          FROM scored)
        SELECT q_id, rn, vec_id, cos6 FROM ranked
        WHERE rn <= $K
        ORDER BY q_id, rn""")),

    // ---------------------------------------------------------------- q41
    // LSH-bucketed ANN: corpus shuffled once by 8-hyperplane bucket;
    // each query probes only its own bucket (deterministic restriction —
    // the oracle checks the same bucket-scoped semantics).
    QDef("q41_knn_lsh",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"),
            VectorOps.lshBucket("embedding", nPlanes = 8, dim = 64).as("bucket"),
            VectorOps.norm("embedding").as("nrm"))
          .cache()
        e.count() // eager: corpus + query sides share one job
        val q = e.filter(col("vec_id") < NQ)
          .select(col("bucket"), col("vec_id").as("q_id"),
            col("embedding").as("q_vec"), col("nrm").as("q_nrm"))
        val w = Window.partitionBy("q_id").orderBy(col("cos6").desc, col("vec_id"))
        e.join(broadcast(q), "bucket")
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("cos6", VectorOps.cosine6Out("q_vec", "embedding", "q_nrm", "nrm"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= K)
          .select("q_id", "rn", "vec_id", "cos6", "bucket")
          .orderBy("q_id", "rn")
      },
      Some(s"""
        WITH e AS (
          SELECT vec_id, embedding,
                 ${VectorOps.lshBucketSql("embedding", nPlanes = 8, dim = 64)} AS bucket,
                 ${VectorOps.normSql("embedding")} AS nrm
          FROM embeddings),
        q AS (SELECT bucket, vec_id AS q_id, embedding AS q_vec, nrm AS q_nrm
              FROM e WHERE vec_id < $NQ),
        scored AS (
          SELECT q.q_id, e.vec_id, e.bucket,
                 ${VectorOps.cosine6OutSql("q.q_vec", "e.embedding", "q.q_nrm", "e.nrm")} AS cos6
          FROM e JOIN q ON e.bucket = q.bucket
          WHERE e.vec_id <> q.q_id),
        ranked AS (
          SELECT q_id, vec_id, bucket, cos6,
                 row_number() OVER (PARTITION BY q_id ORDER BY cos6 DESC, vec_id) AS rn
          FROM scored)
        SELECT q_id, rn, vec_id, cos6, bucket FROM ranked
        WHERE rn <= $K
        ORDER BY q_id, rn""")),

    // ---------------------------------------------------------------- q42
    // IVF-style ANN: deterministic coarse centroids (every SEEDMOD-th
    // vector), corpus assigned to its nearest centroid (one broadcast
    // pass), queries probe the NPROBE nearest cells and brute-force only
    // inside them. The 100 TB shape: corpus shuffled ONCE by cell id,
    // centroid table broadcast, probe fan-out linear in queries.
    QDef("q42_knn_ivf",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"), VectorOps.norm("embedding").as("nrm"))
          // repartition: single-file scan = ONE partition (see q198)
          .repartition(col("vec_id"))
          .cache()
        e.count() // eager: corpus, seed and query sides share one job
        val seeds = e.filter(col("vec_id") % SeedMod === 0)
          .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"), col("nrm").as("c_nrm"))
        val wAssign = Window.partitionBy("vec_id").orderBy(col("sim6").desc, col("c_id"))
        val assigned = e.crossJoin(broadcast(seeds))
          .withColumn("sim6", round(VectorOps.cosineFromNorms("embedding", "c_vec", "nrm", "c_nrm"), 6))
          .withColumn("arn", row_number().over(wAssign))
          .filter(col("arn") === 1)
          .select(col("vec_id"), col("embedding"), col("nrm"), col("c_id").as("cell"))
        val wProbe = Window.partitionBy("q_id").orderBy(col("sim6").desc, col("c_id"))
        val probes = e.filter(col("vec_id") < NQ)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"), col("nrm").as("q_nrm"))
          .crossJoin(broadcast(seeds))
          .withColumn("sim6", round(VectorOps.cosineFromNorms("q_vec", "c_vec", "q_nrm", "c_nrm"), 6))
          .withColumn("prn", row_number().over(wProbe))
          .filter(col("prn") <= NProbe)
          .select(col("q_id"), col("q_vec"), col("q_nrm"), col("c_id").as("cell"))
        val wTop = Window.partitionBy("q_id").orderBy(col("cos6").desc, col("vec_id"))
        assigned.join(broadcast(probes), "cell")
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("cos6", VectorOps.cosine6Out("q_vec", "embedding", "q_nrm", "nrm"))
          .withColumn("rn", row_number().over(wTop))
          .filter(col("rn") <= K)
          .select("q_id", "rn", "vec_id", "cos6", "cell")
          .orderBy("q_id", "rn")
      },
      Some(s"""
        WITH e AS (SELECT vec_id, embedding, ${VectorOps.normSql("embedding")} AS nrm
                   FROM embeddings),
        seeds AS (SELECT vec_id AS c_id, embedding AS c_vec, nrm AS c_nrm
                  FROM e WHERE vec_id % $SeedMod = 0),
        assigned AS (
          SELECT vec_id, embedding, nrm, cell FROM (
            SELECT e.vec_id, e.embedding, e.nrm, s.c_id AS cell,
                   row_number() OVER (PARTITION BY e.vec_id ORDER BY
                     round(${VectorOps.cosineFromNormsSql("e.embedding", "s.c_vec", "e.nrm", "s.c_nrm")}, 6) DESC,
                     s.c_id) AS arn
            FROM e CROSS JOIN seeds s)
          WHERE arn = 1),
        probes AS (
          SELECT q_id, q_vec, q_nrm, cell FROM (
            SELECT q.vec_id AS q_id, q.embedding AS q_vec, q.nrm AS q_nrm, s.c_id AS cell,
                   row_number() OVER (PARTITION BY q.vec_id ORDER BY
                     round(${VectorOps.cosineFromNormsSql("q.embedding", "s.c_vec", "q.nrm", "s.c_nrm")}, 6) DESC,
                     s.c_id) AS prn
            FROM e q CROSS JOIN seeds s
            WHERE q.vec_id < $NQ)
          WHERE prn <= $NProbe),
        scored AS (
          SELECT p.q_id, a.vec_id, a.cell,
                 ${VectorOps.cosine6OutSql("p.q_vec", "a.embedding", "p.q_nrm", "a.nrm")} AS cos6
          FROM assigned a JOIN probes p ON a.cell = p.cell
          WHERE a.vec_id <> p.q_id),
        ranked AS (
          SELECT q_id, vec_id, cell, cos6,
                 row_number() OVER (PARTITION BY q_id ORDER BY cos6 DESC, vec_id) AS rn
          FROM scored)
        SELECT q_id, rn, vec_id, cos6, cell FROM ranked
        WHERE rn <= $K
        ORDER BY q_id, rn""")),
  )
}
