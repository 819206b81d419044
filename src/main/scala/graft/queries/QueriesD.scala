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
          .withColumn("cos6", round(VectorOps.cosineFromNorms("q_vec", "embedding", "q_nrm", "nrm"), 6))
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
                 round(${VectorOps.cosineFromNormsSql("q.q_vec", "e.embedding", "q.q_nrm", "e.nrm")}, 6) AS cos6
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
          .withColumn("cos6", round(VectorOps.cosineFromNorms("q_vec", "embedding", "q_nrm", "nrm"), 6))
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
                 round(${VectorOps.cosineFromNormsSql("q.q_vec", "e.embedding", "q.q_nrm", "e.nrm")}, 6) AS cos6
          FROM e JOIN q ON e.bucket = q.bucket
          WHERE e.vec_id <> q.q_id),
        ranked AS (
          SELECT q_id, vec_id, bucket, cos6,
                 row_number() OVER (PARTITION BY q_id ORDER BY cos6 DESC, vec_id) AS rn
          FROM scored)
        SELECT q_id, rn, vec_id, cos6, bucket FROM ranked
        WHERE rn <= $K
        ORDER BY q_id, rn""")),
  )
}
