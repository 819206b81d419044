package graft.queries

import graft.Tables.t
import graft.functions.VectorOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 10:
  *
  *  - q47: product quantization (PQ) — the standard ANN index compression:
  *    64-dim vectors split into M=8 subspaces of 8 dims, each subvector
  *    assigned to the nearest of 16 deterministic codebook entries → an
  *    8-byte code per vector. Output: per-subspace code usage balance and
  *    exact quantization-error totals. Complements q46 (scalar int8) and
  *    q42 (IVF): IVF-PQ is the 100 TB ANN layout.
  *  - q78: CDC changelog apply — ordered insert/update/delete events
  *    reduced to final state per key (argmax + tombstone semantics), the
  *    merge step of any incremental ingest. Reference analog: listing
  *    lifecycle upkeep (register/update/expire, workunits.py:124).
  */
object QueriesQ extends QueryPack {
  import Q._

  private val M = 8  // subspaces
  private val SubDim = 8

  def defs: Seq[QDef] = Seq(
    // ---------------------------------------------------------------- q47
    QDef("q47_pq_quantize",
      (s, dir) => {
        // repartition: single-file scan = ONE partition (see q198)
        val e = t(s, dir, "embeddings").select("vec_id", "embedding")
          .repartition(col("vec_id")).cache()
        e.count() // eager: corpus + codebook sides share one job
        val cb = e.filter(col("vec_id") < 16)
          .select(col("vec_id").as("cb_id"), col("embedding").as("cb_vec"))
        val withD = (0 until M).foldLeft(e.crossJoin(broadcast(cb))) { (df, m) =>
          df.withColumn(s"d$m", VectorOps.sliceD2("embedding", "cb_vec", m * SubDim, SubDim))
        }
        val stacked = withD.selectExpr("vec_id", "cb_id",
          s"stack($M, ${(0 until M).map(m => s"$m, d$m").mkString(", ")}) AS (m, d2)")
        // argmin per (vec, subspace) as a lexicographic struct-min: a hash
        // aggregate with map-side combine (the row_number-window form would
        // sort-shuffle all n·M·16 candidate rows). Distances quantize to
        // micro-units via floor BEFORE comparing/summing: floor on
        // bit-identical doubles is pure IEEE (round(x,6)'s half-way
        // handling differs between the engines at volume — the q100
        // lesson), and the integer error sums are exact.
        val assigned = stacked
          .withColumn("d2u", floor(col("d2") * lit(1000000.0)).cast("bigint"))
          .groupBy("vec_id", "m")
          .agg(min(struct(col("d2u"), col("cb_id"))).as("best"))
          .select(col("m"), col("best.cb_id").as("cb_id"), col("best.d2u").as("d2u"))
        val perCode = assigned.groupBy("m", "cb_id").agg(
          count(lit(1)).as("n"),
          sum(col("d2u")).cast("bigint").as("serr"))
        val wTop = Window.partitionBy("m").orderBy(col("n").desc, col("cb_id"))
        val tops = perCode.withColumn("trn", row_number().over(wTop)).filter(col("trn") === 1)
          .select(col("m"), col("cb_id").as("top_code"), col("n").as("top_n"))
        perCode.groupBy("m").agg(
            sum("n").cast("bigint").as("n_vecs"),
            count(lit(1)).as("n_codes_used"),
            sum(col("serr")).cast("bigint").as("sum_qerr_u"))
          .join(broadcast(tops), Seq("m"))
          .withColumn("top_share_bp", expr("top_n * 10000 DIV n_vecs"))
          .select("m", "n_vecs", "n_codes_used", "top_code", "top_share_bp", "sum_qerr_u")
          .orderBy("m")
      },
      Some {
        val dm = (0 until M).map { m =>
          s"SELECT vec_id, cb_id, $m AS m, " +
            s"${VectorOps.sliceD2Sql("embedding", "cb_vec", m * SubDim, SubDim)} AS d2 FROM pairs"
        }.mkString("\n          UNION ALL ")
        s"""
        WITH e AS (SELECT vec_id, embedding FROM embeddings),
        cb AS (SELECT vec_id AS cb_id, embedding AS cb_vec FROM e WHERE vec_id < 16),
        pairs AS (SELECT e.vec_id, cb.cb_id, e.embedding, cb.cb_vec FROM e CROSS JOIN cb),
        d AS ($dm),
        a AS (
          SELECT vec_id, cb_id, m,
                 CAST(floor(d2 * 1000000.0) AS BIGINT) AS d2u,
                 row_number() OVER (PARTITION BY vec_id, m
                   ORDER BY CAST(floor(d2 * 1000000.0) AS BIGINT), cb_id) AS rn
          FROM d),
        assigned AS (SELECT * FROM a WHERE rn = 1),
        per_code AS (
          SELECT m, cb_id, count(*) AS n,
                 CAST(sum(d2u) AS BIGINT) AS serr
          FROM assigned GROUP BY 1, 2),
        tops AS (
          SELECT m, cb_id AS top_code, n AS top_n,
                 row_number() OVER (PARTITION BY m ORDER BY n DESC, cb_id) AS trn
          FROM per_code),
        agg AS (
          SELECT m, CAST(sum(n) AS BIGINT) AS n_vecs, count(*) AS n_codes_used,
                 CAST(sum(serr) AS BIGINT) AS sum_qerr_u
          FROM per_code GROUP BY 1)
        SELECT agg.m, n_vecs, n_codes_used, top_code,
               top_n * 10000 // n_vecs AS top_share_bp, sum_qerr_u
        FROM agg JOIN tops ON agg.m = tops.m AND tops.trn = 1
        ORDER BY agg.m"""
      }),

    // ---------------------------------------------------------------- q78
    // events as a changelog: signup → insert, error → delete (tombstone),
    // anything else → update. Final state per key = newest op; deleted
    // keys vanish. Output: per key-bucket live/seen/tombstone accounting
    // plus the surviving values' exact sum.
    QDef("q78_cdc_apply",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts_ms").desc, col("event_id").desc)
        val last = t(s, dir, "events")
          .selectExpr("user_id", "event_id", s"$tsMs AS ts_ms",
            "CASE WHEN event_type = 'signup' THEN 'I' " +
              "WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op",
            "value")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
        last.groupBy(expr("user_id % 10").as("bucket")).agg(
            count(lit(1)).as("n_keys"),
            sum(when(col("op") =!= "D", 1L).otherwise(0L)).cast("bigint").as("n_alive"),
            sum(when(col("op") === "D", 1L).otherwise(0L)).cast("bigint").as("n_tombstoned"),
            dec38(sum(when(col("op") =!= "D", dec(col("value"))).otherwise(lit(null)))).as("live_value_sum"))
          .orderBy("bucket")
      },
      Some(s"""
        WITH log AS (
          SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
                 CASE WHEN event_type = 'signup' THEN 'I'
                      WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
                 value,
                 row_number() OVER (PARTITION BY user_id
                   ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
          FROM events),
        last AS (SELECT * FROM log WHERE rn = 1)
        SELECT user_id % 10 AS bucket, count(*) AS n_keys,
               CAST(count(CASE WHEN op <> 'D' THEN 1 END) AS BIGINT) AS n_alive,
               CAST(count(CASE WHEN op = 'D' THEN 1 END) AS BIGINT) AS n_tombstoned,
               CAST(sum(CASE WHEN op <> 'D' THEN CAST(value AS $decSql) END)
                 AS $dec38Sql) AS live_value_sum
        FROM last GROUP BY 1 ORDER BY 1"""))
  )
}
