package graft.queries

import graft.Tables.t
import graft.functions.VectorOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 79 — sequential testing, reshaping,
  * distribution alignment, density outliers:
  *
  *  - q339: Wald SPRT — sequential probability-ratio test per event-type
  *    stream (H1: p=0.6 vs H0: p=0.5 on value≥50) with per-observation
  *    LLRs and ±log(19) decision bounds PRE-QUANTIZED to integer micro
  *    (constants computed once in Scala, inlined verbatim into both
  *    engines): running BIGINT sum, first boundary crossing = decision.
  *    The "stop the A/B test early" machinery (fixed-horizon is q133).
  *  - q340: unpivot/melt roundtrip — Spark's Dataset.unpivot physical
  *    operator melting a pivoted wide table back to long; oracle is the
  *    direct long-form aggregate, proving pivot∘unpivot = identity
  *    (missing combinations surface as zeros on both paths).
  *  - q341: quantile normalization — every source's doc-length
  *    distribution mapped rank-to-rank onto the global distribution
  *    (integer rank interpolation, the bioinformatics/feature-prep
  *    standard); output distributions share global quantiles exactly.
  *  - q342: LOF-style density outliers over embeddings — avg distance
  *    to 5 NN for anchor points vs their neighbors' own 5-NN averages
  *    (two bounded stages, never all-pairs-of-all); distances from the
  *    6-dp-rounded cosine quantized to integer micro so every sum is
  *    exact BIGINT. Density-based anomaly detection beside q296's
  *    global-norm outliers.
  *
  * Reference analog: early-stopping quality experiments on scrape
  * batches, admin matrix reshaping, cross-AOI listing-size alignment,
  * embedding-space anomalous listings.
  */
object QueriesCH extends QueryPack {
  import Q._

  // SPRT constants: micro-quantized LLRs for Bernoulli 0.6-vs-0.5 and
  // Wald bounds A=log(19), B=-log(19) (α=β=0.05)
  private val llrS = math.round(math.log(0.6 / 0.5) * 1e6) // success
  private val llrF = math.round(math.log(0.4 / 0.5) * 1e6) // failure
  private val boundA = math.round(math.log(19.0) * 1e6)

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q339
    QDef("q339_sprt",
      (s, dir) => {
        val obs = t(s, dir, "events")
          .where(col("value").isNotNull)
          .selectExpr("event_type", "event_id", s"($tsMs) AS ms",
            s"CASE WHEN value >= 50 THEN ${llrS}L ELSE ${llrF}L END AS llr")
        val w = Window.partitionBy("event_type").orderBy("ms", "event_id")
        val walk = obs
          .withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("cum", sum("llr").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val fin = walk.groupBy("event_type")
          .agg(max("rn").as("n_obs"),
            max(struct(col("rn"), col("cum"))).getField("cum").as("final_cum"))
        val wCross = Window.partitionBy("event_type").orderBy("rn")
        val cross = walk
          .where(col("cum") >= boundA || col("cum") <= -boundA)
          .withColumn("ck", row_number().over(wCross))
          .where(col("ck") === 1)
          .select(col("event_type"), col("rn").as("cross_rn"),
            col("cum").as("cross_cum"))
        fin.join(cross, Seq("event_type"), "left")
          .selectExpr("event_type", "n_obs",
            "coalesce(cross_rn, n_obs) AS decision_rn",
            s"""CASE WHEN cross_cum >= $boundA THEN 'h1'
                WHEN cross_cum <= ${-boundA} THEN 'h0'
                ELSE 'none' END AS decision""",
            "coalesce(cross_cum, final_cum) AS llr_micro")
          .orderBy("event_type")
      },
      Some(s"""
        WITH obs AS (
          SELECT event_type, event_id, epoch_ms(ts) AS ms,
                 CASE WHEN value >= 50 THEN $llrS ELSE $llrF END AS llr
          FROM events WHERE value IS NOT NULL),
        walk AS (
          SELECT event_type,
                 CAST(row_number() OVER w AS BIGINT) AS rn,
                 CAST(sum(llr) OVER (PARTITION BY event_type
                   ORDER BY ms, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS cum
          FROM obs WINDOW w AS (PARTITION BY event_type ORDER BY ms, event_id)),
        fin AS (
          SELECT event_type, max(rn) AS n_obs,
                 CAST(max_by(cum, rn) AS BIGINT) AS final_cum
          FROM walk GROUP BY 1),
        crossed AS (
          SELECT event_type, rn AS cross_rn, cum AS cross_cum FROM (
            SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY rn)
              AS ck
            FROM walk WHERE cum >= $boundA OR cum <= ${-boundA})
          WHERE ck = 1)
        SELECT event_type, n_obs,
               coalesce(cross_rn, n_obs) AS decision_rn,
               CASE WHEN cross_cum >= $boundA THEN 'h1'
                    WHEN cross_cum <= ${-boundA} THEN 'h0'
                    ELSE 'none' END AS decision,
               coalesce(cross_cum, final_cum) AS llr_micro
        FROM fin LEFT JOIN crossed USING (event_type)
        ORDER BY event_type""")),

    // --------------------------------------------------------------- q340
    QDef("q340_unpivot",
      (s, dir) => {
        val wide = t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .pivot("l_linestatus", Seq("F", "O"))
          .agg(count(lit(1)))
        wide.unpivot(
            Array(col("l_returnflag")), Array(col("F"), col("O")),
            "l_linestatus", "cnt")
          .selectExpr("l_returnflag", "l_linestatus",
            "coalesce(cnt, 0) AS cnt")
          .orderBy("l_returnflag", "l_linestatus")
      },
      // oracle: direct long-form counts over the full (flag × status) grid
      Some("""
        WITH grid AS (
          SELECT rf.l_returnflag, st.l_linestatus
          FROM (SELECT DISTINCT l_returnflag FROM lineitem) rf,
               (VALUES ('F'), ('O')) st(l_linestatus)),
        cnts AS (
          SELECT l_returnflag, l_linestatus, count(*) AS c
          FROM lineitem GROUP BY 1, 2)
        SELECT g.l_returnflag, g.l_linestatus,
               coalesce(c.c, 0) AS cnt
        FROM grid g LEFT JOIN cnts c
          ON g.l_returnflag = c.l_returnflag
         AND g.l_linestatus = c.l_linestatus
        ORDER BY 1, 2""")),

    // --------------------------------------------------------------- q341
    QDef("q341_quantile_norm",
      (s, dir) => {
        val docs = t(s, dir, "documents").select(col("source"),
          col("n_chars"), col("doc_id"))
        val wS = Window.partitionBy("source").orderBy("n_chars", "doc_id")
        val wG = Window.orderBy("n_chars", "doc_id")
        val globalRanked = graft.operators.ScaleRank.withGlobalRowNumber(
            docs, Seq(col("n_chars"), col("doc_id")), "grn")
          .select(col("grn"), col("n_chars").as("norm_v"))
        val nG = docs.agg(count(lit(1)).as("n_g"))
        docs
          .withColumn("rn", row_number().over(wS).cast("long"))
          .withColumn("n_s", count(lit(1)).over(Window.partitionBy("source")))
          .where(col("n_s") >= 2)
          .crossJoin(broadcast(nG))
          .withColumn("g", expr("(rn - 1) * (n_g - 1) DIV (n_s - 1) + 1"))
          .join(globalRanked, col("g") === col("grn"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("norm_v").cast("bigint").as("sum_norm"),
            min("norm_v").cast("bigint").as("min_norm"),
            max("norm_v").cast("bigint").as("max_norm"))
          .orderBy("source")
      },
      Some("""
        WITH docs AS (SELECT source, n_chars, doc_id FROM documents),
        ng AS (SELECT count(*) AS n_g FROM docs),
        per_src AS (
          SELECT source,
                 CAST(row_number() OVER (PARTITION BY source
                   ORDER BY n_chars, doc_id) AS BIGINT) AS rn,
                 count(*) OVER (PARTITION BY source) AS n_s
          FROM docs),
        mapped AS (
          SELECT source, (rn - 1) * (n_g - 1) // (n_s - 1) + 1 AS g
          FROM per_src, ng WHERE n_s >= 2),
        granked AS (
          SELECT CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT)
                   AS grn,
                 n_chars AS norm_v
          FROM docs)
        SELECT source, count(*) AS n_docs,
               CAST(sum(norm_v) AS BIGINT) AS sum_norm,
               CAST(min(norm_v) AS BIGINT) AS min_norm,
               CAST(max(norm_v) AS BIGINT) AS max_norm
        FROM mapped JOIN granked ON g = grn
        GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q342
    QDef("q342_lof_outliers",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"),
            VectorOps.norm("embedding").as("nrm"))
          // single-file parquet scan = ONE partition: without this every
          // broadcast cross-join dot below runs on one task (see q198)
          .repartition(col("vec_id"))
          .cache()
        e.count()
        val anchors = e.filter(col("vec_id") < 100)
          .select(col("vec_id").as("a_id"), col("embedding").as("a_vec"),
            col("nrm").as("a_nrm"))
        def top5(qs: org.apache.spark.sql.DataFrame, idc: String,
            vc: String, nc: String) = {
          val w = Window.partitionBy(idc).orderBy(col("dmicro"), col("vec_id"))
          e.crossJoin(broadcast(qs))
            .filter(col("vec_id") =!= col(idc))
            // slim BEFORE the window: the shuffle carries 3 longs per
            // pair instead of two 256-byte vectors (the r9 form moved
            // ~5 GB through the nbr-side window at sf1)
            .select(col(idc), col("vec_id"),
              floor((lit(1) - VectorOps.cosine6Out(vc, "embedding", nc, "nrm"))
                * 1000000 + 0.5).cast("bigint").as("dmicro"))
            .withColumn("rn", row_number().over(w))
            .filter(col("rn") <= 5)
        }
        val aTop = top5(anchors, "a_id", "a_vec", "a_nrm").cache()
        aTop.count()
        val aSd = aTop.groupBy("a_id")
          .agg(sum("dmicro").cast("bigint").as("sd_a"))
        val nbrIds = aTop.select(col("vec_id").as("n_id")).distinct()
        val nbrs = e.join(nbrIds, col("vec_id") === col("n_id"))
          .select(col("n_id"), col("embedding").as("n_vec"),
            col("nrm").as("n_nrm"))
        val nSd = top5(nbrs, "n_id", "n_vec", "n_nrm")
          .groupBy("n_id").agg(sum("dmicro").cast("bigint").as("sd_n"))
        aTop.select(col("a_id"), col("vec_id"))
          .join(nSd, col("vec_id") === col("n_id"))
          .groupBy("a_id").agg(sum("sd_n").cast("bigint").as("sd_nbrs"))
          .join(aSd, "a_id")
          // greatest(·,1): duplicate-heavy corpora (10 exact copies per
          // vector in the 10x probe) legitimately drive every neighbor
          // distance to 0 — the standard LOF reachability floor keeps
          // the ratio defined and is a no-op when any distance is > 0
          .selectExpr("a_id", "sd_a", "sd_nbrs",
            """CAST(floor(CAST(sd_a * 5 AS DOUBLE)
               / CAST(greatest(sd_nbrs, 1) AS DOUBLE)
               * 1000000) AS BIGINT) AS lof_micro""")
          .orderBy(col("lof_micro").desc, col("a_id"))
          .limit(15)
      },
      Some(s"""
        WITH e AS (SELECT vec_id, embedding,
                     ${VectorOps.normSql("embedding")} AS nrm FROM embeddings),
        anchors AS (SELECT vec_id AS a_id, embedding AS a_vec, nrm AS a_nrm
                    FROM e WHERE vec_id < 100),
        a_top AS (
          SELECT a_id, vec_id, dmicro FROM (
            SELECT a.a_id, e.vec_id,
                   CAST(floor((1 - ${VectorOps.cosine6OutSql("a.a_vec",
                     "e.embedding", "a.a_nrm", "e.nrm")}) * 1000000 + 0.5)
                     AS BIGINT) AS dmicro,
                   row_number() OVER (PARTITION BY a.a_id ORDER BY
                     CAST(floor((1 - ${VectorOps.cosine6OutSql("a.a_vec",
                       "e.embedding", "a.a_nrm", "e.nrm")}) * 1000000 + 0.5)
                       AS BIGINT), e.vec_id) AS rn
            FROM e CROSS JOIN anchors a WHERE e.vec_id <> a.a_id)
          WHERE rn <= 5),
        a_sd AS (SELECT a_id, CAST(sum(dmicro) AS BIGINT) AS sd_a
                 FROM a_top GROUP BY 1),
        nbr_ids AS (SELECT DISTINCT vec_id AS n_id FROM a_top),
        nbrs AS (SELECT n_id, embedding AS n_vec, nrm AS n_nrm
                 FROM e JOIN nbr_ids ON vec_id = n_id),
        n_top AS (
          SELECT n_id, dmicro FROM (
            SELECT q.n_id,
                   CAST(floor((1 - ${VectorOps.cosine6OutSql("q.n_vec",
                     "e.embedding", "q.n_nrm", "e.nrm")}) * 1000000 + 0.5)
                     AS BIGINT) AS dmicro,
                   row_number() OVER (PARTITION BY q.n_id ORDER BY
                     CAST(floor((1 - ${VectorOps.cosine6OutSql("q.n_vec",
                       "e.embedding", "q.n_nrm", "e.nrm")}) * 1000000 + 0.5)
                       AS BIGINT), e.vec_id) AS rn
            FROM e CROSS JOIN nbrs q WHERE e.vec_id <> q.n_id)
          WHERE rn <= 5),
        n_sd AS (SELECT n_id, CAST(sum(dmicro) AS BIGINT) AS sd_n
                 FROM n_top GROUP BY 1),
        agg AS (
          SELECT t.a_id, CAST(sum(s.sd_n) AS BIGINT) AS sd_nbrs
          FROM a_top t JOIN n_sd s ON t.vec_id = s.n_id
          GROUP BY 1)
        SELECT a.a_id, sd.sd_a, a.sd_nbrs,
               CAST(floor(CAST(sd.sd_a * 5 AS DOUBLE)
                 / CAST(greatest(a.sd_nbrs, 1) AS DOUBLE) * 1000000)
                 AS BIGINT) AS lof_micro
        FROM agg a JOIN a_sd sd USING (a_id)
        ORDER BY lof_micro DESC, a_id LIMIT 15"""))
  )
}
