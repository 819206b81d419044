package graft.queries

import graft.Tables.t
import graft.functions.VectorOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 67 — embedding-index trust and
  * feature diagnostics (on `embeddings`):
  *
  *  - q293: PQ asymmetric-distance (ADC) accuracy — grades q47's PQ
  *    index the way q43 grades ANN recall: per query, the ADC estimate
  *    Σ_m d²(q_sub, codebook[code_m]) vs the exact distance, mean
  *    absolute error (micro) and top-1 agreement (self-matches
  *    excluded). The scale shape is the real ADC serving path: a
  *    1024-row query×codebook distance table broadcast against the
  *    8-byte codes, never the raw vectors.
  *  - q294: per-dimension variance ranking (feature selection) — milli-
  *    quantized exact BIGINT moment sums per dimension, top-10 by
  *    n·S2−S1² (dimension-parallel; at 100 TB this is one shuffle of
  *    |dims| partial-sum rows).
  *  - q295: split-half centroid drift per label — even/odd vec_id
  *    halves as epoch stand-ins; cosine between the two half-centroids
  *    from exact milli-quantized integer sums (scale factors cancel),
  *    sqrt+divide as the only IEEE ops, floor-micro. cos ≪ 1 flags an
  *    unstable label cluster (q224's separation audit, turned inward).
  *  - q296: norm² outliers per label — exact-rank median and MAD of
  *    floor-micro ‖v‖², outliers at |x−med| > 3·MAD (q131/q158's
  *    robust-statistics kernel on the embedding table).
  *
  * Reference analog: listing-embedding index trust before switching
  * ANN serving to compressed codes; embedding-quality drift between
  * collection epochs.
  */
object QueriesBV extends QueryPack {
  import Q._

  private val M = 8
  private val SubDim = 8

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q293
    QDef("q293_pq_adc_accuracy",
      (s, dir) => {
        // repartition: single-file scan = ONE partition (see q198)
        val e = t(s, dir, "embeddings").select("vec_id", "embedding")
          .repartition(col("vec_id")).cache()
        e.count() // eager: codebook, query, code-assign, exact sides share it
        val cb = e.filter(col("vec_id") < 16)
          .select(col("vec_id").as("cb_id"), col("embedding").as("cb_vec"))
        val qs = e.filter(col("vec_id") >= 16 && col("vec_id") < 24)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        // 8-byte PQ codes, exactly q47's assignment rule
        val withD = (0 until M).foldLeft(e.crossJoin(broadcast(cb))) { (df, m) =>
          df.withColumn(s"d$m", VectorOps.sliceD2("embedding", "cb_vec", m * SubDim, SubDim))
        }
        val codes = withD.selectExpr("vec_id", "cb_id",
            s"stack($M, ${(0 until M).map(m => s"$m, d$m").mkString(", ")}) AS (m, d2)")
          .withColumn("d2u", floor(col("d2") * lit(1000000.0)).cast("bigint"))
          .groupBy("vec_id", "m")
          .agg(min(struct(col("d2u"), col("cb_id"))).as("best"))
          .select(col("vec_id"), col("m"), col("best.cb_id").as("code"))
        // query × codebook per-subspace distance table (|q|·M·16 rows)
        val qdWith = (0 until M).foldLeft(qs.crossJoin(broadcast(cb))) { (df, m) =>
          df.withColumn(s"d$m", VectorOps.sliceD2("q_vec", "cb_vec", m * SubDim, SubDim))
        }
        val qd = qdWith.selectExpr("q_id", "cb_id",
            s"stack($M, ${(0 until M).map(m => s"$m, d$m").mkString(", ")}) AS (m, d2)")
          .withColumn("qd2u", floor(col("d2") * lit(1000000.0)).cast("bigint"))
          .select("q_id", "m", "cb_id", "qd2u")
        val adc = codes.join(broadcast(qd),
            codes("m") === qd("m") && codes("code") === qd("cb_id"))
          .groupBy("q_id", "vec_id")
          .agg(sum("qd2u").cast("bigint").as("adc_u"))
        val exact = e.crossJoin(broadcast(qs))
          .withColumn("ex_u",
            floor(VectorOps.sliceD2("embedding", "q_vec", 0, M * SubDim)
              * lit(1000000.0)).cast("bigint"))
          .select("q_id", "vec_id", "ex_u")
        adc.join(exact, Seq("q_id", "vec_id"))
          .where(col("vec_id") =!= col("q_id"))
          .groupBy("q_id")
          .agg(count(lit(1)).as("n_vecs"),
            expr("CAST(sum(abs(adc_u - ex_u)) AS BIGINT) DIV count(1)")
              .as("mean_abs_err_u"),
            min(struct(col("adc_u"), col("vec_id"))).as("ba"),
            min(struct(col("ex_u"), col("vec_id"))).as("be"))
          .selectExpr("q_id", "n_vecs", "mean_abs_err_u",
            "ba.vec_id AS top1_adc", "be.vec_id AS top1_exact",
            "CAST(CASE WHEN ba.vec_id = be.vec_id THEN 1 ELSE 0 END AS BIGINT) AS top1_match")
          .orderBy("q_id")
      },
      Some {
        val dm = (0 until M).map { m =>
          s"SELECT vec_id, cb_id, $m AS m, " +
            s"${VectorOps.sliceD2Sql("embedding", "cb_vec", m * SubDim, SubDim)} AS d2 FROM pairs"
        }.mkString("\n          UNION ALL ")
        val qm = (0 until M).map { m =>
          s"SELECT q_id, cb_id, $m AS m, " +
            s"${VectorOps.sliceD2Sql("q_vec", "cb_vec", m * SubDim, SubDim)} AS d2 FROM qpairs"
        }.mkString("\n          UNION ALL ")
        s"""
        WITH e AS (SELECT vec_id, embedding FROM embeddings),
        cb AS (SELECT vec_id AS cb_id, embedding AS cb_vec FROM e WHERE vec_id < 16),
        qs AS (SELECT vec_id AS q_id, embedding AS q_vec FROM e
               WHERE vec_id >= 16 AND vec_id < 24),
        pairs AS (SELECT e.vec_id, cb.cb_id, e.embedding, cb.cb_vec FROM e CROSS JOIN cb),
        d AS ($dm),
        a AS (
          SELECT vec_id, cb_id, m,
                 row_number() OVER (PARTITION BY vec_id, m
                   ORDER BY CAST(floor(d2 * 1000000.0) AS BIGINT), cb_id) AS rn
          FROM d),
        codes AS (SELECT vec_id, m, cb_id AS code FROM a WHERE rn = 1),
        qpairs AS (SELECT qs.q_id, cb.cb_id, qs.q_vec, cb.cb_vec FROM qs CROSS JOIN cb),
        qdist AS ($qm),
        qd AS (SELECT q_id, m, cb_id, CAST(floor(d2 * 1000000.0) AS BIGINT) AS qd2u
               FROM qdist),
        adc AS (
          SELECT qd.q_id, c.vec_id, CAST(sum(qd.qd2u) AS BIGINT) AS adc_u
          FROM codes c JOIN qd ON c.m = qd.m AND c.code = qd.cb_id
          GROUP BY 1, 2),
        ex AS (
          SELECT qs.q_id, e.vec_id,
                 CAST(floor(${VectorOps.sliceD2Sql("e.embedding", "qs.q_vec", 0, 64)}
                   * 1000000.0) AS BIGINT) AS ex_u
          FROM e CROSS JOIN qs),
        j AS (
          SELECT adc.q_id, adc.vec_id, adc_u, ex_u
          FROM adc JOIN ex ON adc.q_id = ex.q_id AND adc.vec_id = ex.vec_id
          WHERE adc.vec_id <> adc.q_id),
        ranked AS (
          SELECT *,
                 row_number() OVER (PARTITION BY q_id ORDER BY adc_u, vec_id) AS ra,
                 row_number() OVER (PARTITION BY q_id ORDER BY ex_u, vec_id) AS re
          FROM j),
        tops AS (
          SELECT q_id, count(*) AS n_vecs,
                 CAST(sum(abs(adc_u - ex_u)) AS BIGINT) // count(*) AS mean_abs_err_u,
                 min(CASE WHEN ra = 1 THEN vec_id END) AS top1_adc,
                 min(CASE WHEN re = 1 THEN vec_id END) AS top1_exact
          FROM ranked GROUP BY 1)
        SELECT q_id, n_vecs, mean_abs_err_u, top1_adc, top1_exact,
               CAST(CASE WHEN top1_adc = top1_exact THEN 1 ELSE 0 END AS BIGINT)
                 AS top1_match
        FROM tops ORDER BY q_id"""
      }),

    // --------------------------------------------------------------- q294
    QDef("q294_dim_variance",
      (s, dir) => {
        t(s, dir, "embeddings")
          .select(posexplode(col("embedding")).as(Seq("dim", "x")))
          .selectExpr("dim", "CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT) AS xm")
          .groupBy("dim")
          .agg(count(lit(1)).as("n"),
            sum("xm").cast("bigint").as("s1"),
            sum(expr("xm * xm")).cast("bigint").as("s2"))
          .selectExpr("CAST(dim AS BIGINT) AS dim", "n",
            "(n * s2 - s1 * s1) DIV (n * n) AS var_milli2",
            """CASE WHEN s1 >= 0 THEN s1 DIV n ELSE -((-s1) DIV n) END
               AS mean_milli""")
          .withColumn("rk", row_number().over(Window.orderBy(
            col("var_milli2").desc, col("dim"))))
          .where(col("rk") <= 10)
          .selectExpr("CAST(rk AS BIGINT) AS rk", "dim", "n", "var_milli2",
            "mean_milli")
          .orderBy("rk")
      },
      Some("""
        WITH ex AS (
          SELECT i - 1 AS dim,
                 CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS xm
          FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
        sums AS (
          SELECT dim, count(*) AS n, CAST(sum(xm) AS BIGINT) AS s1,
                 CAST(sum(xm * xm) AS BIGINT) AS s2
          FROM ex GROUP BY 1),
        v AS (
          SELECT CAST(dim AS BIGINT) AS dim, n,
                 (n * s2 - s1 * s1) // (n * n) AS var_milli2,
                 CASE WHEN s1 >= 0 THEN s1 // n ELSE -((-s1) // n) END AS mean_milli
          FROM sums),
        ranked AS (
          SELECT *, CAST(row_number() OVER (ORDER BY var_milli2 DESC, dim)
            AS BIGINT) AS rk
          FROM v)
        SELECT rk, dim, n, var_milli2, mean_milli
        FROM ranked WHERE rk <= 10 ORDER BY rk""")),

    // --------------------------------------------------------------- q295
    QDef("q295_centroid_drift",
      (s, dir) => {
        val dims = t(s, dir, "embeddings")
          .select(col("label"), col("vec_id"),
            posexplode(col("embedding")).as(Seq("dim", "x")))
          .selectExpr("label", "dim", "vec_id % 2 AS half",
            "CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT) AS xm")
          .groupBy("label", "dim")
          .agg(sum(when(col("half") === 0, col("xm")).otherwise(0L))
            .cast("bigint").as("sa"),
            sum(when(col("half") === 1, col("xm")).otherwise(0L))
              .cast("bigint").as("sb"),
            sum(when(col("half") === 0, 1L).otherwise(0L)).cast("bigint").as("ca"),
            sum(when(col("half") === 1, 1L).otherwise(0L)).cast("bigint").as("cb"))
        dims.groupBy("label")
          .agg(max("ca").cast("bigint").as("n_a"),
            max("cb").cast("bigint").as("n_b"),
            sum(expr("sa * sb")).cast("bigint").as("num"),
            sum(expr("sa * sa")).cast("bigint").as("na2"),
            sum(expr("sb * sb")).cast("bigint").as("nb2"))
          .selectExpr("CAST(label AS BIGINT) AS label", "n_a", "n_b",
            """CASE WHEN na2 = 0 OR nb2 = 0 THEN NULL
               ELSE CAST(floor(CAST(num AS DOUBLE)
                 / sqrt(CAST(na2 AS DOUBLE) * CAST(nb2 AS DOUBLE)) * 1000000)
                 AS BIGINT) END AS cos_micro""")
          .orderBy("label")
      },
      Some("""
        WITH ex AS (
          SELECT label, vec_id % 2 AS half, i - 1 AS dim,
                 CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS xm
          FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
        dims AS (
          SELECT label, dim,
                 CAST(sum(CASE WHEN half = 0 THEN xm ELSE 0 END) AS BIGINT) AS sa,
                 CAST(sum(CASE WHEN half = 1 THEN xm ELSE 0 END) AS BIGINT) AS sb,
                 CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                 CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
          FROM ex GROUP BY 1, 2),
        agg AS (
          SELECT label, CAST(max(ca) AS BIGINT) AS n_a, CAST(max(cb) AS BIGINT) AS n_b,
                 CAST(sum(sa * sb) AS BIGINT) AS num,
                 CAST(sum(sa * sa) AS BIGINT) AS na2,
                 CAST(sum(sb * sb) AS BIGINT) AS nb2
          FROM dims GROUP BY 1)
        SELECT CAST(label AS BIGINT) AS label, n_a, n_b,
               CASE WHEN na2 = 0 OR nb2 = 0 THEN NULL
                 ELSE CAST(floor(CAST(num AS DOUBLE)
                   / sqrt(CAST(na2 AS DOUBLE) * CAST(nb2 AS DOUBLE)) * 1000000)
                   AS BIGINT) END AS cos_micro
        FROM agg ORDER BY label""")),

    // --------------------------------------------------------------- q296
    QDef("q296_norm_outliers",
      (s, dir) => {
        val x = t(s, dir, "embeddings")
          .select(col("label"), col("vec_id"),
            floor(VectorOps.dot("embedding", "embedding") * lit(1000000.0))
              .cast("bigint").as("n2u"))
        val wl = Window.partitionBy("label")
        val med = x
          .withColumn("r", row_number().over(wl.orderBy("n2u", "vec_id")))
          .withColumn("n", count(lit(1)).over(wl))
          .where(col("r") === expr("(n + 1) DIV 2"))
          .select(col("label"), col("n2u").as("med_u"))
        val dev = x.join(broadcast(med), "label")
          .withColumn("ad", abs(col("n2u") - col("med_u")))
        val mad = dev
          .withColumn("r", row_number().over(wl.orderBy("ad", "vec_id")))
          .withColumn("n", count(lit(1)).over(wl))
          .where(col("r") === expr("(n + 1) DIV 2"))
          .select(col("label"), col("ad").as("mad_u"))
        dev.join(broadcast(mad), "label")
          .groupBy("label")
          .agg(count(lit(1)).as("n_vecs"),
            max("med_u").cast("bigint").as("med_u"),
            max("mad_u").cast("bigint").as("mad_u"),
            sum(when(col("ad") > col("mad_u") * 3L, 1L).otherwise(0L))
              .cast("bigint").as("n_outliers"))
          .selectExpr("CAST(label AS BIGINT) AS label", "n_vecs", "med_u",
            "mad_u", "n_outliers")
          .orderBy("label")
      },
      Some {
        val dotSql = VectorOps.dotSql("embedding", "embedding")
        s"""
        WITH x AS (
          SELECT label, vec_id,
                 CAST(floor($dotSql * 1000000.0) AS BIGINT) AS n2u
          FROM embeddings),
        med AS (
          SELECT label, n2u AS med_u
          FROM (SELECT label, n2u,
                       row_number() OVER (PARTITION BY label ORDER BY n2u, vec_id) AS r,
                       count(*) OVER (PARTITION BY label) AS n
                FROM x)
          WHERE r = (n + 1) // 2),
        dev AS (
          SELECT x.label, x.vec_id, x.n2u, med.med_u, abs(x.n2u - med.med_u) AS ad
          FROM x JOIN med ON x.label = med.label),
        mad AS (
          SELECT label, ad AS mad_u
          FROM (SELECT label, ad,
                       row_number() OVER (PARTITION BY label ORDER BY ad, vec_id) AS r,
                       count(*) OVER (PARTITION BY label) AS n
                FROM dev)
          WHERE r = (n + 1) // 2)
        SELECT CAST(dev.label AS BIGINT) AS label, count(*) AS n_vecs,
               CAST(max(dev.med_u) AS BIGINT) AS med_u,
               CAST(max(mad.mad_u) AS BIGINT) AS mad_u,
               CAST(sum(CASE WHEN dev.ad > mad.mad_u * 3 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_outliers
        FROM dev JOIN mad ON dev.label = mad.label
        GROUP BY 1 ORDER BY label"""
      })
  )
}
