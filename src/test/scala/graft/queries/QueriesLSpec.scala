package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Structural invariants of the QueriesL pack. */
class QueriesLSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q11c histogram quantiles: exactly floor of the discrete (ceil-rank) percentile") {
    val rows = SparkEntry.queries("q11c_hist_quantiles")(spark, dir).collect()
    assert(rows.nonEmpty)
    // discrete percentile_disc semantics: value at rank ceil(p*n); the
    // unit-bucket histogram quantile is its floor — EXACTLY
    val byType = graft.Tables.t(spark, dir, "events")
      .select("event_type", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    rows.foreach { r =>
      val vs = byType(r.getString(0))
      val n = vs.length
      assert(r.getAs[Long]("n") == n)
      def disc(p: Int): Long = math.floor(vs((n * p + 99) / 100 - 1)).toLong
      assert(r.getAs[Long]("q50") == disc(50))
      assert(r.getAs[Long]("q95") == disc(95))
      assert(r.getAs[Long]("q99") == disc(99))
      assert(r.getAs[Long]("q50") <= r.getAs[Long]("q95"))
      assert(r.getAs[Long]("q95") <= r.getAs[Long]("q99"))
    }
  }

  test("q95 degree distribution: node-count and edge-incidence conservation vs q31 pairs") {
    val rows = SparkEntry.queries("q95_dup_graph_degree")(spark, dir).collect()
    assert(rows.nonEmpty)
    val docs = QueriesC.shingled(spark, dir)
    val pairs = graft.dedup.Dedup.lshCandidates(docs.select("doc_id", "sig"),
      "doc_id", "sig", nHashes = 6, bandSize = 2)
    val nEdges = pairs.count()
    val nNodes = pairs.select(col("id_a")).union(pairs.select(col("id_b"))).distinct().count()
    assert(rows.map(_.getAs[Long]("n_nodes")).sum == nNodes)
    // sum(degree * n_nodes) counts each edge twice
    assert(rows.map(r => r.getAs[Long]("degree") * r.getAs[Long]("n_nodes")).sum == 2 * nEdges)
  }
}
