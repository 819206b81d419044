package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants for the QueriesEN pack (TPC-H shape completion:
  * Q4/Q10/Q11/Q13/Q15/Q18/Q19/Q2 emulation). */
class QueriesENSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q562 exists semi-join: per-priority counts are bounded by the " +
      "priority census and the semi-join never duplicates orders") {
    val out = SparkEntry.queries("q562_exists_lateship")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_orders")).toMap
    val census = graft.Tables.t(spark, dir, "orders")
      .groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { case (p, n) =>
      assert(n > 0 && n <= census(p), s"priority $p")
    }
  }

  test("q565 custdist: the distribution accounts for every customer, " +
      "including zero-order ones") {
    val out = SparkEntry.queries("q565_custdist")(spark, dir).collect()
    val nCust = graft.Tables.t(spark, dir, "customer").count()
    assert(out.map(_.getAs[Long]("custdist")).sum == nCust,
      "distribution partitions the customer set")
    val nOrders = graft.Tables.t(spark, dir, "orders")
      .where("o_orderpriority <> '1-URGENT'").count()
    assert(out.map(r => r.getAs[Long]("c_count") * r.getAs[Long]("custdist"))
      .sum == nOrders, "count-weighted sum recovers the order census")
  }

  test("q566 top supplier: every returned supplier has exactly the " +
      "maximum quarter revenue") {
    val out = SparkEntry.queries("q566_top_supplier")(spark, dir).collect()
    assert(out.nonEmpty)
    val revs = out.map(_.getAs[Long]("rev_cp")).toSet
    assert(revs.size == 1, "ties all carry the same (max) revenue")
  }

  test("q567 large orders: a direct recount of each reported order " +
      "exceeds the threshold and matches total_qty") {
    val out = SparkEntry.queries("q567_large_orders")(spark, dir).collect()
    assert(out.nonEmpty)
    val keys = out.map(_.getAs[Long]("o_orderkey"))
    val recount = graft.Tables.t(spark, dir, "lineitem")
      .where(col("l_orderkey").isin(keys: _*))
      .groupBy("l_orderkey")
      .agg(sum(expr("CAST(floor(l_quantity + 0.5) AS BIGINT)")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val k = r.getAs[Long]("o_orderkey")
      assert(recount(k) == r.getAs[Long]("total_qty") && recount(k) > 180)
    }
  }

  test("q569 min-cost supplier: each reported (part, supplier, cost) is " +
      "the true per-part minimum with suppkey tiebreak") {
    val out = SparkEntry.queries("q569_min_cost_supplier")(spark, dir)
      .collect()
    assert(out.nonEmpty)
    val parts = out.map(_.getAs[Long]("p_partkey"))
    val best = graft.Tables.t(spark, dir, "lineitem")
      .where(col("l_partkey").isin(parts: _*))
      .selectExpr("l_partkey", "l_suppkey",
        """(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * 1000)
           DIV CAST(floor(l_quantity + 0.5) AS BIGINT) AS c""")
      .groupBy("l_partkey", "l_suppkey").agg(min("c").as("c"))
      .collect().map(r => (r.getLong(0), (r.getLong(2), r.getLong(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val sup = graft.Tables.t(spark, dir, "supplier")
      .collect().map(r => r.getAs[Long]("s_suppkey") ->
        r.getAs[String]("s_name")).toMap
    out.foreach { r =>
      val (c, sk) = best(r.getAs[Long]("p_partkey"))
      assert(r.getAs[Long]("cost_mc") == c)
      assert(r.getAs[String]("s_name") == sup(sk), "arg-min supplier")
    }
  }
}
