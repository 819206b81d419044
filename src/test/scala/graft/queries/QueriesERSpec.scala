package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants for the QueriesER pack (Holt, KS, Benford, Gini). */
class QueriesERSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q582 Holt: the integer recurrence matches a driver replay") {
    val r = SparkEntry.queries("q582_holt_linear")(spark, dir).collect().head
    val ys = graft.Tables.t(spark, dir, "orders")
      .selectExpr(
        "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS day")
      .groupBy("day").count().orderBy("day")
      .collect().map(_.getLong(1))
    var l = 0L; var b = 0L; var tae = 0L; var first = true
    ys.foreach { y =>
      if (first) { l = y; first = false }
      else {
        val e = y - l - b
        tae += math.abs(e)
        val l2 = l + b + (if (e < 0) -((-e) / 4) else e / 4)
        val db = l2 - l - b
        b = b + (if (db < 0) -((-db) / 4) else db / 4)
        l = l2
      }
    }
    assert(r.getAs[Long]("n_days") == ys.length.toLong)
    assert(r.getAs[Long]("level") == l)
    assert(r.getAs[Long]("trend") == b)
    assert(r.getAs[Long]("forecast_30d") == l + 30 * b)
    assert(r.getAs[Long]("total_abs_err") == tae)
  }

  test("q583 KS: D matches a driver replay over the bucket census and " +
      "stays in [0, 1e6]") {
    val r = SparkEntry.queries("q583_ks_test")(spark, dir).collect().head
    val cells = graft.Tables.t(spark, dir, "orders")
      .selectExpr(
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DIV 10000 AS b",
        """CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           THEN 1L ELSE 0L END AS g""")
      .groupBy("b").agg(sum("g").as("c1"),
        (count(lit(1)) - sum("g")).as("c0"))
      .orderBy("b")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val n1 = cells.map(_._2).sum
    val n0 = cells.map(_._3).sum
    var cum1 = 0L; var cum0 = 0L
    var best = (Long.MinValue, Long.MaxValue)
    cells.foreach { case (b, c1, c0) =>
      cum1 += c1; cum0 += c0
      val dv = math.abs(cum1 * 1000000 / n1 - cum0 * 1000000 / n0)
      if (dv > best._1 || (dv == best._1 && b < best._2)) best = (dv, b)
    }
    assert(r.getAs[Long]("d_ppm") == best._1)
    assert(r.getAs[Long]("at_bucket") == best._2)
    assert(r.getAs[Long]("d_ppm") >= 0 && r.getAs[Long]("d_ppm") <= 1000000)
  }

  test("q584 Benford: digit census partitions the orders and the " +
      "expectation column is the exact Benford formula") {
    val out = SparkEntry.queries("q584_benford_audit")(spark, dir).collect()
    assert(out.map(_.getAs[Long]("d")).toSet == (1L to 9L).toSet)
    val n = graft.Tables.t(spark, dir, "orders")
      .where("o_totalprice > 0").count()
    assert(out.map(_.getAs[Long]("n")).sum == n)
    out.foreach { r =>
      val d = r.getAs[Long]("d")
      assert(r.getAs[Long]("benford_ppm") ==
        math.floor(math.log(1.0 + 1.0 / d) / math.log(10.0) * 1e6).toLong)
    }
  }

  test("q585 Gini: grouped coefficient is within [0, 1e6] and matches " +
      "a driver replay on the bucket census") {
    val r = SparkEntry.queries("q585_gini_grouped")(spark, dir).collect().head
    val buckets = graft.Tables.t(spark, dir, "orders")
      .selectExpr("o_custkey",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
      .groupBy("o_custkey").agg(sum("cents").as("rev"))
      .groupBy(expr("rev DIV 10000000").as("bk"))
      .agg(count(lit(1)).as("cnt"), sum("rev").as("mass"))
      .orderBy("bk")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val n = buckets.map(_._2).sum
    val m = buckets.map(_._3).map(BigInt(_)).sum
    var cumN = 0L
    var s2 = BigInt(0)
    buckets.foreach { case (_, cnt, mass) =>
      cumN += cnt
      s2 += BigInt(mass) * (2 * cumN - cnt + 1)
    }
    val gini = math.floor((s2.toDouble / (n.toDouble * m.toDouble) - 1.0
      - 1.0 / n) * 1e6).toLong
    assert(r.getAs[Long]("n_customers") == n)
    assert(r.getAs[Long]("gini_ppm") == gini)
    assert(gini >= 0 && gini <= 1000000)
  }
}
