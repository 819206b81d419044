package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesDJ pack (conformal, sorted neighborhood,
  * KDE, dup payments). */
class QueriesDJSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q447 conformal: coverage near nominal, qhat from calibration") {
    val rows = SparkEntry.queries("q447_conformal")(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val cov = r.getAs[Long]("cover_bp")
      assert(cov >= 0 && cov <= 10000)
      // split-conformal guarantees coverage >= 90% in expectation; on a
      // tiny eval set the empirical value is noisy but should not crater
      assert(cov >= 5000, s"coverage implausibly low: $cov")
      assert(r.getAs[Long]("covered") <= r.getAs[Long]("n_eval"))
      assert(r.getAs[Long]("qhat") >= 0)
    }
  }

  test("q448 sorted neighborhood: compared ~ 3n, accounting consistent") {
    val rows = SparkEntry.queries("q448_sorted_neighborhood")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    val n = graft.Tables.t(spark, dir, "part").count()
    val compared = rows.map(_.getAs[Long]("compared")).sum
    assert(compared == 3 * n - 6,
      "each row compares to 3 successors; the tail 3 rows lose 1+2+3")
    rows.foreach { r =>
      assert(r.getAs[Long]("matched") <= r.getAs[Long]("compared"))
      val bd = r.getAs[Long]("best_dist")
      assert(bd == -1 || (bd >= 0 && bd <= 3))
    }
  }

  test("q449 KDE: 50 grid points, shares sum to ~100000, mass positive") {
    val rows = SparkEntry.queries("q449_kde_grid")(spark, dir).collect()
    assert(rows.length == 50)
    val share = rows.map(_.getAs[Long]("share_c5")).sum
    assert(share >= 100000 - 50 && share <= 100000,
      "integer shares can only lose the per-row floor")
    assert(rows.map(_.getAs[Long]("density")).sum > 0)
    val gs = rows.sortBy(_.getAs[Long]("i")).map(_.getAs[Long]("g"))
    assert(gs.zip(gs.tail).forall { case (a, b) => b > a },
      "grid strictly increasing")
  }

  test("q450 dup payments: pair counts vs independent recount") {
    val rows = SparkEntry.queries("q450_dup_payments")(spark, dir).collect()
    import org.apache.spark.sql.functions._
    val o = graft.Tables.t(spark, dir, "orders")
      .selectExpr("o_orderkey", "o_custkey",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents",
        "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS d")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    var pairs = 0L
    o.groupBy(_._2).foreach { case (_, os) =>
      for (a <- os; b <- os
           if a._1 < b._1 && math.abs(a._4 - b._4) <= 5 &&
             math.abs(a._3 - b._3) * 100 <= math.min(a._3, b._3) * 5)
        pairs += 1
    }
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == pairs)
    rows.foreach(r =>
      assert(r.getAs[Long]("customers") <= r.getAs[Long]("n_pairs")))
  }
}
