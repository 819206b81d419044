package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesCW pack (BH FDR, Apriori triples,
  * Poisson bootstrap, interval scheduling). */
class QueriesCWSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q399 BH: step-up rejection set is a rank prefix containing all candidates") {
    val rows = SparkEntry.queries("q399_bh_fdr")(spark, dir).collect()
    assert(rows.nonEmpty)
    val m = rows.head.getAs[Long]("m")
    assert(rows.length.toLong == m, "every hypothesis appears exactly once")
    rows.foreach { r =>
      val n = r.getAs[Long]("n_pairs")
      val p64 = r.getAs[Long]("p64")
      assert(p64 >= 1 && p64 <= 64, "p scaled to /64 stays in (0,1]")
      assert(r.getAs[Long]("s_incr") <= n)
    }
    val rejected = rows.filter(_.getAs[Long]("rejected") == 1L)
      .map(_.getAs[Long]("rk")).sorted
    assert(rejected.toSeq == (1L to rejected.length).toSeq,
      "BH rejections are a prefix of the p-value ranking")
    // every step-up candidate (p_(k) <= k*alpha/m) must be rejected
    rows.foreach { r =>
      if (r.getAs[Long]("p64") * 20 * m <= 64 * r.getAs[Long]("rk"))
        assert(r.getAs[Long]("rejected") == 1L)
    }
  }

  test("q400 Apriori: ordered triples, positive support, monotone top-15") {
    val rows = SparkEntry.queries("q400_apriori_triples")(spark, dir).collect()
    assert(rows.length == 15)
    val sups = rows.map(_.getAs[Long]("support"))
    assert(sups.zip(sups.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[String]("ta") < r.getAs[String]("tb"))
      assert(r.getAs[String]("tb") < r.getAs[String]("tc"))
      assert(r.getAs[Long]("support") >= 2)
      assert(r.getAs[Long]("lift_milli") > 0)
    }
  }

  test("q401 Poisson bootstrap: CI brackets the point estimate") {
    val rows = SparkEntry.queries("q401_poisson_bootstrap")(spark, dir).collect()
    assert(rows.length == 5, "one CI per market segment")
    rows.foreach { r =>
      val (lo, pt, hi) = (r.getAs[Long]("lo_milli"),
        r.getAs[Long]("point_milli"), r.getAs[Long]("hi_milli"))
      assert(lo <= pt && pt <= hi,
        "p05..p95 of 32 resample means must bracket the full-sample mean")
      assert(r.getAs[Long]("width_milli") == hi - lo)
      assert(r.getAs[Long]("width_milli") > 0)
    }
  }

  test("q402 greedy interval scheduling matches the optimal DP count") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q402_interval_scheduling")(spark, dir)
      .collect().map(r => r.getAs[Long]("l_suppkey") ->
        (r.getAs[Long]("n_intervals"), r.getAs[Long]("n_selected"))).toMap
    // independent check: weighted-interval-scheduling DP with unit weights
    val iv = graft.Tables.t(spark, dir, "lineitem")
      .join(graft.Tables.t(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .selectExpr("l_suppkey AS sup",
        "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS st",
        "unix_millis(CAST(l_shipdate AS TIMESTAMP)) DIV 86400000 AS en")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    iv.foreach { case (sup, rows) =>
      val sorted = rows.map(t => (t._2, t._3)).sortBy(t => (t._2, t._1))
      // f(i) = best count over the first i intervals (sorted by end)
      val f = new Array[Long](sorted.length + 1)
      for (i <- 1 to sorted.length) {
        val (st, _) = sorted(i - 1)
        // p = last interval ending strictly before st
        var p = i - 1
        while (p > 0 && sorted(p - 1)._2 >= st) p -= 1
        f(i) = math.max(f(i - 1), f(p) + 1)
      }
      val (n, sel) = out(sup)
      assert(n == rows.length.toLong)
      assert(sel == f(sorted.length),
        s"greedy earliest-end must be optimal for supplier $sup")
    }
  }
}
