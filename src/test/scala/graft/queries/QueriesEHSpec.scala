package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants for the QueriesEH pack (min-var portfolio, effective
  * rank, assignment, event study). */
class QueriesEHSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q538 min-var portfolio: weights sum to ~1 and the closed form " +
      "beats (or ties) every grid alternative on the sample covariance") {
    val r = SparkEntry.queries("q538_min_var_portfolio")(spark, dir)
      .collect().head
    val w = Seq(r.getAs[Long]("w1_micro"), r.getAs[Long]("w2_micro"),
      r.getAs[Long]("w3_micro"))
    assert(math.abs(w.sum - 1000000L) <= 3, "weights sum to 1 (floor loss)")
    assert(r.getAs[Long]("var_ratio_milli") >= 1000,
      "min-var portfolio variance never exceeds the equal-weight variance")
    // recompute covariance and check the reported weights beat a coarse
    // grid of alternative weightings
    val daily = graft.Tables.t(spark, dir, "orders")
      .where("o_totalprice IS NOT NULL")
      .join(graft.Tables.t(spark, dir, "customer"), expr("o_custkey = c_custkey"))
      .join(graft.Tables.t(spark, dir, "nation"), expr("c_nationkey = n_nationkey"))
      .join(graft.Tables.t(spark, dir, "region"), expr("n_regionkey = r_regionkey"))
      .where("r_name IN ('AFRICA', 'AMERICA', 'ASIA')")
      .selectExpr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS day",
        "r_name", "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DIV 100 AS rev")
      .groupBy("day").pivot("r_name").agg(coalesce(sum("rev"), lit(0L)))
      .na.fill(0L)
      .collect().map(x => (x.getAs[Number]("AFRICA").doubleValue,
        x.getAs[Number]("AMERICA").doubleValue, x.getAs[Number]("ASIA").doubleValue))
    val n = daily.length
    def mean(f: ((Double, Double, Double)) => Double) = daily.map(f).sum / n
    val (ma, mb, mc) = (mean(_._1), mean(_._2), mean(_._3))
    def cov(f: ((Double, Double, Double)) => Double,
        g: ((Double, Double, Double)) => Double, mf: Double, mg: Double) =
      daily.map(x => (f(x) - mf) * (g(x) - mg)).sum / (n - 1)
    val c = Array(
      Array(cov(_._1, _._1, ma, ma), cov(_._1, _._2, ma, mb), cov(_._1, _._3, ma, mc)),
      Array(cov(_._1, _._2, ma, mb), cov(_._2, _._2, mb, mb), cov(_._2, _._3, mb, mc)),
      Array(cov(_._1, _._3, ma, mc), cov(_._2, _._3, mb, mc), cov(_._3, _._3, mc, mc)))
    def pvar(ws: Seq[Double]) =
      (for (i <- 0 until 3; j <- 0 until 3) yield ws(i) * ws(j) * c(i)(j)).sum
    val wOpt = w.map(_ / 1e6)
    val vOpt = pvar(wOpt)
    for (i <- -4 to 8; j <- -4 to 8) {
      val ws = Seq(i / 4.0, j / 4.0, 1.0 - i / 4.0 - j / 4.0)
      assert(pvar(ws) >= vOpt - math.abs(vOpt) * 1e-3,
        s"grid weights $ws beat the closed form")
    }
  }

  test("q539 effective rank: between 1 and 64, and matches a direct " +
      "matrix computation") {
    val r = SparkEntry.queries("q539_effective_rank")(spark, dir).collect().head
    assert(r.getAs[Long]("n_cells") == 4096L)
    val er = r.getAs[Long]("eff_rank_milli")
    assert(er >= 1000 && er <= 64000, s"1 <= PR <= dim, got $er")
    val vs = graft.Tables.t(spark, dir, "embeddings")
      .where("embedding IS NOT NULL")
      .selectExpr("transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT)) AS vm")
      .collect().map(_.getSeq[Long](0).toArray)
    val cMat = Array.ofDim[Long](64, 64)
    vs.foreach { v =>
      for (d1 <- 0 until 64; d2 <- 0 until 64) cMat(d1)(d2) += v(d1) * v(d2)
    }
    val trc = (0 until 64).map(d => cMat(d)(d)).sum
    val trc2 = (for (d1 <- 0 until 64; d2 <- 0 until 64)
      yield BigInt(cMat(d1)(d2)) * cMat(d1)(d2)).sum
    assert(r.getAs[Long]("trc") == trc)
    val expected = math.floor(trc.toDouble * trc / trc2.toDouble * 1000).toLong
    assert(math.abs(er - expected) <= 1)
  }

  test("q540 assignment: the reported total is minimal over all 120 " +
      "permutations (exhaustive replay) and regions are distinct") {
    val r = SparkEntry.queries("q540_assignment")(spark, dir).collect().head
    val regions = Seq("pri1_region", "pri2_region", "pri3_region",
      "pri4_region", "pri5_region").map(r.getAs[String])
    assert(regions.distinct.length == 5, "a permutation assigns distinctly")
    val cost = graft.Tables.t(spark, dir, "orders")
      .join(graft.Tables.t(spark, dir, "customer"), expr("o_custkey = c_custkey"))
      .join(graft.Tables.t(spark, dir, "nation"), expr("c_nationkey = n_nationkey"))
      .join(graft.Tables.t(spark, dir, "region"), expr("n_regionkey = r_regionkey"))
      .selectExpr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS pri",
        "r_name", "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 % 30 AS lat")
      .groupBy("pri", "r_name")
      .agg(expr("CAST(CAST(sum(lat) AS BIGINT) * 1000 DIV count(*) AS BIGINT) AS c"))
      .collect().map(x => (x.getLong(0), x.getString(1)) -> x.getLong(2)).toMap
    val names = cost.keys.map(_._2).toSeq.distinct.sorted
    var bestTotal = Long.MaxValue
    names.permutations.foreach { p =>
      val tot = (1 to 5).map(i => cost((i.toLong, p(i - 1)))).sum
      if (tot < bestTotal) bestTotal = tot
    }
    assert(r.getAs[Long]("opt_total") == bestTotal)
    assert((1 to 5).map(i => cost((i.toLong, regions(i - 1)))).sum == bestTotal)
  }

  test("q541 event study: coefficients re-base to the pre-period mean " +
      "(pre-period coefs average ~0) and rates are conserved") {
    val out = SparkEntry.queries("q541_event_study")(spark, dir).collect()
    assert(out.length == 12)
    val pre = out.filter(_.getAs[Long]("m") < 0)
    assert(pre.length == 6)
    // re-based: mean of pre-period coef_pm is within integer-floor slack
    val preCoefMean = pre.map(_.getAs[Long]("coef_pm")).sum / pre.length
    assert(math.abs(preCoefMean) <= 1,
      s"pre-period coefficients average to ~0, got $preCoefMean")
    // both engines' integer division truncates toward zero — so does
    // Scala's Long division, making the replay exact
    val baseline = pre.map(_.getAs[Long]("diff_pm")).sum / 6
    out.foreach { r =>
      assert(r.getAs[Long]("coef_pm") == r.getAs[Long]("diff_pm") - baseline)
    }
  }
}
