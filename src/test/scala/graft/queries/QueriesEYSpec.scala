package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariants for the QueriesEY pack (TOST, CvM drift, l-diversity,
  * forecast reconciliation). */
class QueriesEYSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q605 TOST: the equivalent flag is consistent with both one-sided t's") {
    val out = SparkEntry.queries("q605_tost_equivalence")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n1") > 1 && r.getAs[Long]("n0") > 1)
      if (r.getAs[Long]("equivalent") == 1L) {
        assert(r.getAs[Long]("t_lo_milli") >= 1645L)
        assert(r.getAs[Long]("t_hi_milli") >= 1645L)
      }
      // TOST sanity: t_lo + t_hi = 2δ/se > 0 — both can't be ≤0 at once
      assert(r.getAs[Long]("t_lo_milli") + r.getAs[Long]("t_hi_milli") > 0)
    }
  }

  test("q606 CvM: the closed-form census statistic equals a brute-force " +
      "per-row rank replay") {
    val out = SparkEntry.queries("q606_cvm_drift")(spark, dir).collect()
      .map(r => r.getAs[String]("et") ->
        (r.getAs[Long]("n"), r.getAs[Long]("m"), r.getAs[Long]("t_cvm_micro")))
      .toMap
    assert(out.nonEmpty)
    val cutoff = Q.millisOf("2024-01-29 00:00:00")
    val rows = Tables.t(spark, dir, "events")
      .where(col("value").isNotNull)
      .selectExpr("event_type",
        "CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS v",
        s"CASE WHEN (${Q.tsMs}) < ${cutoff}L THEN 1 ELSE 0 END AS a")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    rows.groupBy(_._1).foreach { case (et, grp) =>
      val sorted = grp.map(x => (x._2, x._3)).sortBy(_._1)
      val n = sorted.count(_._2 == 1).toLong
      val m = sorted.size - n
      if (n > 0 && m > 0) {
        // average ranks with ties (1-based), brute force per row
        val byV = sorted.zipWithIndex.groupBy(_._1._1)
        val avgRank = byV.map { case (v, xs) =>
          v -> xs.map(_._2 + 1).sum.toDouble / xs.size
        }
        var ia = 0; var ib = 0; var sa = 0.0; var sb = 0.0
        sorted.foreach { case (v, a) =>
          if (a == 1) { ia += 1; sa += math.pow(avgRank(v) - ia, 2) }
          else { ib += 1; sb += math.pow(avgRank(v) - ib, 2) }
        }
        val u = n * sa + m * sb
        val t = u / (n.toDouble * m * (n + m)) -
          (4.0 * n * m - 1.0) / (6.0 * (n + m))
        val want = math.floor(t * 1e6).toLong
        val (qn, qm, qt) = out(et)
        assert(qn == n && qm == m, s"$et counts $qn/$qm vs $n/$m")
        // the query's integer path is exact; the replay uses doubles, so
        // allow 1 micro of slack at the floor boundary
        assert(math.abs(qt - want) <= 1L, s"$et cvm $qt vs $want")
      }
    }
  }

  test("q607 l-diversity: group and row conservation, l within domain") {
    val out = SparkEntry.queries("q607_ldiversity")(spark, dir).collect()
    val nGroups = out.map(_.getAs[Long]("n_groups")).sum
    val nRows = out.map(_.getAs[Long]("n_rows")).sum
    val direct = Tables.t(spark, dir, "customer")
      .selectExpr("c_nationkey",
        "CAST(floor(CAST(c_acctbal AS DOUBLE) / 1000.0) AS BIGINT) AS band")
      .distinct().count()
    assert(nGroups == direct, s"groups $nGroups vs $direct")
    assert(nRows == Tables.t(spark, dir, "customer").count())
    out.foreach(r => assert(r.getAs[Long]("l") >= 1 && r.getAs[Long]("l") <= 5))
  }

  test("q608 reconciliation: MAEs are non-negative and the winner flag " +
      "is consistent") {
    val out = SparkEntry.queries("q608_forecast_reconcile")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_days") > 0)
      assert(r.getAs[Long]("mae_bu_usd") >= 0 && r.getAs[Long]("mae_td_usd") >= 0)
      if (r.getAs[Long]("mae_bu_usd") < r.getAs[Long]("mae_td_usd"))
        assert(r.getAs[Long]("bu_wins") == 1L)
      if (r.getAs[Long]("mae_bu_usd") > r.getAs[Long]("mae_td_usd"))
        assert(r.getAs[Long]("bu_wins") == 0L)
    }
  }
}
