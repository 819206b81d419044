package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesDG pack (propensity ATE, McNemar, LSE
  * merge, k-center greedy). */
class QueriesDGSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q435 ATE: weighted strata diffs reproduce the reported ATE") {
    val rows = SparkEntry.queries("q435_propensity_ate")(spark, dir).collect()
    assert(rows.nonEmpty)
    val ate = rows.map(_.getAs[Long]("ate_micro")).distinct
    assert(ate.length == 1)
    val n = rows.map(_.getAs[Long]("n")).sum
    val wsum = rows.map(r => r.getAs[Long]("n") * r.getAs[Long]("diff_micro")).sum
    assert(ate.head == wsum / n)
    rows.foreach { r =>
      assert(r.getAs[Long]("n1") + r.getAs[Long]("n0") == r.getAs[Long]("n"))
      assert(r.getAs[Long]("diff_micro") ==
        r.getAs[Long]("rate1_micro") - r.getAs[Long]("rate0_micro"))
    }
  }

  test("q436 McNemar: discordant + concordant <= users, chi2 identity") {
    val rows = SparkEntry.queries("q436_mcnemar")(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (b, c, both, n) = (r.getAs[Long]("b_lost"), r.getAs[Long]("c_gained"),
        r.getAs[Long]("both"), r.getAs[Long]("n_users"))
      assert(b + c + both <= n)
      if (b + c > 0)
        assert(r.getAs[Long]("chi2_micro") == (b - c) * (b - c) * 1000000L / (b + c))
      else assert(r.getAs[Long]("chi2_micro") == 0L)
    }
  }

  test("q437 LSE: merged normalizer drifts only by quantization slack") {
    val rows = SparkEntry.queries("q437_logsumexp_merge")(spark, dir).collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      val (zd, zm, drift) = (r.getAs[Long]("z_direct"),
        r.getAs[Long]("z_merged"), r.getAs[Long]("drift"))
      assert(drift == zd - zm)
      // per-term floor loses < 1 micro, the merge rescale re-floors two
      // half-sums: drift bounded by corpus size + 2
      val n = graft.Tables.t(spark, dir, "embeddings").count()
      assert(math.abs(drift) <= n + 2,
        s"merge must agree with direct up to floor slack: $drift")
      assert(zd > 0 && zm > 0)
      assert(r.getAs[Long]("lse6") >= r.getAs[Long]("m6"),
        "LSE is at least the max score")
    }
  }

  test("q438 k-center: selection gains shrink, radius <= last gain") {
    val rows = SparkEntry.queries("q438_kcenter_greedy")(spark, dir)
      .collect().sortBy(_.getAs[Long]("step"))
    assert(rows.length == 3)
    assert(rows.map(_.getAs[Long]("c_id")).distinct.length == 3)
    val d2 = rows(1).getAs[Long]("sel_dist")
    val d3 = rows(2).getAs[Long]("sel_dist")
    assert(d3 <= d2, "farthest-first gains are non-increasing")
    val radius = rows.map(_.getAs[Long]("radius")).distinct
    assert(radius.length == 1)
    assert(radius.head <= d3,
      "after adding the step-3 center, max min-dist cannot exceed its gain")
  }
}
