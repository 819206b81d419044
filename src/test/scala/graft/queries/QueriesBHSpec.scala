package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesBH pack (error budget, DiD, consensus
  * anomaly, order aging). */
class QueriesBHSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q238 error budget: over-days <= days, burn positive iff over") {
    val rows = SparkEntry.queries("q238_error_budget")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_over") <= r.getAs[Long]("n_days"))
      if (r.getAs[Long]("n_over") == 0L) assert(r.getAs[Long]("burn_bp") == 0L)
      else assert(r.getAs[Long]("burn_bp") > 0L)
    }
  }

  test("q239 did: one row, did = (t1-t0)-(c1-c0), rates in range") {
    val rows = SparkEntry.queries("q239_did_analysis")(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    val t0 = r.getAs[Long]("treat_pre_bp"); val t1 = r.getAs[Long]("treat_post_bp")
    val c0 = r.getAs[Long]("ctrl_pre_bp"); val c1 = r.getAs[Long]("ctrl_post_bp")
    Seq(t0, t1, c0, c1).foreach(v => assert(v >= 0L && v <= 10000L))
    assert(r.getAs[Long]("did_bp") == (t1 - t0) - (c1 - c0))
  }

  test("q240 consensus: intersection bounded by each detector") {
    val rows = SparkEntry.queries("q240_consensus_anomaly")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val both = r.getAs[Long]("n_both")
      assert(both <= r.getAs[Long]("n_spc"))
      assert(both <= r.getAs[Long]("n_naive"))
      assert(r.getAs[Long]("n_spc") <= r.getAs[Long]("n_days"))
    }
  }

  test("q241 aging: orders conserved, never-bucket has sentinel mean") {
    val rows = SparkEntry.queries("q241_order_aging")(spark, dir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_orders")).sum
    assert(total == graft.Tables.t(spark, dir, "orders").count())
    rows.foreach { r =>
      if (r.getAs[String]("bucket") == "e_never")
        assert(r.getAs[Long]("mean_age_milli") == -1L)
    }
  }
}
