package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesBN pack (basket profile, price dispersion,
  * correlation by group, LTV curve). */
class QueriesBNSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q262 baskets: orders conserved, buckets capped at 7") {
    val rows = SparkEntry.queries("q262_basket_profile")(spark, dir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_orders")).sum
    val ordersWithLines = {
      import org.apache.spark.sql.functions._
      graft.Tables.t(spark, dir, "lineitem").select("l_orderkey").distinct().count()
    }
    assert(total == ordersWithLines)
    rows.foreach { r =>
      assert(r.getAs[Long]("size_bucket") >= 1L && r.getAs[Long]("size_bucket") <= 7L)
      assert(r.getAs[Long]("mean_lines_milli") >= 1000L)
    }
  }

  test("q263 dispersion: cv2 non-negative") {
    val rows = SparkEntry.queries("q263_price_dispersion")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("cv2_milli") >= 0L,
        "n*S2 - S1^2 >= 0 by Cauchy-Schwarz")
    }
  }

  test("q264 correlation: r2 in [0, 1e6], sign in {-1,0,1}") {
    val rows = SparkEntry.queries("q264_len_quality_corr")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Int]("sign")) <= 1)
      if (!r.isNullAt(r.fieldIndex("r2_micro"))) {
        val v = r.getAs[Long]("r2_micro")
        assert(v >= 0L && v <= 1000000L, s"r^2 must lie in [0,1], got $v micro")
      }
    }
  }

  test("q265 ltv: monotone in order rank where defined") {
    val rows = SparkEntry.queries("q265_ltv_curve")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val l1 = r.getAs[Long]("ltv1_cents")
      assert(l1 > 0L)
      if (!r.isNullAt(r.fieldIndex("ltv3_cents"))) {
        val l3 = r.getAs[Long]("ltv3_cents")
        assert(l3 > l1, "cumulative revenue grows with order count")
        if (!r.isNullAt(r.fieldIndex("ltv5_cents")))
          assert(r.getAs[Long]("ltv5_cents") > l3)
      }
    }
  }
}
