package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesBL pack (deep multi-join reporting:
  * Q5/Q8/Q9/Q22 shapes). */
class QueriesBLSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q254 regional commerce: revenue positive, nations within regions") {
    val rows = SparkEntry.queries("q254_regional_commerce")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("rev_cp") > 0L)
      assert(r.getAs[Long]("n_items") > 0L)
    }
  }

  test("q255 market share: one leader per (region, year), share in range") {
    val rows = SparkEntry.queries("q255_market_share")(spark, dir).collect()
    assert(rows.nonEmpty)
    val keys = rows.map(r => (r.getAs[String]("r_name"), r.getAs[Int]("yr")))
    assert(keys.distinct.length == keys.length, "exactly one leader per cell")
    rows.foreach { r =>
      val bp = r.getAs[Long]("share_bp")
      assert(bp > 0L && bp <= 10000L)
    }
  }

  test("q256 margin: every (nation, year) has items") {
    val rows = SparkEntry.queries("q256_product_margin")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("n_items") > 0L))
  }

  test("q257 idle customers: counts positive, balances above zero") {
    val rows = SparkEntry.queries("q257_idle_customers")(spark, dir).collect()
    assert(rows.nonEmpty, "recent-order window leaves idle high-balance customers")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_custs") > 0L)
      assert(r.getAs[Long]("total_bal_cents") > 0L)
    }
  }
}
