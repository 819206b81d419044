package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesBR pack (Q16/Q18/Q19/Q21 shapes). */
class QueriesBRSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q277 supplier variety: counts positive, ordered desc") {
    val rows = SparkEntry.queries("q277_supplier_variety")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("supplier_cnt") > 0L))
    val cnts = rows.map(_.getAs[Long]("supplier_cnt")).toSeq
    assert(cnts == cnts.sorted.reverse)
  }

  test("q278 big orders: rank sequential, total qty non-increasing") {
    val rows = SparkEntry.queries("q278_big_orders")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    assert(rows.map(_.getAs[Long]("rk")).toSeq == (1L to rows.length))
    val qs = rows.map(_.getAs[Long]("total_qty")).toSeq
    assert(qs == qs.sorted.reverse)
  }

  test("q279 disjunctive revenue: branch labels valid, revenue positive") {
    val rows = SparkEntry.queries("q279_disjunctive_revenue")(spark, dir).collect()
    assert(rows.nonEmpty)
    val valid = Set("b1_small", "b2_mid", "b3_large")
    rows.foreach { r =>
      assert(valid(r.getAs[String]("branch")))
      assert(r.getAs[Long]("rev_cp") > 0L)
    }
  }

  test("q280 sole late supplier: bounded, counts positive") {
    val rows = SparkEntry.queries("q280_sole_late_supplier")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_.getAs[Long]("rk")).toSeq == (1L to rows.length))
    rows.foreach(r => assert(r.getAs[Long]("n_orders") > 0L))
  }
}
