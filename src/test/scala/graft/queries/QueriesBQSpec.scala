package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesBQ pack (Q4/Q7/Q10/Q15 shapes). */
class QueriesBQSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q273 late orders: bp consistent, late <= total") {
    val rows = SparkEntry.queries("q273_late_order_priority")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_orders"); val late = r.getAs[Long]("n_late")
      assert(late >= 0L && late <= n)
      assert(r.getAs[Long]("late_bp") == late * 10000 / n)
    }
  }

  test("q274 nation trade: cross-nation only, bounded, revenue ordered") {
    val rows = SparkEntry.queries("q274_nation_trade")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach(r => assert(
      r.getAs[String]("cust_nation") != r.getAs[String]("supp_nation")))
    val revs = rows.map(_.getAs[Long]("rev_cp")).toSeq
    assert(revs == revs.sorted.reverse, "sorted by revenue desc")
  }

  test("q275 top supplier: per-year rows all carry that year's max revenue") {
    val rows = SparkEntry.queries("q275_top_supplier")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Int]("yr")).foreach { case (_, g) =>
      assert(g.map(_.getAs[Long]("rev_cp")).distinct.length == 1,
        "ties kept: every reported supplier has the same (max) revenue")
    }
  }

  test("q276 returned revenue: rank sequential, revenue non-increasing") {
    val rows = SparkEntry.queries("q276_returned_revenue")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_.getAs[Long]("rk")).toSeq == (1L to rows.length))
    val revs = rows.map(_.getAs[Long]("rev_cp")).toSeq
    assert(revs == revs.sorted.reverse)
  }
}
