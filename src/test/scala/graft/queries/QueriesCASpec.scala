package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesCA pack (knapsack, autoscale, bag set ops,
  * Q-Q deciles). */
class QueriesCASpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q311 knapsack: chosen weight never exceeds budget") {
    val rows = SparkEntry.queries("q311_budget_knapsack")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("tot_weight") <= r.getAs[Long]("budget"))
      assert(r.getAs[Long]("util_micro") <= 1000000)
      assert(r.getAs[Long]("n_chosen") >= 1)
    }
  }

  test("q312 autoscale: worker-hours cover events at 50/worker, transitions balance") {
    val r = SparkEntry.queries("q312_autoscale_sim")(spark, dir).collect()(0)
    assert(r.getAs[Long]("worker_hours") * 50 >= r.getAs[Long]("n_events"),
      "ceil scaling always provisions enough capacity")
    assert(r.getAs[Long]("util_micro") <= 1000000)
    // every up must eventually come down, except capacity still held at the
    // last hour: |ups - downs| = workers at the final hour
    assert(r.getAs[Long]("scale_ups") >= r.getAs[Long]("scale_downs"))
  }

  test("q313 bag ops: inclusion–exclusion over multiplicities holds") {
    val m = SparkEntry.queries("q313_bag_setops")(spark, dir).collect()
      .map(r => r.getAs[String]("op") -> r.getAs[Long]("n")).toMap
    // |A\B| + |B\A| + 2·|A∩B| = |A ⊎ B|  (bag identity)
    assert(m("a_minus_b_all") + m("b_minus_a_all") + 2 * m("intersect_all")
      == m("union_all"))
  }

  test("q314 Q-Q: deciles non-decreasing in k for every source") {
    val rows = SparkEntry.queries("q314_qq_deciles")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, g) =>
      val vs = g.sortBy(_.getAs[Int]("k")).map(_.getAs[Long]("v_source")).toSeq
      assert(vs == vs.sorted, "decile curve is monotone")
      assert(g.length == 9)
    }
  }
}
