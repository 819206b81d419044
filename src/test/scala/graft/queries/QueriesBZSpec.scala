package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesBZ pack (Neyman allocation, HITS,
  * business days, Gini). */
class QueriesBZSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q307 Neyman: allocations sum exactly to the budget, all ≥ 0") {
    val rows = SparkEntry.queries("q307_neyman_alloc")(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("alloc")).sum == 1000L,
      "largest-remainder rounding conserves the budget")
    rows.foreach(r => assert(r.getAs[Long]("alloc") >= 0))
  }

  test("q308 HITS: top-k suppliers, a2 descending, a1 = weighted indegree > 0") {
    val rows = SparkEntry.queries("q308_hits")(spark, dir).collect()
    // sf0.001 has only 10 suppliers; larger SFs fill the LIMIT 20
    assert(rows.nonEmpty && rows.length <= 20)
    val a2s = rows.map(_.getAs[Long]("a2")).toSeq
    assert(a2s == a2s.sortBy(-_), "ordered by second-iteration authority")
    rows.foreach(r => assert(r.getAs[Long]("a1") > 0))
  }

  test("q309 business days: min ≤ avg ≤ max (synthetic ship dates may precede order dates)") {
    val rows = SparkEntry.queries("q309_business_days")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mn = r.getAs[Long]("min_bd"); val mx = r.getAs[Long]("max_bd")
      val avg = r.getAs[Long]("avg_bd_micro")
      assert(mn <= mx)
      assert(avg >= mn * 1000000 && avg <= mx * 1000000)
    }
  }

  test("q310 Gini: within [0, 1e6) and not degenerate") {
    val rows = SparkEntry.queries("q310_gini")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getAs[Long]("gini_micro")
      assert(g >= 0 && g < 1000000)
    }
  }
}
