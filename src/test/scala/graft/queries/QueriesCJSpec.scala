package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesCJ pack (AQP estimate, relational division,
  * sliding windows, partition evolution). */
class QueriesCJSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q347 AQP: estimates within a plausible band of exact") {
    val rows = SparkEntry.queries("q347_aqp_estimate")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sampled") <= r.getAs[Long]("n_exact"))
      val err = math.abs(r.getAs[Long]("err_bp"))
      assert(err <= 10000, "10% hash sample can't be off by more than ±100%")
    }
  }

  test("q348 division: covering customers hold ≥ 5 orders each") {
    val rows = SparkEntry.queries("q348_relational_division")(spark, dir).collect()
    rows.foreach { r =>
      val n = r.getAs[Long]("n_covering_customers")
      assert(r.getAs[Long]("their_orders") >= 5 * n,
        "covering all 5 priorities needs at least 5 orders")
    }
  }

  test("q349 sliding windows: starts aligned to 15-minute slide, counts desc") {
    val rows = SparkEntry.queries("q349_sliding_window")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r =>
      assert(r.getAs[Long]("win_start_ms") % 900000 == 0))
    val cs = rows.map(_.getAs[Long]("cnt")).toSeq
    assert(cs == cs.sortBy(-_))
  }

  test("q350 partition evolution: finer layout scans no more rows") {
    val m = SparkEntry.queries("q350_partition_evolution")(spark, dir).collect()
      .map(r => r.getAs[String]("layout") ->
        (r.getAs[Long]("rows_scanned"), r.getAs[Long]("rows_matching"),
          r.getAs[Long]("waste_bp"))).toMap
    assert(m("a_month30")._2 == m("b_week")._2,
      "the predicate matches the same rows under any layout")
    assert(m("b_week")._1 <= m("a_month30")._1,
      "finer partitions scan a subset of what coarser partitions scan")
    assert(m("b_week")._3 <= m("a_month30")._3)
  }
}
