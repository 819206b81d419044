package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesCN pack (rolling median, full outer,
  * CEP, cogroup). */
class QueriesCNSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q363 rolling median: window sizes ≤ 30, median positive") {
    val rows = SparkEntry.queries("q363_rolling_median")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_in_window")
      assert(n >= 1 && n <= 30)
      assert(r.getAs[Long]("med_rev") > 0)
    }
  }

  test("q364 full outer: day categories partition the days") {
    val rows = SparkEntry.queries("q364_full_outer_reconcile")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_both") + r.getAs[Long]("n_urgent_only")
        + r.getAs[Long]("n_low_only") == r.getAs[Long]("n_days"))
    }
  }

  test("q365 CEP: retried ≤ errors; delay 0..5 min") {
    val rows = SparkEntry.queries("q365_cep_error_retry")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_retried") <= r.getAs[Long]("n_errors"))
      val d = r.getAs[Long]("mean_delay_ms")
      assert(d >= 0 && d <= 300000)
    }
  }

  test("q366 cogroup: presence categories partition the key space") {
    val rows = SparkEntry.queries("q366_cogroup_reconcile")(spark, dir).collect()
    assert(rows.nonEmpty)
    val both = rows.map(_.getAs[Long]("keys_both")).sum
    val oo = rows.map(_.getAs[Long]("keys_orders_only")).sum
    val eo = rows.map(_.getAs[Long]("keys_events_only")).sum
    assert(both + oo > 0 && both + eo > 0, "both sides contribute keys")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_orders") >= r.getAs[Long]("keys_both"),
        "every both-key holds at least one order")
    }
  }
}
