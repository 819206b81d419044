package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesCM pack (window suite, array set ops,
  * regex mining, nearest fill). */
class QueriesCMSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q359 window suite: second differs from first; rank gap ≥ 0") {
    val rows = SparkEntry.queries("q359_window_suite")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_orders") >= 3)
      assert(r.getAs[Long]("second_cents") > 0, "nth_value(2) defined for n≥3")
      assert(r.getAs[Long]("max_rank_gap") >= 0,
        "rank can only run ahead of dense_rank")
    }
  }

  test("q360 array set ops: inclusion-exclusion per bucket") {
    val rows = SparkEntry.queries("q360_array_setops")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[Long]("jaccard_decile")
      assert(d >= 0 && d <= 10)
    }
  }

  test("q361 regex mining: digit chars ≥ numbers found (each ≥ 1 digit)") {
    val rows = SparkEntry.queries("q361_regex_extract")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("digit_chars") >= r.getAs[Long]("numbers_found"))
      assert(r.getAs[Long]("docs_with_numbers") <= r.getAs[Long]("n_docs"))
    }
  }

  test("q362 nearest fill: every day valued; imputed subset of total") {
    val r = SparkEntry.queries("q362_nearest_fill")(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_gaps") > 0, "thinned series must have gaps")
    assert(r.getAs[Long]("n_gaps") < r.getAs[Long]("n_days"))
    assert(r.getAs[Long]("imputed_total") <= r.getAs[Long]("sum_filled"))
  }
}
