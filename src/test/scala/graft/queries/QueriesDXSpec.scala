package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesDX pack (SRM guardrail, rolling-origin CV). */
class QueriesDXSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q501 SRM: chi2 identity, a by-construction-fair split rarely flags") {
    val rows = SparkEntry.queries("q501_srm_check")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n1, n0) = (r.getAs[Long]("n1"), r.getAs[Long]("n0"))
      assert(r.getAs[Long]("chi2_micro") ==
        (n1 - n0) * (n1 - n0) * 1000000L / (n1 + n0))
      assert(r.getAs[Boolean]("srm_flag") ==
        (r.getAs[Long]("chi2_micro") > 3841000L))
    }
    val flagged = rows.count(_.getAs[Boolean]("srm_flag"))
    assert(flagged * 2 <= rows.length,
      "an unbiased split cannot flag a majority of days")
  }

  test("q502 rolling-origin CV: folds are disjoint, ordered, complete") {
    val rows = SparkEntry.queries("q502_rolling_origin_cv")(spark, dir)
      .collect().sortBy(_.getAs[Long]("fold"))
    assert(rows.length == 3)
    val spans = rows.map(r => (r.getAs[Long]("test_lo"),
      r.getAs[Long]("test_hi")))
    spans.foreach { case (lo, hi) => assert(hi - lo == 6, "7-day windows") }
    spans.zip(spans.tail).foreach { case ((_, h1), (l2, _)) =>
      assert(l2 == h1 + 1, "folds tile the tail of the timeline")
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_cells") > 0)
      assert(r.getAs[Long]("mae_milli") ==
        r.getAs[Long]("sae") * 1000 / r.getAs[Long]("n_cells"))
    }
  }
}
