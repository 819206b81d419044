package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesBV pack (embedding-index diagnostics). */
class QueriesBVSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q293 ADC: errors non-negative, top ids valid, match flag consistent") {
    val rows = SparkEntry.queries("q293_pq_adc_accuracy")(spark, dir).collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      assert(r.getAs[Long]("mean_abs_err_u") >= 0L)
      assert(r.getAs[Long]("top1_adc") != r.getAs[Long]("q_id"),
        "self-match excluded")
      val m = r.getAs[Long]("top1_match")
      assert(m == (if (r.getAs[Long]("top1_adc") == r.getAs[Long]("top1_exact")) 1L else 0L))
    }
  }

  test("q294 dim variance: top-10 ordered, non-negative") {
    val rows = SparkEntry.queries("q294_dim_variance")(spark, dir).collect()
    assert(rows.length == 10)
    val vs = rows.map(_.getAs[Long]("var_milli2")).toSeq
    assert(vs == vs.sorted.reverse)
    vs.foreach(v => assert(v >= 0L))
  }

  test("q295 centroid drift: cosine within [-1, 1] micro, halves partition the label") {
    val rows = SparkEntry.queries("q295_centroid_drift")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("cos_micro")))
        assert(math.abs(r.getAs[Long]("cos_micro")) <= 1000000L)
      assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") > 0L)
    }
  }

  test("q296 norm outliers: outliers a minority, MAD non-negative") {
    val rows = SparkEntry.queries("q296_norm_outliers")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("mad_u") >= 0L)
      assert(r.getAs[Long]("n_outliers") * 2 <= r.getAs[Long]("n_vecs"),
        "more than half the label cannot be >3 Mad from the median")
    }
  }
}
