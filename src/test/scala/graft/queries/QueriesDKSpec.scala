package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesDK pack (MI ranking, partial dependence,
  * stump boosting, random-cut scores). */
class QueriesDKSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q451 MI: non-negative (Gibbs), cells bounded by domain sizes") {
    val rows = SparkEntry.queries("q451_mutual_information")(spark, dir)
      .collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getAs[Long]("mi_micro") >= -1,
        "MI >= 0 up to per-cell floor slack")
      val cells = r.getAs[Long]("cells")
      val cap = r.getAs[String]("feature") match {
        case "brand" => 50L; case "sizeband" => 12L
        case "priority" => 10L; case "linestatus" => 4L
      }
      assert(cells >= 2 && cells <= cap)
    }
  }

  test("q452 PD: profile is linear in the grid — constant slope steps") {
    val rows = SparkEntry.queries("q452_partial_dependence")(spark, dir)
      .collect().sortBy(_.getAs[Long]("i"))
    assert(rows.length == 11)
    val pd = rows.map(_.getAs[Long]("pd_centi"))
    val steps = pd.zip(pd.tail).map { case (a, b) => b - a }
    assert(steps.distinct.length <= 2,
      "linear model: grid steps differ only by DIV rounding")
    val b1 = rows.map(_.getAs[Long]("b1_micro")).distinct
    assert(b1.length == 1)
    // slope sign must match the step direction
    if (b1.head > 1000) assert(steps.head > 0)
    if (b1.head < -1000) assert(steps.head < 0)
  }

  test("q453 boosting: SSE non-increasing across rounds") {
    val rows = SparkEntry.queries("q453_stump_boost")(spark, dir)
      .collect().sortBy(_.getAs[Long]("round"))
    assert(rows.length == 2)
    val (r1, r2) = (rows(0), rows(1))
    assert(r2.getAs[Long]("sse_after") <= r1.getAs[Long]("sse_after"),
      "fitting residuals cannot raise the squared loss")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_left") > 0 && r.getAs[Long]("n_right") > 0)
      assert(math.abs(r.getAs[Long]("pred_left")) <= 1000 &&
        math.abs(r.getAs[Long]("pred_right")) <= 1000)
    }
  }

  test("q454 random cut: score bounds, anomalies are rare") {
    val rows = SparkEntry.queries("q454_random_cut")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mn, mean) = (r.getAs[Long]("min_score"),
        r.getAs[Long]("mean_score_micro"))
      assert(mn >= 0 && mn <= mean)
      assert(mean <= 4000000L, "4 trees x at-most-full-share each")
      assert(r.getAs[Long]("anomalies") * 5 <= r.getAs[Long]("n_orders"),
        "anomaly threshold flags a minority")
    }
  }
}
