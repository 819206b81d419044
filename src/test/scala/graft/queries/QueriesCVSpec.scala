package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesCV pack (DTW, categorical KL,
  * eventually-follows, weighted sampling). */
class QueriesCVSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q395 DTW: warping never exceeds the diagonal cost") {
    val rows = SparkEntry.queries("q395_dtw")(spark, dir).collect()
    assert(rows.length == 30, "one row per observed day")
    rows.foreach { r =>
      assert(r.getAs[Long]("dtw_cost") <= r.getAs[Long]("diag_cost"),
        "the diagonal path is one admissible warp, so DTW is ≤ it")
      assert(r.getAs[Long]("dtw_cost") >= 0)
      assert(r.getAs[Long]("gain_bp") >= 0 && r.getAs[Long]("gain_bp") <= 10000)
    }
  }

  test("q396 KL: divergence non-negative (Gibbs), entropy bounded by ln 5") {
    val rows = SparkEntry.queries("q396_kl_categorical")(spark, dir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      // per-cell floors can shave ≤ 5 pico each off a ≥0 total
      assert(r.getAs[Long]("kl_pico") >= -5L,
        "KL(p||q) ≥ 0 up to floor-quantization slack")
      val h = r.getAs[Long]("h_pico")
      assert(h >= 0 && h <= math.ceil(math.log(5.0) * 1e12).toLong,
        "categorical entropy over 5 types is within [0, ln 5]")
    }
  }

  test("q397 eventually-follows: full 5×4 matrix, shares bounded") {
    val rows = SparkEntry.queries("q397_follows_matrix")(spark, dir).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_follows") <= r.getAs[Long]("n_both"))
      assert(r.getAs[Long]("share_bp") <= 10000)
      assert(r.getAs[String]("ta") != r.getAs[String]("tb"))
    }
  }

  test("q398 weighted sample: ranks dense per type, scores ordered") {
    val rows = SparkEntry.queries("q398_weighted_sample")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("p_type")).foreach { case (_, g) =>
      val sorted = g.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[Long]("rk")).toSeq ==
        (1L to sorted.length).toSeq)
      val scores = sorted.map(_.getAs[Long]("score_pico"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        "rank order must follow the ES key descending")
      scores.foreach(sc => assert(sc <= 0,
        "ln(u)/w is negative for u ∈ (0,1), w > 0"))
    }
  }
}
