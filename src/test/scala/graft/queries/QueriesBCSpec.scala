package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesBC pack (seasonal-naive backtest, SPC
  * control chart, target encoding, lift curve). */
class QueriesBCSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q218 seasonal naive: mae >= |bias|, n_eval positive") {
    val rows = SparkEntry.queries("q218_seasonal_naive")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_eval") > 0L)
      assert(r.getAs[Long]("mae_milli") >= math.abs(r.getAs[Long]("bias_milli")),
        "mean absolute error dominates the signed bias")
    }
  }

  test("q219 spc: violations bounded by Chebyshev (<= n/9 + rounding)") {
    val rows = SparkEntry.queries("q219_spc_rules")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_days"); val v = r.getAs[Long]("n_viol")
      assert(v >= 0L && v <= n / 9L + 1L, s"chebyshev bound: $v of $n beyond 3 sigma")
      if (v > 0L) assert(r.getAs[Long]("max_z2_pct") > 900L,
        "a violation implies max (dev/sigma)^2 > 9")
    }
  }

  test("q220 target encoding: enc shrinks mean toward global") {
    val rows = SparkEntry.queries("q220_target_encoding")(spark, dir).collect()
    assert(rows.nonEmpty)
    // enc lies between the brand mean and the global mean (within integer
    // truncation slack of 1 cent either side)
    val gApprox = {
      val tot = rows.map(r => r.getAs[Long]("mean_cents") * r.getAs[Long]("n")).sum
      tot / rows.map(_.getAs[Long]("n")).sum
    }
    rows.foreach { r =>
      val m = r.getAs[Long]("mean_cents"); val e = r.getAs[Long]("enc_cents")
      val lo = math.min(m, gApprox) - 2; val hi = math.max(m, gApprox) + 2
      assert(e >= lo && e <= hi, s"enc $e outside [$lo, $hi] (mean $m, global ~$gApprox)")
    }
  }

  test("q221 lift: capture monotone to 10000, lift decreasing-ish, top bin >= 100") {
    val rows = SparkEntry.queries("q221_lift_curve")(spark, dir).collect()
    assert(rows.nonEmpty)
    val caps = rows.map(_.getAs[Long]("capture_bp"))
    assert(caps.zip(caps.tail).forall { case (a, b) => a <= b }, "capture is cumulative")
    assert(caps.last == 10000L, "full population captures everything")
    assert(rows.last.getAs[Long]("lift_pct") == 100L, "full-population lift is 1x")
  }
}
