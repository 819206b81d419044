package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesBY pack (Mann–Whitney, Spearman, Kendall,
  * DFT seasonality spectrum). */
class QueriesBYSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q303 Mann–Whitney: U within [0, n1·n2], AUC within [0, 1e6]") {
    val rows = SparkEntry.queries("q303_mannwhitney")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n1 = r.getAs[Long]("n1"); val n2 = r.getAs[Long]("n2")
      val u2 = r.getAs[Long]("u2")
      assert(n1 > 0 && n2 > 0)
      assert(u2 >= 0 && u2 <= 2 * n1 * n2, "2U bounded by 2·n1·n2")
      val auc = r.getAs[Long]("auc_micro")
      assert(auc >= 0 && auc <= 1000000)
    }
  }

  test("q304 Spearman: rho within [-1, 1] micro; d2=0 ⇒ rho=1") {
    val rows = SparkEntry.queries("q304_spearman")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rho = r.getAs[Long]("rho_micro")
      assert(rho >= -1000000 && rho <= 1000000)
      if (r.getAs[Long]("sum_d2") == 0) assert(rho == 1000000)
    }
  }

  test("q305 Kendall: conc+disc ≤ pairs, tau within [-1, 1] micro") {
    val rows = SparkEntry.queries("q305_kendall")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getAs[Long]("pairs")
      val c = r.getAs[Long]("conc"); val d = r.getAs[Long]("disc")
      assert(c >= 0 && d >= 0 && c + d <= p, "ties excluded from both")
      val tau = r.getAs[Long]("tau_micro")
      assert(tau >= -1000000 && tau <= 1000000)
    }
  }

  test("q306 spectrum: 3 candidate periods, amplitude = |(s_cos, s_sin)|") {
    val rows = SparkEntry.queries("q306_seasonality_spectrum")(spark, dir).collect()
    assert(rows.map(_.getAs[Int]("period")).toSeq == Seq(7, 11, 30))
    rows.foreach { r =>
      val sc = r.getAs[Long]("s_cos").toDouble
      val ss = r.getAs[Long]("s_sin").toDouble
      val amp = r.getAs[Long]("amp_q")
      assert(amp >= 0)
      assert(math.abs(math.sqrt(sc * sc + ss * ss) - amp) <= 1.0,
        "amp_q is the floored Euclidean norm of the quantized dot products")
    }
  }
}
