package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesDC pack (secretary rule, Shapley,
  * Simpson's paradox, double sweep). */
class QueriesDCSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q423 secretary: rates in bounds, picks are real positions") {
    val rows = SparkEntry.queries("q423_secretary")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("wins") <= r.getAs[Long]("trials"))
      val bp = r.getAs[Long]("win_bp")
      assert(bp >= 0 && bp <= 10000)
      val mp = r.getAs[Long]("mean_pos_milli")
      assert(mp >= 0 && mp <= 1000, "mean stopping position <= sequence end")
    }
  }

  test("q424 Shapley: efficiency axiom — shares sum to 6*v(grand)") {
    val rows = SparkEntry.queries("q424_shapley3")(spark, dir).collect()
    assert(rows.length == 3)
    val grand = rows.map(_.getAs[Long]("v_grand")).distinct
    assert(grand.length == 1)
    assert(rows.map(_.getAs[Long]("phi6")).sum == 6 * grand.head,
      "Shapley efficiency: attribution exactly exhausts the grand value")
    rows.foreach { r =>
      assert(r.getAs[Long]("phi6") >= 0, "touch channels cannot harm coverage")
      assert(r.getAs[Long]("v_single") <= grand.head)
    }
  }

  test("q425 Simpson: signs in {-1,0,1}, strata counts consistent") {
    val rows = SparkEntry.queries("q425_simpson_paradox")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(Set(-1L, 0L, 1L).contains(r.getAs[Long]("s_agg")))
      assert(r.getAs[Long]("strata_pos") + r.getAs[Long]("strata_neg") <=
        r.getAs[Long]("strata"))
      if (r.getAs[Boolean]("paradox"))
        assert(r.getAs[Long]("s_agg") != 0L)
    }
  }

  test("q426 double sweep: phase-2 eccentricity >= phase-1 (within bound)") {
    val rows = SparkEntry.queries("q426_double_sweep")(spark, dir)
      .collect().sortBy(_.getAs[Long]("phase"))
    assert(rows.length == 2)
    val (p1, p2) = (rows(0), rows(1))
    assert(p1.getAs[Long]("ecc") <= 4 && p2.getAs[Long]("ecc") <= 4)
    assert(p2.getAs[Long]("ecc") >= p1.getAs[Long]("ecc") ||
      p2.getAs[Long]("ecc") == 4,
      "sweeping from the farthest node cannot shrink the bounded ecc " +
        "unless both are hop-capped")
    assert(p1.getAs[Long]("reached") >= 1 && p2.getAs[Long]("reached") >= 1)
  }
}
