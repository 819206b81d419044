package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesDO pack (3-D skyline, learning curve,
  * design effect, savings merges). */
class QueriesDOSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q467 3-D skyline: brute-force domination check agrees") {
    val row = SparkEntry.queries("q467_skyline3d")(spark, dir).collect().head
    val pts = graft.Tables.t(spark, dir, "lineitem")
      .selectExpr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS p",
        "CAST(l_quantity AS BIGINT) AS q",
        "CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS dd")
      .groupBy("p", "q", "dd").count()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val sky = pts.filter { case (p, q, d, _) =>
      !pts.exists { case (p2, q2, d2, _) =>
        p2 <= p && q2 >= q && d2 >= d && (p2 < p || q2 > q || d2 > d)
      }
    }
    assert(row.getAs[Long]("sky_points") == sky.length.toLong,
      s"expected ${sky.length} skyline points")
    assert(row.getAs[Long]("sky_rows") == sky.map(_._4).sum)
  }

  test("q468 learning curve: harness accounting holds at every fraction") {
    val rows = SparkEntry.queries("q468_learning_curve")(spark, dir)
      .collect().sortBy(_.getAs[Long]("train_pct"))
    assert(rows.length == 3)
    val n = rows.map(_.getAs[Long]("n_test")).distinct
    assert(n.length == 1, "same held-out set at every fraction")
    assert(n.head > 0)
    rows.foreach { r =>
      assert(r.getAs[Long]("hits") <= r.getAs[Long]("n_test"))
      val bp = r.getAs[Long]("acc_bp")
      // NOTE (measured): the synthetic embeddings' label column is NOT
      // centroid-separable out of sample — held-out accuracy sits at the
      // 1-in-10 chance level regardless of train size. The harness is the
      // operator under test; the flat curve is the (correct) finding.
      assert(bp >= 0 && bp <= 10000)
      assert(bp == r.getAs[Long]("hits") * 10000 / n.head)
    }
  }

  test("q469 design effect: ICC in [-1,1], DEFF >= ~1, eff_n <= n") {
    val r = SparkEntry.queries("q469_design_effect")(spark, dir)
      .collect().head
    val icc = r.getAs[Long]("icc_micro")
    assert(icc >= -1000000 && icc <= 1000000)
    if (icc >= 0) {
      assert(r.getAs[Long]("deff_micro") >= 1000000)
      assert(r.getAs[Long]("eff_n") <= r.getAs[Long]("n"))
    }
    assert(r.getAs[Long]("ssb_milli") >= 0)
    assert(r.getAs[Long]("ssw_milli") >= 0)
  }

  test("q470 savings: triangle inequality keeps savings non-negative") {
    val rows = SparkEntry.queries("q470_savings_merge")(spark, dir).collect()
    assert(rows.length == 10)
    val sv = rows.map(_.getAs[Long]("saving"))
    assert(sv.sorted.reverse.sameElements(sv))
    rows.foreach { r =>
      // floor(sqrt) can break the triangle inequality by at most 2
      assert(r.getAs[Long]("saving") >= -2)
      assert(r.getAs[Long]("dij") >= 0)
      assert(r.getAs[Long]("i") < r.getAs[Long]("j"))
    }
  }
}
