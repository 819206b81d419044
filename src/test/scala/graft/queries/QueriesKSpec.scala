package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Structural invariants of the QueriesK pack on the real testdata. */
class QueriesKSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q88 above-avg: share is a strict minority under any non-degenerate spread") {
    val rows = SparkEntry.queries("q88_above_avg")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nAbove, nSeg, bp) =
        (r.getAs[Long]("n_above"), r.getAs[Long]("n_seg"), r.getAs[Long]("share_bp"))
      assert(nAbove > 0 && nAbove < nSeg)
      assert(bp == nAbove * 10000 / nSeg)
    }
  }

  test("q90 gap fill: spine covers [first,last] day; filled + observed = days") {
    val rows = SparkEntry.queries("q90_gap_fill")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_days") ==
        r.getAs[Long]("n_observed") + r.getAs[Long]("n_filled"))
      assert(r.getAs[Long]("n_observed") >= 1)
      assert(r.getAs[Double]("sum_filled") >= 0 || r.getAs[Long]("n_days") > 0)
    }
  }

  test("q93 funnel: monotone non-increasing stages, conversion consistent") {
    val rows = SparkEntry.queries("q93_funnel")(spark, dir).collect().sortBy(_.getAs[Long]("stage"))
    assert(rows.map(_.getAs[String]("name")).toSeq ==
      Seq("view", "click_after_view", "purchase_after_click"))
    val ns = rows.map(_.getAs[Long]("n_users"))
    assert(ns.zip(ns.tail).forall { case (a, b) => b <= a })
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("conv_bp") ==
          b.getAs[Long]("n_users") * 10000 / a.getAs[Long]("n_users"))
      case _ =>
    }
    assert(rows.head.getAs[Long]("conv_bp") == 10000L)
  }

  test("q94 cohort retention: offset 0 is full retention, later offsets bounded") {
    val rows = SparkEntry.queries("q94_cohort_retention")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (off, nA, size, bp) = (r.getAs[Long]("offset"), r.getAs[Long]("n_active"),
        r.getAs[Long]("cohort_size"), r.getAs[Long]("retention_bp"))
      assert(nA <= size)
      assert(bp == nA * 10000 / size)
      if (off == 0) assert(nA == size) // every user is active in their cohort week
    }
  }
}
