package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesDP pack (temporal reach, LOO leaderboard,
  * linkage attack, OBF looks). */
class QueriesDPSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q471 temporal reach: time-respecting <= static, bp bounded") {
    val rows = SparkEntry.queries("q471_temporal_reach")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("reach_t") <= r.getAs[Long]("reach_s"),
        "adding the time constraint cannot add reachable nodes")
      val bp = r.getAs[Long]("temporal_bp")
      assert(bp == -1 || (bp >= 0 && bp <= 10000))
    }
  }

  test("q472 LOO leaderboard: shares and margins in bounds") {
    val rows = SparkEntry.queries("q472_loo_leaderboard")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("top1") >= r.getAs[Long]("top2"))
      assert(r.getAs[Long]("top1") + r.getAs[Long]("top2") <=
        r.getAs[Long]("total"))
      assert(r.getAs[Long]("share1_bp") <= 10000)
      val m = r.getAs[Long]("margin_bp")
      assert(m >= 0 && m <= 10000)
    }
  }

  test("q473 linkage attack: audit accounting holds") {
    val r = SparkEntry.queries("q473_linkage_attack")(spark, dir)
      .collect().head
    assert(r.getAs[Long]("correct") <= r.getAs[Long]("attacked"))
    assert(r.getAs[Long]("success_bp") >= 0 &&
      r.getAs[Long]("success_bp") <= 10000)
    assert(r.getAs[Long]("chance_bp") >= 0 &&
      r.getAs[Long]("chance_bp") <= 10000)
    // measured: the half-profiles drift (dominant type is noisy), so the
    // blocked attack does NOT beat chance here — the audit reports a low
    // re-identification risk, which is the point of running it
  }

  test("q474 OBF: boundaries descend, decision consistent") {
    val rows = SparkEntry.queries("q474_obf_looks")(spark, dir)
      .collect().sortBy(_.getAs[Long]("look"))
    assert(rows.length == 3)
    val b = rows.map(_.getAs[Long]("boundary_micro"))
    assert(b.zip(b.tail).forall { case (x, y) => y < x },
      "OBF boundaries shrink across looks")
    rows.foreach { r =>
      assert(r.getAs[Long]("c1") <= r.getAs[Long]("n1"))
      assert(r.getAs[Long]("c0") <= r.getAs[Long]("n0"))
      if (r.getAs[Long]("z2_micro") == -1L)
        assert(!r.getAs[Boolean]("reject"))
    }
    val ns = rows.map(r => r.getAs[Long]("n1") + r.getAs[Long]("n0"))
    assert(ns.zip(ns.tail).forall { case (x, y) => y >= x },
      "sample accumulates across looks")
  }
}
