package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesBX pack (CC histogram, PPS sampling,
  * bottom-k sketch). */
class QueriesBXSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q300 CC histogram: sizes >= 2, components positive") {
    val rows = SparkEntry.queries("q300_cc_size_histogram")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("component_size") >= 2L,
        "every labeled node has at least one edge")
      assert(r.getAs[Long]("n_components") >= 1L)
    }
  }

  test("q301 PPS: exactly k draws, weights proportional, cum increasing") {
    val rows = SparkEntry.queries("q301_pps_sample")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_.getAs[Long]("n_draws")).sum == 20L,
      "the k multiples of tot/k are each covered exactly once")
    val cums = rows.map(_.getAs[Long]("cum_cp")).toSeq
    assert(cums == cums.sorted)
  }

  test("q302 bottom-k: per segment exactly 10, hashes ascending (mergeable)") {
    val rows = SparkEntry.queries("q302_bottomk_sample")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("c_mktsegment")).foreach { case (_, g) =>
      assert(g.length == 10)
      val hs = g.sortBy(_.getAs[Long]("rk")).map(_.getAs[Long]("h")).toSeq
      assert(hs == hs.sorted)
    }
  }
}
