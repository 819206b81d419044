package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesCS pack (AMS/F2 sketch, Wilson LCB,
  * LRU miss-ratio curve, PSI drift). */
class QueriesCSSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q383 AMS F2: estimators positive, within sketch error envelope") {
    val r = SparkEntry.queries("q383_ams_f2")(spark, dir).collect()(0)
    assert(r.getAs[Long]("exact_f2") > 0)
    assert(r.getAs[Long]("est_mean") > 0)
    assert(r.getAs[Long]("est_median") > 0)
    // 16 counters → relative std ~ sqrt(2/16) ≈ 35%; 100% is a hard fence
    assert(r.getAs[Long]("err_mean_bp") < 10000)
    assert(r.getAs[Long]("err_median_bp") < 10000)
  }

  test("q384 Wilson LCB: bound below raw share, ranks are permutations") {
    val rows = SparkEntry.queries("q384_wilson_lcb")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // LCB ≤ p̂ always (shrinks toward 0 for small n)
      assert(r.getAs[Long]("lcb_micro") <= r.getAs[Long]("raw_bp") * 100)
      assert(r.getAs[Long]("lcb_micro") >= 0)
      assert(r.getAs[Long]("pos") <= r.getAs[Long]("n"))
    }
    val n = rows.length
    assert(rows.map(_.getAs[Int]("rank_lcb")).sorted.toSeq == (1 to n))
    assert(rows.map(_.getAs[Int]("rank_raw")).sorted.toSeq == (1 to n))
  }

  test("q385 LRU MRC: hit rate monotone in capacity, totals consistent") {
    val rows = SparkEntry.queries("q385_lru_mrc")(spark, dir).collect()
    assert(rows.length == 5)
    val byCap = rows.sortBy(_.getAs[Long]("cap"))
    val hits = byCap.map(_.getAs[Long]("hits"))
    assert(hits.zip(hits.tail).forall { case (a, b) => a <= b },
      "a larger LRU cache can only hit more")
    val reuses = rows.map(_.getAs[Long]("reuses")).distinct
    assert(reuses.length == 1, "reuse count independent of capacity")
    rows.foreach { r =>
      assert(r.getAs[Long]("hits") <= r.getAs[Long]("reuses"))
      assert(r.getAs[Long]("hit_bp") <= 10000)
    }
  }

  test("q386 PSI: non-negative per type, counts cover both periods") {
    val rows = SparkEntry.queries("q386_psi_drift")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("psi_pico") >= 0,
        "PSI is a sum of (p-q)ln(p/q) terms, each ≥ 0")
      assert(r.getAs[Long]("nr") > 0 && r.getAs[Long]("nc") > 0)
    }
  }
}
