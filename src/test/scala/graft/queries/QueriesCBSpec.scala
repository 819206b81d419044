package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesCB pack (band join, jackknife, linkage
  * scoring, STR packing). */
class QueriesCBSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q315 band join: gaps within the band, hits ≤ pairs") {
    val rows = SparkEntry.queries("q315_band_range_join")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("avg_gap_micro") <= 7000000L, "band is ±7 days")
      assert(r.getAs[Long]("n_orders_hit") <= r.getAs[Long]("n_pairs"))
    }
  }

  test("q316 jackknife: influences nearly cancel (Σ nh·influence ≈ 0 scale)") {
    val rows = SparkEntry.queries("q316_jackknife")(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val all = r.getAs[Long]("mean_all_hcents")
      val loo = r.getAs[Long]("mean_loo_hcents")
      // removing one of 5 similar strata cannot move the mean by 50%
      assert(math.abs(all - loo) < math.abs(all) / 2 + 10000)
    }
  }

  test("q317 linkage: scores come from the fixed weight lattice") {
    val valid = (for {
      a <- Seq(300, -150); b <- Seq(220, -80); c <- Seq(90, -60)
    } yield a + b + c).toSet
    val rows = SparkEntry.queries("q317_linkage_score")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(valid.contains(r.getAs[Int]("score"))))
  }

  test("q318 STR: Morton layout strictly reduces page MBR area + overlaps") {
    val m = SparkEntry.queries("q318_str_pack")(spark, dir).collect()
      .map(r => r.getAs[String]("layout") ->
        (r.getAs[Long]("sum_area"), r.getAs[Long]("n_overlap_pairs"))).toMap
    assert(m("morton")._1 < m("naive")._1,
      "space-filling-curve pages are spatially tighter")
    assert(m("morton")._2 <= m("naive")._2)
  }
}
