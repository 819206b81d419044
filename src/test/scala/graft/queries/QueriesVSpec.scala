package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesV pack. */
class QueriesVSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q38 minhash accuracy: estimator error bounded, deciles valid") {
    val rows = SparkEntry.queries("q38_minhash_accuracy")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[Long]("decile")
      assert(d >= 0 && d <= 10)
      val err = r.getAs[Long]("mean_abs_err_bp")
      // 6-component signature quantizes at 1667 bp: mean abs error cannot
      // exceed the full scale
      assert(err >= 0 && err <= 10000)
      assert(r.getAs[Long]("n_pairs") > 0)
    }
  }

  test("q100 nearest AOI: every point assigned exactly once") {
    val rows = SparkEntry.queries("q100_nearest_aoi")(spark, dir).collect()
    assert(rows.nonEmpty)
    val n = graft.Tables.t(spark, dir, "events").count()
    assert(rows.map(_.getAs[Long]("n_points")).sum == n)
    rows.foreach(r => assert(r.getAs[Long]("sum_dist_ukm") >= 0L))
  }
}
