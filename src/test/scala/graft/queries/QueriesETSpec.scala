package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants for the QueriesET pack (HRW hashing, seasonal decompose,
  * universe sampling, equi-depth histogram). */
class QueriesETSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q590 HRW: minimal disruption — moved fraction is near 1/9, far " +
      "below mod-N's ~8/9 reshuffle") {
    val r = SparkEntry.queries("q590_rendezvous_hashing")(spark, dir)
      .collect().head
    val bp = r.getAs[Long]("moved_bp")
    assert(bp > 400 && bp < 2200, s"moved_bp $bp ≈ 1111 expected")
    assert(r.getAs[Long]("moved") <= r.getAs[Long]("n_keys"))
    assert(r.getAs[Long]("max_load8") >= r.getAs[Long]("min_load8"))
    val nKeys = graft.Tables.t(spark, dir, "customer").count()
    assert(r.getAs[Long]("n_keys") == nKeys)
  }

  test("q591 seasonal: per-dow seasonal components of a detrended " +
      "series are mean-ish (they sum near zero across dows)") {
    val out = SparkEntry.queries("q591_seasonal_dow")(spark, dir).collect()
    assert(out.length == 7)
    val sumSeason = out.map(_.getAs[Long]("seasonal_milli")).sum
    // detrended means per dow must roughly cancel (window mean removal);
    // floor-milli leaves ≤ 7 milli slack per dow
    assert(math.abs(sumSeason) < out.map(_.getAs[Long]("n_days")).max * 7 + 7000,
      s"seasonal components approx cancel: $sumSeason")
    out.foreach(r => assert(r.getAs[Long]("mean_abs_resid_milli") >= 0))
  }

  test("q592 universe sampling: scale-up identity holds and the " +
      "estimate is unbiased enough to land within 50%") {
    val r = SparkEntry.queries("q592_universe_sample")(spark, dir)
      .collect().head
    assert(r.getAs[Long]("est_rows") % 16 == 0)
    assert(r.getAs[Long]("row_err_bp") ==
      math.abs(r.getAs[Long]("est_rows") - r.getAs[Long]("exact_rows")) *
        10000 / r.getAs[Long]("exact_rows"))
    assert(r.getAs[Long]("row_err_bp") < 5000,
      "1/16 key-universe sample estimates the join within 50%")
  }

  test("q593 equi-depth: buckets partition the orders, boundaries are " +
      "nondecreasing, and each bucket holds ≈ n/10") {
    val out = SparkEntry.queries("q593_equidepth_histogram")(spark, dir)
      .collect().sortBy(_.getAs[Long]("k"))
    assert(out.length == 10)
    val n = graft.Tables.t(spark, dir, "orders").count()
    assert(out.map(_.getAs[Long]("bucket_count")).sum == n)
    val bs = out.map(_.getAs[Long]("boundary"))
    assert(bs.zip(bs.tail).forall { case (a, b) => a <= b })
    // equi-depth on a near-continuous value: every bucket within 25%
    out.foreach { r =>
      assert(r.getAs[Long]("dev_bp") < 2500,
        s"bucket ${r.getAs[Long]("k")} dev ${r.getAs[Long]("dev_bp")}")
    }
  }
}
