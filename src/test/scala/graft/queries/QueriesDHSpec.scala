package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesDH pack (map ops, polyline simplify,
  * bitemporal as-of, DP histogram). */
class QueriesDHSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q439 map ops: boosted values even, threshold respected") {
    val rows = SparkEntry.queries("q439_map_ops")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("boosted") % 2 == 0)
      assert(r.getAs[Long]("boosted") >= 6, "kept entries had count >= 3")
      assert(r.getAs[Long]("n_types") >= 1 && r.getAs[Long]("n_types") <= 5)
    }
  }

  test("q440 simplify: kept count between endpoints and full polyline") {
    val rows = SparkEntry.queries("q440_polyline_simplify")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, k) = (r.getAs[Long]("n_points"), r.getAs[Long]("n_kept"))
      assert(k >= 2 && k <= 4, "depth-2 DP keeps 2..4 points")
      assert(k <= n)
      assert(r.getAs[Long]("kept_r2") <= 2)
      assert(r.getAs[Long]("max_dev2") >= 0)
      if (r.getAs[Long]("kept_r1") == 0)
        assert(r.getAs[Long]("kept_r2") == 0,
          "round 2 only runs below a kept round-1 split")
    }
  }

  test("q441 bitemporal: buckets partition keys, state is non-empty") {
    val rows = SparkEntry.queries("q441_bitemporal_asof")(spark, dir).collect()
    assert(rows.nonEmpty)
    val users = graft.Tables.t(spark, dir, "events")
      .select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_keys")).sum <= users,
      "a key reconstructs at most one state row")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_keys") > 0)
      assert(r.getAs[Long]("bucket") >= 0 && r.getAs[Long]("bucket") <= 9)
    }
  }

  test("q442 DP: noisy totals differ by exactly the summed noise, L1 sane") {
    val rows = SparkEntry.queries("q442_dp_histogram")(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val l1 = r.getAs[Long]("l1_error")
      assert(l1 >= 0)
      assert(r.getAs[Long]("max_abs_noise") <= 20,
        "Laplace(1) tail beyond 20 needs u within e^-20 of the edge — " +
          "impossible on the 1e-6 hash grid")
      assert(math.abs(r.getAs[Long]("noisy_total") -
        r.getAs[Long]("true_total")) <= l1)
    }
  }
}
