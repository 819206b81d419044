package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesDU pack (copula, keyset pagination, FFD,
  * winnowing). */
class QueriesDUSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q491 copula: monotone in both margins, diagonal near uniform") {
    val rows = SparkEntry.queries("q491_copula_grid")(spark, dir).collect()
    assert(rows.length == 9)
    val m = rows.map(r => (r.getAs[Long]("ubp"), r.getAs[Long]("vbp")) ->
      r.getAs[Long]("c_bp")).toMap
    // C(u,v) is non-decreasing in each argument
    for (u <- Seq(2500L, 5000L); v <- Seq(2500L, 5000L, 7500L))
      assert(m((u, v)) <= m((u + 2500, v)))
    for (u <- Seq(2500L, 5000L, 7500L); v <- Seq(2500L, 5000L))
      assert(m((u, v)) <= m((u, v + 2500)))
    rows.foreach { r =>
      // NOTE: the y margin (lines per order) is heavily tied, so the
      // EMPIRICAL marginal mass at a tied quantile exceeds its nominal
      // level — nominal Frechet bounds don't apply. What always holds:
      val (u, c) = (r.getAs[Long]("ubp"), r.getAs[Long]("c_bp"))
      assert(c >= 0 && c <= 10000)
      assert(c <= u + 100,
        "C(u,v) <= P(X <= qx_u) = nominal u (x margin is tie-free cents)")
    }
  }

  test("q492 keyset: both strategies fetch the identical page") {
    val r = SparkEntry.queries("q492_keyset_pagination")(spark, dir)
      .collect().head
    assert(r.getAs[Long]("offset_rows") == 50)
    assert(r.getAs[Long]("keyset_rows") == 50)
    assert(r.getAs[Long]("matching") == 50,
      "keyset predicate must reproduce the offset page exactly")
  }

  test("q493 FFD: conservation and capacity respected") {
    val r = SparkEntry.queries("q493_ffd_packing")(spark, dir).collect().head
    assert(r.getAs[Long]("placed") + r.getAs[Long]("unplaced") == 200)
    assert(r.getAs[Long]("bins_used") <= 10)
    assert(r.getAs[Long]("min_load") <= r.getAs[Long]("max_load"))
    // FFD into 10 bins at 110% of the even split places nearly all items
    assert(r.getAs[Long]("placed") >= 180)
  }

  test("q494 winnowing: fingerprint counts coherent") {
    val rows = SparkEntry.queries("q494_winnowing")(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("shared_fps") <= r.getAs[Long]("n_fps"))
      assert(r.getAs[Long]("max_df") >= 1)
      if (r.getAs[Long]("shared_fps") > 0)
        assert(r.getAs[Long]("shared_pairs") >= r.getAs[Long]("shared_fps"),
          "each shared fingerprint contributes at least one pair")
    }
  }
}
