package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesBG pack (decile profile, mutual kNN,
  * degree histogram, behavioral diversity). */
class QueriesBGSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q234 deciles: 10 buckets, shares sum to ~10000, decile 1 dominates") {
    val rows = SparkEntry.queries("q234_decile_profile")(spark, dir).collect()
    assert(rows.map(_.getAs[Int]("decile")).sorted.toSeq == (1 to 10))
    val shares = rows.sortBy(_.getAs[Int]("decile")).map(_.getAs[Long]("rev_share_bp"))
    assert(shares.head == shares.max, "top decile has the largest share")
    val total = shares.sum
    assert(total >= 9990L && total <= 10000L, s"truncation-only loss, got $total")
  }

  test("q235 mutual knn: purity in range, same_label <= pairs") {
    val rows = SparkEntry.queries("q235_mutual_knn")(spark, dir).collect()
    assert(rows.nonEmpty, "buckets of >=2 vectors exist so mutual pairs exist")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_same_label") <= r.getAs[Long]("n_pairs"))
      val bp = r.getAs[Long]("purity_bp")
      assert(bp >= 0L && bp <= 10000L)
    }
  }

  test("q236 degree histogram: bins nonoverlapping, min<=max, power-of-2 ranges") {
    val rows = SparkEntry.queries("q236_degree_histogram")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val l = r.getAs[Int]("log2_deg").toLong
      val lo = r.getAs[Long]("min_deg"); val hi = r.getAs[Long]("max_deg")
      assert(lo <= hi)
      assert(lo >= (1L << l) && hi < (1L << (l + 1)), s"bin $l holds [2^$l, 2^${l + 1})")
    }
  }

  test("q237 diversity: gs in [0,10000), buckets cover all users") {
    val rows = SparkEntry.queries("q237_user_mix_diversity")(spark, dir).collect()
    assert(rows.nonEmpty)
    val users = graft.Tables.t(spark, dir, "events")
      .select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == users)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val m = r.getAs[Long]("mean_gs_bp")
      assert(b >= 0L && b <= 9L)
      assert(m >= b * 1000L && m < (b + 1L) * 1000L)
    }
  }
}
