package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesAZ pack (lag features, negative sampling,
  * calibration, top-k share). */
class QueriesAZSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q206 lag features: lag columns consistent with row order") {
    val rows = SparkEntry.queries("q206_lag_features")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, g) =>
      val sorted = g.sortBy(r => (r.getAs[Long]("ts_ms"), r.getAs[Long]("event_id")))
      sorted.zipWithIndex.foreach { case (r, i) =>
        if (i == 0) assert(r.isNullAt(r.fieldIndex("lag1")))
        else assert(r.getAs[Long]("lag1") == sorted(i - 1).getAs[Long]("vc"))
        if (i < 2) assert(r.isNullAt(r.fieldIndex("lag2")))
        else {
          assert(r.getAs[Long]("lag2") == sorted(i - 2).getAs[Long]("vc"))
          val rm = (sorted(i - 2).getAs[Long]("vc") + sorted(i - 1).getAs[Long]("vc") +
            r.getAs[Long]("vc")) * 1000 / 3
          assert(r.getAs[Long]("rmean3_milli") == rm)
        }
      }
    }
  }

  test("q207 negative sampling: 2 negatives per positive, collisions plausible") {
    val rows = SparkEntry.queries("q207_negative_sampling")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_neg") == 2 * r.getAs[Long]("n_pos"))
      val bp = r.getAs[Long]("collision_bp")
      assert(bp >= 0L && bp < 5000L, s"collision rate $bp should be well below 50%")
    }
  }

  test("q208 calibration: hash scores are uniform-ish, bins cover 0-9") {
    val rows = SparkEntry.queries("q208_calibration")(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("bin")).sorted.toSeq == (0L to 9L))
    val n = rows.map(_.getAs[Long]("n")).sum
    rows.foreach { r =>
      val share = r.getAs[Long]("n").toDouble / n
      assert(share > 0.05 && share < 0.15, s"bin share $share")
      val ms = r.getAs[Long]("mean_score_bp")
      assert(ms >= r.getAs[Long]("bin") * 1000 && ms < (r.getAs[Long]("bin") + 1) * 1000)
      // the score is pure hash noise: actual rate must not correlate
      // perfectly with score — just bound it
      assert(r.getAs[Long]("actual_bp") <= 10000L)
    }
  }

  test("q209 top-k share: share in (0, 10000], top3 <= total, recompute matches") {
    val rows = SparkEntry.queries("q209_topk_share")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("top3_cents") <= r.getAs[Long]("total_cents"))
      val bp = r.getAs[Long]("top3_share_bp")
      assert(bp > 0L && bp <= 10000L)
      if (r.getAs[Long]("n_customers") <= 3)
        assert(bp == 10000L, "with <=3 customers the top-3 is everything")
    }
    // recompute one nation in memory
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("o_custkey", "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .selectExpr("c_custkey", "CAST(c_nationkey AS BIGINT) AS nk")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val byCust = orders.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val nk0 = rows.head.getAs[Long]("nk")
    val revs = byCust.toSeq.filter { case (c, _) => cust.get(c).contains(nk0) }
    val total = revs.map(_._2).sum
    val top3 = revs.sortBy { case (c, v) => (-v, c) }.take(3).map(_._2).sum
    assert(rows.head.getAs[Long]("total_cents") == total)
    assert(rows.head.getAs[Long]("top3_cents") == top3)
  }
}
