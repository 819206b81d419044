package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesAE pack (sketch-planning ops). */
class QueriesAESpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q138 CMS join estimate: one-sided (est >= exact) and exact size recomputes") {
    val r = SparkEntry.queries("q138_cms_join_estimate")(spark, dir).collect().head
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy("o_custkey").count().collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val events = graft.Tables.t(spark, dir, "events")
      .groupBy("user_id").count().collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val exact = orders.keysIterator
      .map(k => orders(k) * events.getOrElse(k, 0L)).sum
    assert(r.getAs[Long]("exact_size") == exact)
    assert(r.getAs[Long]("cms_est") >= exact, "CMS inner product never underestimates")
    assert(r.getAs[Long]("over_bp") >= 10000L)
  }

  test("q139 seasonal index: weighted mean of indexes ~ 1 (micro, within rounding)") {
    val rows = SparkEntry.queries("q139_seasonal_index")(spark, dir).collect()
    assert(rows.length == 7)
    val totN = rows.map(_.getAs[Long]("n")).sum
    // sum over dows of n * index ≈ totN * 1e6 (each floor loses < 1 micro)
    val acc = rows.map(r => r.getAs[Long]("n") * r.getAs[Long]("index_micro")).sum
    assert(math.abs(acc - totN * 1000000L) < totN, s"acc=$acc totN=$totN")
  }

  test("q140 co-occurrence: supports recompute on a sampled pair; lift formula holds") {
    val rows = SparkEntry.queries("q140_cooccurrence")(spark, dir).collect()
    assert(rows.length == 15)
    val lp = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nOrders = lp.map(_._1).distinct.length.toLong
    rows.take(3).foreach { r =>
      val p1 = r.getAs[Long]("p1"); val p2 = r.getAs[Long]("p2")
      val o1 = lp.filter(_._2 == p1).map(_._1).toSet
      val o2 = lp.filter(_._2 == p2).map(_._1).toSet
      assert(r.getAs[Long]("support") == (o1 & o2).size.toLong)
      assert(r.getAs[Long]("sup_a") == o1.size.toLong)
      assert(r.getAs[Long]("sup_b") == o2.size.toLong)
      val lift = r.getAs[Long]("support").toDouble * nOrders.toDouble /
        o1.size.toDouble / o2.size.toDouble
      assert(r.getAs[Long]("lift_micro") == math.floor(lift * 1000000).toLong)
    }
  }

  test("q141 zone-map pruning: scanned+skipped = bins; no matched row in a skipped bin") {
    val rows = SparkEntry.queries("q141_zonemap_prune")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_scanned") + r.getAs[Long]("n_skipped") ==
        r.getAs[Long]("n_bins"))
      assert(r.getAs[Long]("fp_bins") <= r.getAs[Long]("n_scanned"))
    }
    // global: matched rows must equal a direct count (no pruning loss)
    val direct = spark.read.parquet(s"$dir/documents.parquet")
      .where("n_chars BETWEEN 200 AND 400").count()
    assert(rows.map(_.getAs[Long]("rows_matched")).sum == direct)
  }

  test("q142 HLL set ops: estimates within 20% of exact; inclusion-exclusion consistent") {
    val r = SparkEntry.queries("q142_hll_setops")(spark, dir).collect().head
    def close(est: Long, exact: Long): Boolean =
      math.abs(est - exact) <= math.max(3L, exact / 5)
    assert(close(r.getAs[Long]("est_click"), r.getAs[Long]("exact_click")))
    assert(close(r.getAs[Long]("est_purchase"), r.getAs[Long]("exact_purchase")))
    assert(r.getAs[Long]("est_both") ==
      r.getAs[Long]("est_click") + r.getAs[Long]("est_purchase") - r.getAs[Long]("est_union"))
    assert(close(r.getAs[Long]("est_both"), r.getAs[Long]("exact_both")))
  }
}
