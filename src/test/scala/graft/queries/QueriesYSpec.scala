package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesY pack. */
class QueriesYSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q106 activity matrix: cells partition all events, indices in range") {
    val rows = SparkEntry.queries("q106_activity_matrix")(spark, dir).collect()
    assert(rows.nonEmpty)
    val total = graft.Tables.t(spark, dir, "events").count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    rows.foreach { r =>
      assert(r.getAs[Int]("dow") >= 0 && r.getAs[Int]("dow") <= 6)
      assert(r.getAs[Int]("hour") >= 0 && r.getAs[Int]("hour") <= 23)
    }
  }

  test("q107 growth curve: cumulative reaches the distinct-user universe") {
    val rows = SparkEntry.queries("q107_growth_curve")(spark, dir).collect()
      .sortBy(_.getAs[Long]("day"))
    assert(rows.nonEmpty)
    val users = graft.Tables.t(spark, dir, "events")
      .select("user_id").distinct().count()
    assert(rows.last.getAs[Long]("cum_users") == users)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_new") + r.getAs[Long]("n_returning") == r.getAs[Long]("n_active"))
      assert(r.getAs[Long]("n_new") >= 0 && r.getAs[Long]("n_returning") >= 0)
    }
    // cumulative is monotone non-decreasing
    assert(rows.map(_.getAs[Long]("cum_users")).toSeq == rows.map(_.getAs[Long]("cum_users")).sorted.toSeq)
  }

  test("q108 referential audit: counts match an independent set computation") {
    val rows = SparkEntry.queries("q108_referential_audit")(spark, dir).collect()
      .map(r => r.getAs[String]("rule") ->
        (r.getAs[Long]("n_violations"), r.getAs[Boolean]("pass"))).toMap
    assert(rows.size == 2)
    val oKeys = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val liKeys = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey").collect().map(_.getLong(0))
    assert(rows("orphan_lineitems")._1 == liKeys.count(!oKeys.contains(_)))
    assert(rows("childless_orders")._1 == (oKeys -- liKeys.toSet).size)
    rows.foreach { case (_, (n, pass)) => assert(pass == (n == 0)) }
  }
}
