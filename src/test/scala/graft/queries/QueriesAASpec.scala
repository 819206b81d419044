package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesAA pack. */
class QueriesAASpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q118 dup trend: distinct <= events, bp consistent") {
    val rows = SparkEntry.queries("q118_dup_trend")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, d) = (r.getAs[Long]("n_events"), r.getAs[Long]("n_distinct"))
      assert(d >= 1 && d <= n)
      assert(r.getAs[Long]("dup_bp") == (n - d) * 10000 / n)
    }
  }

  test("q119 column profile: five columns, keys unique, no nulls in generator data") {
    val rows = SparkEntry.queries("q119_column_profile")(spark, dir).collect()
    assert(rows.length == 5)
    val byCol = rows.map(r => r.getAs[String]("col_name") ->
      (r.getAs[Long]("n_null"), r.getAs[Long]("n_distinct"))).toMap
    val nOrders = spark.read.parquet(s"$dir/orders.parquet").count()
    assert(byCol("o_orderkey") == ((0L, nOrders)), "primary key: no nulls, all distinct")
    assert(byCol("o_orderstatus")._2 <= 3, "status domain is tiny")
    rows.foreach(r => assert(r.getAs[Long]("n_null") == 0))
  }
}
