package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesCF pack (rendezvous hashing, pre-agg
  * pushdown, crosstab, NULL semantics). */
class QueriesCFSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q331 HRW: moved share near 1/17, far below mod-hash churn") {
    val r = SparkEntry.queries("q331_consistent_hash")(spark, dir).collect()(0)
    val bp = r.getAs[Long]("moved_bp")
    // expectation is 10000/17 ≈ 588 bp; mod-rehash would be ~9412 bp
    assert(bp < 2500, s"rendezvous moves a small minority (got $bp bp)")
    assert(r.getAs[Long]("n_moved") > 0, "some keys must move")
  }

  test("q332 pre-agg pushdown matches naive join-then-agg") {
    import org.apache.spark.sql.functions._
    val pushed = SparkEntry.queries("q332_preagg_pushdown")(spark, dir).collect()
    val naive = spark.read.parquet(s"$dir/lineitem.parquet")
      .selectExpr("l_orderkey",
        "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents")
      .join(spark.read.parquet(s"$dir/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .join(spark.read.parquet(s"$dir/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey").agg(sum("cents").as("rev_cents"))
      .collect().map(r => r.getAs[Int]("c_nationkey") -> r.getAs[Long]("rev_cents")).toMap
    pushed.foreach { r =>
      assert(r.getAs[Long]("rev_cents") == naive(r.getAs[Int]("c_nationkey")))
    }
  }

  test("q333 crosstab: row sums equal event counts per type") {
    val rows = SparkEntry.queries("q333_crosstab")(spark, dir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(r =>
      (0 to 6).map(d => r.getAs[Long](d.toString)).sum).sum
    val expected = spark.read.parquet(s"$dir/events.parquet").count()
    assert(total == expected, "crosstab partitions every event exactly once")
  }

  test("q334 NULL semantics: TRUE+FALSE+UNKNOWN partitions all rows") {
    val r = SparkEntry.queries("q334_null_semantics")(spark, dir).collect()(0)
    val n = r.getAs[Long]("n_rows")
    assert(r.getAs[Long]("p_true") + r.getAs[Long]("p_false")
      + r.getAs[Long]("p_unknown") == n)
    // IN with a NULL element is never FALSE: true + unknown = all rows
    assert(r.getAs[Long]("in_true") + r.getAs[Long]("in_unknown") == n)
    // null-safe equality with NULL counts exactly the NULL rows = UNKNOWNs
    assert(r.getAs[Long]("nullsafe_null") == r.getAs[Long]("p_unknown"))
  }
}
