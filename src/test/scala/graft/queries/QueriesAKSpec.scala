package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesAK pack. */
class QueriesAKSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q159 vacuum plan: reclaimable + live heads bounded by versions; heads = customers") {
    val rows = SparkEntry.queries("q159_vacuum_plan")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_reclaimable") + r.getAs[Long]("n_live_heads") <=
        r.getAs[Long]("n_versions"))
    }
    // every customer has exactly one open (head) version
    val nCustomers = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_live_heads")).sum == nCustomers)
  }

  test("q160 grid coverage: all AOIs present; occupied <= total; coverage bounded") {
    val rows = SparkEntry.queries("q160_grid_coverage")(spark, dir).collect()
    val nRegions = spark.read.parquet(s"$dir/region.parquet").count()
    assert(rows.length == nRegions, "zero-coverage AOIs must still appear")
    rows.foreach { r =>
      assert(r.getAs[Long]("occupied_tiles") <= r.getAs[Long]("total_tiles"))
      assert(r.getAs[Long]("coverage_bp") <= 10000L)
    }
    assert(rows.map(_.getAs[Long]("occupied_tiles")).sum > 0)
  }
}
