package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesZ pack. */
class QueriesZSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q110 trajectory: hop accounting vs the event counts, bounds sane") {
    val rows = SparkEntry.queries("q110_trajectory")(spark, dir).collect()
    assert(rows.nonEmpty)
    val perUser = spark.read.parquet(s"$dir/events.parquet")
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      assert(r.getAs[Long]("n_hops") == perUser(u) - 1, "hops = points - 1")
      assert(r.getAs[Long]("max_ukm") <= r.getAs[Long]("total_ukm"))
      // half Earth circumference ≈ 20015 km = 2.0015e10 micro-km per hop max
      assert(r.getAs[Long]("max_ukm") <= 20016L * 1000000L)
    }
  }
}
