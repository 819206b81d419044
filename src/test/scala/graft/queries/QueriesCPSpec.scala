package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesCP pack (power analysis, occupancy,
  * distinct cube, share of parent). */
class QueriesCPSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q371 power: n maximized near p=0.5, zero at degenerate rates") {
    val rows = SparkEntry.queries("q371_power_analysis")(spark, dir).collect()
    assert(rows.nonEmpty)
    // n = z²·2·p(1−p)/Δ² peaks at p(1−p)=0.25 → max ≈ 39240/4 ≈ 9810·… bound
    rows.foreach { r =>
      val n = r.getAs[Long]("n_required")
      assert(n >= 0 && n <= 9811, "p(1-p) ≤ 1/4 bounds the requirement")
    }
  }

  test("q372 occupancy: bounded by capacity; nights positive") {
    val rows = SparkEntry.queries("q372_occupancy")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("occupancy_bp") <= 10000,
        "a listing-day can be booked at most once after dedup")
      assert(r.getAs[Long]("booked_nights") >= r.getAs[Long]("active_listings"))
    }
  }

  test("q373 distinct cube: the (all, all) cell dominates every slice") {
    val rows = SparkEntry.queries("q373_distinct_cube")(spark, dir).collect()
    val total = rows.find(r => r.getAs[String]("event_type") == "(all)"
      && r.getAs[String]("dow") == "(all)").get.getAs[Long]("distinct_users")
    rows.foreach(r => assert(r.getAs[Long]("distinct_users") <= total))
    assert(rows.count(_.getAs[String]("dow") == "(all)") >= 6,
      "per-type subtotal rows present")
  }

  test("q374 share of parent: shares sum to ~100% within each region") {
    val rows = SparkEntry.queries("q374_share_of_parent")(spark, dir).collect()
    rows.groupBy(_.getAs[Int]("n_regionkey")).foreach { case (_, g) =>
      val s = g.map(_.getAs[Long]("share_of_region_bp")).sum
      assert(s > 10000 - g.length && s <= 10000,
        "floor rounding loses at most 1 bp per nation")
    }
  }
}
