package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesCZ pack (Bellman–Ford, newsvendor, Chao1,
  * MTBF reliability bins). */
class QueriesCZSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q411 Bellman-Ford: source at distance 0, distances positive elsewhere") {
    val rows = SparkEntry.queries("q411_bellman_ford")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    val dists = rows.map(_.getAs[Long]("dist"))
    assert(dists.head == 0L, "nearest node is the source itself at dist 0")
    assert(dists.count(_ == 0L) == 1, "exactly one source")
    assert(dists.sorted.sameElements(dists), "output ordered by distance")
    assert(dists.tail.forall(d => d >= 1 && d <= 4 * 500),
      "4 rounds of <=500-weight edges bound every reported distance")
  }

  test("q412 newsvendor: q* is the 0.75 fractile, cost splits are consistent") {
    val rows = SparkEntry.queries("q412_newsvendor")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("total_cost") ==
        r.getAs[Long]("under_cost") + r.getAs[Long]("over_cost"))
      assert(r.getAs[Long]("qstar") > 0 && r.getAs[Long]("n_days") > 0)
      // at the 3:1 critical ratio the underage side cannot dominate
      // arbitrarily: at least a quarter of days sit at or above q*.
    }
    // recompute one brand's fractile directly
    import org.apache.spark.sql.functions._
    val dem = graft.Tables.t(spark, dir, "lineitem")
      .join(graft.Tables.t(spark, dir, "part"),
        col("l_partkey") === col("p_partkey"))
      .selectExpr("p_brand",
        "unix_millis(CAST(l_shipdate AS TIMESTAMP)) DIV 86400000 AS d",
        "CAST(l_quantity AS BIGINT) AS q")
      .groupBy("p_brand", "d").agg(sum("q").as("dd"))
      .where(col("p_brand") === rows.head.getAs[String]("p_brand"))
      .select("dd").collect().map(_.getLong(0)).sorted
    val n = dem.length
    val expect = dem((3 * n + 3) / 4 - 1) // smallest rank with 4rn>=3n
    assert(rows.head.getAs[Long]("qstar") == expect)
  }

  test("q413 Chao1: estimate >= observed vocabulary, coverage in bounds") {
    val rows = SparkEntry.queries("q413_chao1")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("chao1") >= r.getAs[Long]("vocab"),
        "unseen-species estimate can only add to the observed vocabulary")
      val cov = r.getAs[Long]("coverage_bp")
      assert(cov >= 0 && cov <= 10000)
      assert(r.getAs[Long]("f1") + r.getAs[Long]("f2") <=
        r.getAs[Long]("vocab"))
      assert(r.getAs[Long]("n_tok") >= r.getAs[Long]("vocab"))
    }
  }

  test("q414 MTBF: bins partition the gaps, means sit inside their bin") {
    val rows = SparkEntry.queries("q414_mtbf")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (b, gaps, users, sum, mean) = (r.getAs[Long]("b"),
        r.getAs[Long]("gaps"), r.getAs[Long]("users"),
        r.getAs[Long]("sum_gap_ms"), r.getAs[Long]("mean_gap_ms"))
      assert(users <= gaps, "a user contributes at least one gap per count")
      assert(mean == sum / gaps)
      // bin b holds gap-minutes g with length(bin(g+1))-1 == b,
      // i.e. g+1 in [2^b, 2^(b+1)): check the mean maps into bin b or
      // its neighbors (mean of values in a bin stays in the bin).
      val gMin = (mean / 60000) + 1
      assert(63 - java.lang.Long.numberOfLeadingZeros(gMin) == b,
        s"mean gap must fall in its own log2 bin (b=$b mean=$mean)")
    }
  }
}
