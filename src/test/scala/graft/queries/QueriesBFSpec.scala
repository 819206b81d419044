package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesBF pack (time-to-convert, abandonment,
  * threshold sweep, leaderboard churn). */
class QueriesBFSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q230 convert: users partitioned, never-bucket has sentinel mean") {
    val rows = SparkEntry.queries("q230_time_to_convert")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[String]("bucket")
      val m = r.getAs[Long]("mean_lat_ms")
      if (b == "e_never") assert(m == -1L) else assert(m >= 0L)
    }
    val viewers = {
      import org.apache.spark.sql.functions._
      graft.Tables.t(spark, dir, "events")
        .where(col("event_type") === "view").select("user_id").distinct().count()
    }
    assert(rows.map(_.getAs[Long]("n_users")).sum == viewers,
      "every user with a view lands in exactly one bucket")
  }

  test("q231 abandonment: bp in range, abandoned <= click days") {
    val rows = SparkEntry.queries("q231_abandonment")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("abandoned_days") <= r.getAs[Long]("click_days"))
      val bp = r.getAs[Long]("abandon_bp")
      assert(bp >= 0L && bp <= 10000L)
    }
  }

  test("q232 sweep: threshold counts are monotone decreasing") {
    val rows = SparkEntry.queries("q232_threshold_sweep")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_pairs")
      val t = Seq("ge_2000", "ge_4000", "ge_6000", "ge_8000").map(r.getAs[Long])
      assert(t.head <= n)
      assert(t.zip(t.tail).forall { case (a, b) => a >= b },
        "a higher threshold can only keep fewer pairs")
    }
  }

  test("q233 drift: overlap within [0,5], jaccard consistent") {
    val rows = SparkEntry.queries("q233_topk_drift")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getAs[Long]("n_common")
      assert(c >= 0L && c <= 5L)
      assert(r.getAs[Long]("jaccard_bp") == c * 10000L / (10L - c))
    }
  }
}
