package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariants for the QueriesFC pack (review momentum, field drift,
  * SLO incidents, taste conformity). */
class QueriesFCSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q621 momentum: classes partition the listing population") {
    val out = SparkEntry.queries("q621_review_momentum")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_rising") + r.getAs[Long]("n_falling") +
        r.getAs[Long]("n_flat") == r.getAs[Long]("n_listings"))
      val bp = r.getAs[Long]("rising_bp")
      assert(bp >= 0 && bp <= 10000)
    }
  }

  test("q622 field drift: changed never exceeds both; populations recount") {
    val out = SparkEntry.queries("q622_field_drift")(spark, dir).collect()
    assert(out.nonEmpty)
    val users = Tables.t(spark, dir, "events")
      .where(col("value").isNotNull)
      .select("event_type", "user_id").distinct()
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val (both, nw, gone) = (r.getAs[Long]("n_both"), r.getAs[Long]("n_new"),
        r.getAs[Long]("n_gone"))
      assert(r.getAs[Long]("n_changed") <= both)
      assert(both + nw + gone == users(r.getAs[String]("et")),
        s"${r.getAs[String]("et")} partition")
    }
  }

  test("q623 SLO incidents: streaks and totals are consistent") {
    val r = SparkEntry.queries("q623_slo_incidents")(spark, dir).collect()(0)
    val (inc, mx, tot) = (r.getAs[Long]("n_incidents"),
      r.getAs[Long]("max_streak_days"), r.getAs[Long]("breach_days"))
    assert(mx <= tot)
    assert(inc <= tot)
    if (inc > 0) assert(mx >= 1 && tot >= inc)
  }

  test("q624 conformity: conform never exceeds customers; bp in range") {
    val out = SparkEntry.queries("q624_taste_conformity")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_conform") <= r.getAs[Long]("n_cust"))
      val bp = r.getAs[Long]("conform_bp")
      assert(bp >= 0 && bp <= 10000)
    }
  }
}
