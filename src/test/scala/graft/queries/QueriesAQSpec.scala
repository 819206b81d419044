package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesAQ pack. */
class QueriesAQSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q174 forecast: matches an in-memory OLS closed form; plausible magnitude") {
    val ev = graft.Tables.t(spark, dir, "events")
      .selectExpr("event_type", "(ts DIV 1000000) DIV 86400000 AS day")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val d0 = ev.map(_._2).min
    val rows = SparkEntry.queries("q174_trend_forecast")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val daily = ev.filter(_._1 == r.getAs[String]("event_type"))
        .groupBy(e => e._2 - d0).view.mapValues(_.length.toLong).toSeq.sortBy(_._1)
      val n = daily.length.toLong
      val sx = daily.map(_._1).sum
      val sy = daily.map(_._2).sum
      val sxx = daily.map(d => d._1 * d._1).sum
      val sxy = daily.map(d => d._1 * d._2).sum
      val dnext = daily.map(_._1).max + 1
      val num = (sy * sxx - sx * sxy) + (n * sxy - sx * sy) * dnext
      val den = n * sxx - sx * sx
      val exp = (if (num * den >= 0) 1L else -1L) *
        (math.abs(num) * 1000000L / math.abs(den))
      assert(r.getAs[Long]("forecast_micro") == exp)
      // forecast must be within 3x of the daily mean — a sanity band
      val mean = sy * 1000000L / n
      assert(math.abs(r.getAs[Long]("forecast_micro")) < 3 * mean + 1000000L)
    }
  }
}
