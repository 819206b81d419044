package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesBW pack (Holt–Winters, seasonal strength,
  * knee detection), including an in-memory replay of the 9-state
  * recurrence. */
class QueriesBWSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q297 Holt-Winters: matches an in-memory replay of the recurrence") {
    import org.apache.spark.sql.functions._
    val daily = graft.Tables.t(spark, dir, "events")
      .selectExpr("event_type", "(ts DIV 1000000) DIV 86400000 AS day")
      .groupBy("event_type", "day").agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = daily.groupBy(_._1).flatMap { case (et, rows) =>
      val ys = rows.sortBy(_._2).map(_._3)
      if (ys.length < 8) None else {
        val lv0 = ys.take(7).map(_ * 1000L).sum / 7L
        val sea = Array.tabulate(7)(j => ys(j) * 1000L - lv0)
        var lv = lv0; var tr = 0L; var sae = 0L
        for (i <- 7 until ys.length) {
          val idx = i % 7
          val f = lv + tr + sea(idx)
          sae += math.abs(ys(i) * 1000L - f)
          val nl = (300L * (ys(i) * 1000L - sea(idx)) + 700L * (lv + tr)) / 1000L
          val nb = (200L * (nl - lv) + 800L * tr) / 1000L
          sea(idx) = (300L * (ys(i) * 1000L - nl) + 700L * sea(idx)) / 1000L
          lv = nl; tr = nb
        }
        Some(et -> (ys.length.toLong, lv, tr, lv + tr + sea(ys.length % 7), sae))
      }
    }.toMap
    val got = SparkEntry.queries("q297_holt_winters")(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val et = r.getAs[String]("event_type")
      val (n, lv, tr, f, sae) = expect(et)
      assert(r.getAs[Long]("n_days") == n)
      assert(r.getAs[Long]("level_milli") == lv, s"level for $et")
      assert(r.getAs[Long]("trend_milli") == tr, s"trend for $et")
      assert(r.getAs[Long]("forecast_milli") == f, s"forecast for $et")
      assert(r.getAs[Long]("sae_milli") == sae, s"sae for $et")
    }
  }

  test("q298 seasonal strength: bp at most 10000") {
    val rows = SparkEntry.queries("q298_seasonal_strength")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("strength_bp")))
        assert(r.getAs[Long]("strength_bp") <= 10000L)
    }
  }

  test("q299 knee: single row, knee within curve, share consistent") {
    val rows = SparkEntry.queries("q299_knee_detection")(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("knee_k") >= 1L)
    assert(r.getAs[Long]("knee_k") <= r.getAs[Long]("n_parts"))
    val share = r.getAs[Long]("share_at_knee_bp")
    assert(share > 0L && share <= 10000L)
    assert(r.getAs[Long]("gap_rank_milli") >= 0L)
  }
}
