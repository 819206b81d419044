package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesAH pack. */
class QueriesAHSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q150 OHLC: open/close are the true first/last; low <= open,close <= high") {
    val ev = graft.Tables.t(spark, dir, "events")
      .selectExpr("event_type", "(ts DIV 1000000) DIV 86400000 AS day",
        "ts DIV 1000000 AS ms", "event_id",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val rows = SparkEntry.queries("q150_ohlc")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.take(10).foreach { r =>
      val g = ev.filter(e => e._1 == r.getString(0) && e._2 == r.getAs[Long]("day"))
        .sortBy(e => (e._3, e._4))
      assert(r.getAs[Long]("open_cents") == g.head._5)
      assert(r.getAs[Long]("close_cents") == g.last._5)
      assert(r.getAs[Long]("high_cents") == g.map(_._5).max)
      assert(r.getAs[Long]("low_cents") == g.map(_._5).min)
      assert(r.getAs[Long]("n") == g.length)
    }
  }

  test("q151 WAU: window count equals brute-force distinct over the 7-day window") {
    val ud = graft.Tables.t(spark, dir, "events")
      .selectExpr("user_id", "(ts DIV 1000000) DIV 86400000 AS day")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val rows = SparkEntry.queries("q151_rolling_distinct")(spark, dir).collect()
    rows.foreach { r =>
      val wend = r.getAs[Long]("wend")
      val brute = ud.filter(e => e._2 <= wend && e._2 >= wend - 6).map(_._1).distinct.length
      assert(r.getAs[Long]("wau") == brute, s"wend=$wend")
      val dau = ud.filter(_._2 == wend).map(_._1).distinct.length
      assert(r.getAs[Long]("dau") == dau)
    }
  }

  test("q152 survival: at_risk is non-increasing; converted+censored account for exits") {
    val rows = SparkEntry.queries("q152_survival_curve")(spark, dir).collect()
    assert(rows.length == 15)
    val atRisk = rows.map(_.getAs[Long]("at_risk"))
    assert(atRisk.zip(atRisk.tail).forall { case (a, b) => a >= b })
    // exits between day d and d+1 = converted(d) + censored(d)
    rows.dropRight(1).zip(rows.tail).foreach { case (d0, d1) =>
      assert(d0.getAs[Long]("at_risk") - d1.getAs[Long]("at_risk") ==
        d0.getAs[Long]("converted") + d0.getAs[Long]("censored"))
    }
  }

  test("q153 SCD2 lookup: every matched event maps to exactly one version") {
    val rows = SparkEntry.queries("q153_scd2_lookup")(spark, dir).collect()
    assert(rows.nonEmpty)
    // total matched events must not exceed events of users present in orders
    // (each event joins at most one interval by construction: intervals
    // partition [first_version, inf) per customer)
    val nMatched = rows.map(_.getAs[Long]("n_events")).sum
    assert(nMatched > 0)
    // cross-check: direct interval-join count
    val direct = {
      val orders = spark.read.parquet(s"$dir/orders.parquet")
        .selectExpr("o_custkey", "o_orderkey",
          "unix_millis(CAST(o_orderdate AS TIMESTAMP)) AS vf").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.sortBy(v => (v._3, v._2))).toMap
      val ev = graft.Tables.t(spark, dir, "events")
        .selectExpr("user_id", "ts DIV 1000000 AS ms").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      ev.count { case (u, ms) =>
        orders.get(u).exists { vs =>
          vs.zipWithIndex.exists { case ((_, _, vf), i) =>
            val vto = if (i + 1 < vs.length) Some(vs(i + 1)._3) else None
            ms >= vf && vto.forall(ms < _)
          }
        }
      }
    }
    assert(nMatched == direct)
  }
}
