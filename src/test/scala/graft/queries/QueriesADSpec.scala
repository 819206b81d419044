package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesAD pack — independent in-memory recompute. */
class QueriesADSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q133 chi2: cells recompute; chi2 matches the closed form") {
    val ev = graft.Tables.t(spark, dir, "events")
      .selectExpr("((ts DIV 1000000) DIV 86400000 + 4) % 7 AS dow",
        "user_id % 2 AS v", "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS c")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val rows = SparkEntry.queries("q133_chi2_ab")(spark, dir).collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      val dow = r.getAs[Long]("dow")
      val g = ev.filter(_._1 == dow)
      val a = g.count(e => e._2 == 0 && e._3 == 1).toLong
      val b = g.count(e => e._2 == 0 && e._3 == 0).toLong
      val c = g.count(e => e._2 == 1 && e._3 == 1).toLong
      val d = g.count(e => e._2 == 1 && e._3 == 0).toLong
      assert(r.getAs[Long]("a") == a && r.getAs[Long]("b") == b &&
        r.getAs[Long]("c") == c && r.getAs[Long]("d") == d)
      val diff = (a * d - b * c).toDouble
      val chi2 = (a + b + c + d).toDouble * diff * diff /
        (a + b).toDouble / (c + d).toDouble / (a + c).toDouble / (b + d).toDouble
      assert(r.getAs[Long]("chi2_micro") == math.floor(chi2 * 1000000).toLong)
      assert(chi2 >= 0.0)
    }
  }

  test("q134 CUSUM: the reported day maximizes |n*cum - i*tot|") {
    val ev = graft.Tables.t(spark, dir, "events")
      .selectExpr("event_type", "(ts DIV 1000000) DIV 86400000 AS day")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val d0 = ev.map(_._2).min
    val rows = SparkEntry.queries("q134_cusum_changepoint")(spark, dir).collect()
    rows.foreach { r =>
      val days = ev.filter(_._1 == r.getAs[String]("event_type"))
        .groupBy(_._2 - d0).view.mapValues(_.length.toLong).toSeq.sortBy(_._1)
      val n = days.length.toLong
      val tot = days.map(_._2).sum
      var cum = 0L
      val devs = days.zipWithIndex.map { case ((day, cnt), idx) =>
        cum += cnt; (day, math.abs(n * cum - (idx + 1) * tot))
      }
      val best = devs.maxBy(x => (x._2, -x._1))
      assert(r.getAs[Long]("change_day") == best._1)
      assert(r.getAs[Long]("max_dev") == best._2)
      assert(r.getAs[Long]("n_days") == n)
    }
  }

  test("q135 weighted median: half the weight lies at or below the median price") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .selectExpr("l_returnflag",
        "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS pc",
        "CAST(floor(l_quantity + 0.5) AS BIGINT) AS qi")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val rows = SparkEntry.queries("q135_weighted_median")(spark, dir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val g = li.filter(_._1 == r.getAs[String]("l_returnflag"))
      val tot = g.map(_._3).sum
      val med = r.getAs[Long]("wmedian_cents")
      val below = g.filter(_._2 <= med).map(_._3).sum
      val strictlyBelow = g.filter(_._2 < med).map(_._3).sum
      assert(r.getAs[Long]("total_weight") == tot)
      assert(2 * below >= tot, "weight at/below median must reach half")
      assert(2 * strictlyBelow < tot, "median must be minimal such price")
    }
  }

  test("q136 compaction: bins conserve files/bytes; every bin but maybe the last is started before target") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("source", "n_chars").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sum).toMap
    val rows = SparkEntry.queries("q136_compaction_bins")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("total_bytes") == docs(r.getAs[String]("source")))
      assert(r.getAs[Long]("n_bins") >= 1)
      assert(r.getAs[Long]("max_bin_bytes") >= r.getAs[Long]("min_bin_bytes"))
    }
  }

  test("q137 attribution: purchase counts conserve; unattributed channel is -1") {
    val rows = SparkEntry.queries("q137_attribution")(spark, dir).collect()
    val nPurch = graft.Tables.t(spark, dir, "events")
      .where("event_type = 'purchase'").count()
    assert(rows.map(_.getAs[Long]("n_purchases")).sum == nPurch)
    assert(rows.map(_.getAs[Long]("channel")).forall(c => c >= -1 && c <= 4))
  }
}
