package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesAC pack — each query checked against an
  * independent in-memory recomputation (not the DuckDB oracle). */
class QueriesACSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val events: Array[(Long, Long, Long, String, Long)] =
    graft.Tables.t(spark, dir, "events")
      .selectExpr("event_id", "ts DIV 1000000 AS ts_ms", "user_id", "event_type",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))

  test("q122 decayed leaderboard: scores recompute exactly; descending order") {
    val mx = events.map(_._2).max
    val exp = events.groupBy(_._3).view.mapValues { es =>
      es.map(e => e._5 >> ((mx - e._2) / 86400000L).toInt).sum
    }.toMap
    val rows = SparkEntry.queries("q122_decayed_topk")(spark, dir).collect()
    assert(rows.length == 10)
    val scores = rows.map(_.getAs[Long]("score_cents"))
    assert(scores.sameElements(scores.sorted.reverse))
    rows.foreach(r => assert(r.getAs[Long]("score_cents") == exp(r.getAs[Long]("user_id"))))
  }

  test("q123 islands: island stats recompute from distinct day sets") {
    val rows = SparkEntry.queries("q123_islands")(spark, dir).collect()
    val byUser = events.groupBy(_._3).view
      .mapValues(_.map(e => e._2 / 86400000L).distinct.sorted).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val days = byUser(r.getAs[Long]("user_id"))
      // split into consecutive runs
      val runs = days.foldLeft(List.empty[List[Long]]) {
        case (acc @ (h :: t), d) if h.head == d - 1 => (d :: h) :: t
        case (acc, d) => List(d) :: acc
      }
      assert(r.getAs[Long]("n_islands") == runs.length)
      assert(r.getAs[Long]("max_len") == runs.map(_.length).max)
      assert(r.getAs[Long]("active_days") == days.length)
    }
  }

  test("q124 capped balance: sequential clamp recomputes exactly") {
    val rows = SparkEntry.queries("q124_capped_balance")(spark, dir).collect()
    val byUser = events.groupBy(_._3)
    assert(rows.length == byUser.size)
    rows.foreach { r =>
      val es = byUser(r.getAs[Long]("user_id")).sortBy(e => (e._2, e._1))
      var bal = 0L; var clamps = 0L
      es.foreach { e =>
        val delta = if (e._4 == "purchase" || e._4 == "error") -e._5 else e._5
        val nb = bal + delta
        if (nb < 0) { bal = 0; clamps += 1 } else bal = nb
      }
      assert(r.getAs[Long]("final_cents") == bal && r.getAs[Long]("n_clamps") == clamps)
    }
  }

  test("q124 is partitioning-invariant (same result at 1 and 32 shuffle partitions)") {
    def run(): Map[Long, (Long, Long)] =
      SparkEntry.queries("q124_capped_balance")(spark, dir).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val base = run()
    withPartitions(1) { assert(run() == base) }
  }

  private def withPartitions(n: Int)(body: => Unit): Unit = {
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally spark.conf.set("spark.sql.shuffle.partitions", old)
  }

  test("q131 MAD: medians recompute via sorted selection") {
    val rows = SparkEntry.queries("q131_mad")(spark, dir).collect()
    val byType = events.groupBy(_._4)
    assert(rows.length == byType.size)
    rows.foreach { r =>
      val vs = byType(r.getAs[String]("event_type")).map(_._5).sorted
      val med = vs((vs.length + 1) / 2 - 1)
      val devs = vs.map(v => math.abs(v - med)).sorted
      val mad = devs((devs.length + 1) / 2 - 1)
      assert(r.getAs[Long]("med_cents") == med && r.getAs[Long]("mad_cents") == mad)
    }
  }

  test("q132 proration: conservation holds and bump counts are consistent") {
    val rows = SparkEntry.queries("q132_proration")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("bad_orders") == 0L, "per-order cent conservation must hold")
      assert(r.getAs[Long]("n_bumped") <= r.getAs[Long]("n_items"))
    }
  }
}
