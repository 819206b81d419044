package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesDD pack (Kadane, bipartite audit,
  * Hodges–Lehmann, quorum reliability). */
class QueriesDDSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q427 Kadane: window form matches a direct sequential Kadane") {
    val rows = SparkEntry.queries("q427_kadane")(spark, dir).collect()
    assert(rows.nonEmpty)
    import org.apache.spark.sql.functions._
    val daily = graft.Tables.t(spark, dir, "events")
      .selectExpr("event_type", "(ts DIV 1000000) DIV 86400000 AS d")
      .groupBy("event_type", "d").count()
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val tp = r.getAs[String]("event_type")
      val series = daily(tp).sortBy(_._2)
      val mean = series.map(_._3).sum / series.length
      val deltas = series.map(_._3 - mean)
      var best = Long.MinValue; var cur = 0L
      deltas.foreach { x =>
        cur = math.max(0L, cur) + x
        best = math.max(best, cur)
      }
      assert(r.getAs[Long]("best_sum") == best,
        s"$tp: window-form Kadane must equal the recurrence")
      assert(r.getAs[Long]("start_d") <= r.getAs[Long]("end_d"))
    }
  }

  test("q428 bipartite: layer accounting well-formed") {
    val rows = SparkEntry.queries("q428_bipartite_audit")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("intra_edges") <= r.getAs[Long]("edges"))
      assert(r.getAs[Boolean]("odd_cycle_here") ==
        (r.getAs[Long]("intra_edges") > 0))
      assert(r.getAs[Long]("layer") >= 0 && r.getAs[Long]("layer") <= 4)
    }
  }

  test("q429 HL: estimator between min and max daily count (doubled)") {
    val rows = SparkEntry.queries("q429_hodges_lehmann")(spark, dir).collect()
    assert(rows.nonEmpty)
    val daily = graft.Tables.t(spark, dir, "events")
      .selectExpr("event_type", "(ts DIV 1000000) DIV 86400000 AS d")
      .groupBy("event_type", "d").count().collect()
      .map(r => (r.getString(0), r.getLong(2))).groupBy(_._1)
    rows.foreach { r =>
      val tp = r.getAs[String]("event_type")
      val cs = daily(tp).map(_._2)
      val n = cs.length.toLong
      assert(r.getAs[Long]("n_pairs") == n * (n + 1) / 2)
      val hl2 = r.getAs[Long]("hl_twice")
      assert(hl2 >= 2 * cs.min && hl2 <= 2 * cs.max)
    }
  }

  test("q430 quorum: 24 hours, redundancy beats the weakest feed") {
    val rows = SparkEntry.queries("q430_quorum_reliability")(spark, dir)
      .collect()
    assert(rows.length == 24)
    rows.foreach { r =>
      val ps = Seq(r.getAs[Long]("p1"), r.getAs[Long]("p2"),
        r.getAs[Long]("p3"))
      ps.foreach(p => assert(p >= 0 && p <= 1000000))
      val q = r.getAs[Long]("p2of3_micro")
      assert(q >= 0 && q <= 1000000)
      val Seq(p1, p2, p3) = ps
      assert(q == (p1 * p2 + p1 * p3 + p2 * p3) / 1000000L -
        (2 * p1 * p2 * p3) / 1000000000000L,
        "inclusion-exclusion identity reproduced from the reported rates")
    }
  }
}
