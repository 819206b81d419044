package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesT pack. */
class QueriesTSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q11d interpolated percentiles match an independent in-memory computation") {
    val byType = graft.Tables.t(spark, dir, "events")
      .selectExpr("event_type", "CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc")
      .collect()
      .groupBy(_.getAs[String]("event_type"))
      .view.mapValues(_.map(_.getAs[Long]("vc")).sorted).toMap
    def cont(vs: Array[Long], p: Int): Long = {
      val scaled = (vs.length - 1).toLong * p
      val lo = (scaled / 100).toInt
      val rem = scaled % 100
      val hi = if (lo + 1 < vs.length) vs(lo + 1) else vs(lo)
      vs(lo) * 100 + (hi - vs(lo)) * rem
    }
    val rows = SparkEntry.queries("q11d_percentile_cont")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val vs = byType(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("p50_cc") == cont(vs, 50), s"p50 for ${r.getString(0)}")
      assert(r.getAs[Long]("p95_cc") == cont(vs, 95), s"p95 for ${r.getString(0)}")
      assert(r.getAs[Long]("p50_cc") <= r.getAs[Long]("p95_cc"))
    }
  }

  test("q75 transitions: rows sum to n_from per source, probabilities bounded") {
    val rows = SparkEntry.queries("q75_event_transitions")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("prev_type")).foreach { case (_, g) =>
      val nFrom = g.head.getAs[Long]("n_from")
      assert(g.map(_.getAs[Long]("n")).sum == nFrom)
      g.foreach { r =>
        val bp = r.getAs[Long]("prob_bp")
        assert(bp >= 0 && bp <= 10000)
      }
    }
  }
}
