package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesAG pack. */
class QueriesAGSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q147 skyline: no output point dominates another; none is dominated by any input") {
    val pts = spark.read.parquet(s"$dir/lineitem.parquet")
      .selectExpr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS pc",
        "CAST(floor(l_quantity + 0.5) AS BIGINT) AS qi")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sky = SparkEntry.queries("q147_skyline")(spark, dir).collect()
      .map(r => (r.getAs[Long]("pc"), r.getAs[Long]("qi")))
    assert(sky.nonEmpty)
    def dominates(a: (Long, Long), b: (Long, Long)): Boolean =
      a._1 <= b._1 && a._2 >= b._2 && (a._1 < b._1 || a._2 > b._2)
    sky.foreach { p =>
      assert(!pts.exists(q => dominates(q, p)), s"$p is dominated")
    }
    for (a <- sky; b <- sky if a != b) assert(!dominates(a, b))
    // completeness: every non-dominated input point appears
    val expected = pts.distinct.filter(p => !pts.exists(q => dominates(q, p))).toSet
    assert(sky.toSet == expected)
  }

  test("q148 pagerank step: ranks recompute from edge contributions") {
    val rows = SparkEntry.queries("q148_pagerank_step")(spark, dir).collect()
    assert(rows.length == 20 || rows.nonEmpty)
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_suppkey").collect()
      .map(r => (orders(r.getLong(0)), r.getLong(1))).distinct
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val inflow = edges.groupBy(_._2).view
      .mapValues(_.map(e => 1000000L / deg(e._1)).sum).toMap
    rows.foreach { r =>
      val sp = r.getAs[Long]("sp")
      assert(r.getAs[Long]("inflow") == inflow(sp))
      assert(r.getAs[Long]("rank_micro") == 150000L + 850L * inflow(sp) / 1000L)
    }
  }

  test("q149 capped sessions: sequential recompute matches; caps bounded by sessions") {
    val ev = graft.Tables.t(spark, dir, "events")
      .selectExpr("user_id", "ts DIV 1000000 AS ms", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rows = SparkEntry.queries("q149_capped_sessions")(spark, dir).collect()
    val byUser = ev.groupBy(_._1)
    assert(rows.length == byUser.size)
    rows.foreach { r =>
      val es = byUser(r.getAs[Long]("user_id")).sortBy(e => (e._2, e._3))
      var nSess = 1L; var caps = 0L
      var start = es.head._2; var prev = es.head._2
      var len = 1L; var maxLen = 0L
      es.tail.foreach { e =>
        val gap = e._2 - prev
        if (gap > 1800000L) {
          maxLen = math.max(maxLen, len); nSess += 1; start = e._2; len = 1
        } else if (e._2 - start > 14400000L) {
          maxLen = math.max(maxLen, len); nSess += 1; caps += 1; start = e._2; len = 1
        } else len += 1
        prev = e._2
      }
      maxLen = math.max(maxLen, len)
      assert(r.getAs[Long]("n_sessions") == nSess)
      assert(r.getAs[Long]("n_cap_splits") == caps)
      assert(r.getAs[Long]("max_session_events") == maxLen)
      assert(caps <= nSess - 1 || caps == 0)
    }
  }
}
