package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesAO pack. */
class QueriesAOSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q168 RFM: users conserve; segments are valid 3-digit codes of 1..5") {
    val rows = SparkEntry.queries("q168_rfm")(spark, dir).collect()
    assert(rows.nonEmpty)
    val nPurchasers = graft.Tables.t(spark, dir, "events")
      .where("event_type = 'purchase'").select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == nPurchasers)
    rows.foreach { r =>
      val seg = r.getAs[Long]("segment")
      val (a, b, c) = (seg / 100, (seg / 10) % 10, seg % 10)
      assert(a >= 1 && a <= 5 && b >= 1 && b <= 5 && c >= 1 && c <= 5, s"seg=$seg")
    }
  }

  test("q170 readability: min <= avg <= max per language; doc counts conserve") {
    val rows = SparkEntry.queries("q170_readability")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("min_score_micro") <= r.getAs[Long]("avg_score_micro"))
      assert(r.getAs[Long]("avg_score_micro") <= r.getAs[Long]("max_score_micro"))
    }
    val nDocs = spark.read.parquet(s"$dir/documents.parquet")
      .where("text IS NOT NULL AND length(text) > 0").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
  }

  test("q171 concurrency: peak matches a brute-force sweep over session intervals") {
    val r = SparkEntry.queries("q171_concurrency")(spark, dir).collect().head
    // brute force: rebuild sessions and scan minute boundaries
    val ev = graft.Tables.t(spark, dir, "events")
      .selectExpr("user_id", "ts DIV 1000000 AS ms", "event_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val sessions = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var start = sorted.head._2; var last = sorted.head._2
      sorted.tail.foreach { e =>
        if (e._2 - last > 1800000L) { out += ((start, last)); start = e._2 }
        last = e._2
      }
      out += ((start, last))
      out
    }
    assert(r.getAs[Long]("n_sessions") == sessions.length.toLong)
    val bounds = sessions.flatMap { case (s0, e0) => Seq((s0, 1), (e0 + 1, -1)) }
      .sortBy { case (ts, d) => (ts, -d) }
    var open = 0; var peak = 0
    bounds.foreach { case (_, d) => open += d; peak = math.max(peak, open) }
    assert(r.getAs[Long]("peak") == peak.toLong)
  }
}
