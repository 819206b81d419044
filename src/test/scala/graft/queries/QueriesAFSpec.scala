package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants for the QueriesAF pack. */
class QueriesAFSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q143 LM score: scores are valid basis points and descending") {
    val rows = SparkEntry.queries("q143_lm_score")(spark, dir).collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getAs[Long]("score_bp"))
    assert(scores.sameElements(scores.sorted.reverse))
    assert(scores.forall(s => s >= 0 && s <= 10000))
    assert(rows.forall(_.getAs[Long]("n_bigrams") >= 1))
  }

  test("q144 power iteration: matvec recomputes exactly in memory") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val v0 = Array.tabulate(64)(d => (d * 37) % 100 - 50L)
    val w = new Array[Long](64)
    vecs.foreach { case (_, emb) =>
      val xq = emb.map(x => math.floor(x.toDouble * 1000).toLong)
      val s = xq.zip(v0).map { case (a, b) => a * b }.sum
      var d = 0
      while (d < 64) { w(d) += xq(d) * s; d += 1 }
    }
    val rows = SparkEntry.queries("q144_power_iteration")(spark, dir).collect()
    assert(rows.length == 64)
    rows.foreach(r => assert(r.getAs[Long]("w") == w(r.getAs[Long]("dim").toInt)))
  }

  test("q145 hotspot clusters: point totals never exceed table size; cells positive") {
    val rows = SparkEntry.queries("q145_hotspot_cluster")(spark, dir).collect()
    assert(rows.nonEmpty)
    val nEvents = graft.Tables.t(spark, dir, "events").count()
    assert(rows.map(_.getAs[Long]("n_points")).sum <= nEvents)
    assert(rows.forall(_.getAs[Long]("n_cells") >= 1))
  }

  test("q146 outer-join accounting: matched+timeout = clicks; semi-join matches EXISTS recompute") {
    val rows = SparkEntry.queries("q146_stream_outer_join")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_matched") + r.getAs[Long]("n_timeout") ==
        r.getAs[Long]("n_clicks"))
    }
    // independent recompute of total matched over all days
    val ev = graft.Tables.t(spark, dir, "events")
      .selectExpr("user_id", "event_type", "ts DIV 1000000 AS ms").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val purByUser = ev.filter(_._2 == "purchase").groupBy(_._1)
      .view.mapValues(_.map(_._3).sorted).toMap
    val matched = ev.filter(_._2 == "click").count { c =>
      purByUser.getOrElse(c._1, Array.empty[Long])
        .exists(p => p > c._3 && p <= c._3 + 3600000L)
    }
    assert(rows.map(_.getAs[Long]("n_matched")).sum == matched)
  }
}
