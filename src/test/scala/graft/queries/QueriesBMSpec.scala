package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesBM pack (ANOVA effect size, dedup
  * ordering, bot detection, activity heatmap). */
class QueriesBMSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q258 eta2: single row, eta within [0, 10000], k = segment count") {
    val rows = SparkEntry.queries("q258_anova_eta")(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("k") == 5L, "five market segments")
    val eta = r.getAs[Long]("eta2_bp")
    // sst DIV 100 flooring can inflate the ratio by up to ~1%
    assert(eta >= 0L && eta <= 10200L)
    assert(r.getAs[Long]("ssb") <= r.getAs[Long]("sst"),
      "between-group variance cannot exceed total")
  }

  test("q259 ordering: dedup can only shrink the candidate set") {
    val r = SparkEntry.queries("q259_dedup_ordering")(spark, dir).collect().head
    assert(r.getAs[Long]("pairs_dedup") <= r.getAs[Long]("pairs_full"))
    val red = r.getAs[Long]("reduction_bp")
    assert(red >= 0L && red <= 10000L)
  }

  test("q260 bot flags: all classes populated at this SF, users conserved") {
    val rows = SparkEntry.queries("q260_bot_detection")(spark, dir).collect()
    assert(rows.nonEmpty)
    val flags = rows.map(_.getAs[String]("flag")).toSet
    assert(flags.contains("c_human_paced"))
    rows.foreach(r => assert(r.getAs[Long]("n_users") > 0L))
  }

  test("q261 heatmap: 5 cells per type, rank-1 share largest, dow/hour ranges") {
    val rows = SparkEntry.queries("q261_dow_hour_heatmap")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, g) =>
      assert(g.length <= 5)
      val byRk = g.sortBy(_.getAs[Long]("rk"))
      val ns = byRk.map(_.getAs[Long]("n"))
      assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("dow") >= 0L && r.getAs[Long]("dow") <= 6L)
      assert(r.getAs[Long]("hour") >= 0L && r.getAs[Long]("hour") <= 23L)
    }
  }
}
