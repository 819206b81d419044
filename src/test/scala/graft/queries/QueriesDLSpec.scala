package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesDL pack (watermark drops, backpressure,
  * hub matrix, held-out perplexity). */
class QueriesDLSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q455 drops: monotone in the watermark, bounded by events") {
    val rows = SparkEntry.queries("q455_watermark_drops")(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (d1, d5, d15) = (r.getAs[Long]("drop_1m"), r.getAs[Long]("drop_5m"),
        r.getAs[Long]("drop_15m"))
      assert(d15 <= d5 && d5 <= d1,
        "a longer watermark can only drop fewer events")
      assert(d1 <= r.getAs[Long]("events"))
    }
  }

  test("q456 backpressure: busy slots and buffer bounded, drops consistent") {
    val rows = SparkEntry.queries("q456_backpressure")(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("busy_slots") <= r.getAs[Long]("slots"))
      assert(r.getAs[Long]("max_buffer") >= 0)
      assert(r.getAs[Long]("drops") >= 0)
    }
  }

  test("q457 hub matrix: symmetric within hop bound, zero diagonal") {
    val rows = SparkEntry.queries("q457_hub_matrix")(spark, dir).collect()
    assert(rows.length == 100)
    val m = rows.map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")) ->
      r.getAs[Long]("hop")).toMap
    m.foreach { case ((s, d), h) =>
      if (s == d) assert(h == 0L, "diagonal is distance 0")
      assert(h >= -1 && h <= 3)
      // undirected graph: within the shared 3-hop bound the matrix is
      // symmetric (both sides either find the same min-hop or both cap)
      assert(m((d, s)) == h, s"asymmetry at ($s,$d)")
    }
  }

  test("q458 perplexity: positive NLL, perplexity above 1, test split small") {
    val rows = SparkEntry.queries("q458_heldout_perplexity")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("avg_nll_micro") > 0,
        "smoothed probabilities are < 1, so NLL is positive")
      assert(r.getAs[Long]("ppl_milli") > 1000, "perplexity > 1")
      assert(r.getAs[Long]("m") > 0)
      assert(r.getAs[Long]("sum_nll_micro") >=
        r.getAs[Long]("m") * r.getAs[Long]("avg_nll_micro"))
    }
  }
}
