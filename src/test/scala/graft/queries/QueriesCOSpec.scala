package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesCO pack (script mix, range frames,
  * argminmax, ordered string agg). */
class QueriesCOSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q367 script mix: shares bounded; this synthetic corpus is pure ASCII") {
    val rows = SparkEntry.queries("q367_script_mix")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // the generator emits ASCII lorem text for every lang tag, so the
      // CJK detector must read exactly zero — a correctness check in itself
      assert(r.getAs[Long]("cjk_bp") == 0)
      val sp = r.getAs[Long]("space_bp")
      assert(sp > 500 && sp < 4000, "word-separated prose has space chars")
      assert(r.getAs[Long]("digit_bp") <= 10000)
    }
  }

  test("q368 range frame: density bounded by brand size") {
    val rows = SparkEntry.queries("q368_value_range_frame")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("max_density") < r.getAs[Long]("n_parts"))
    }
  }

  test("q369 argminmax: richest differs from poorest; cents ordered") {
    val rows = SparkEntry.queries("q369_argminmax")(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("max_cents") >= r.getAs[Long]("min_cents"))
      assert(r.getAs[Long]("richest_custkey") != r.getAs[Long]("poorest_custkey"))
    }
  }

  test("q370 ordered string agg: ≤ 3 comma-ranked segments per nation") {
    val rows = SparkEntry.queries("q370_ordered_string_agg")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val segs = r.getAs[String]("top_segments").split(",")
      assert(segs.length >= 1 && segs.length <= 3)
      assert(segs.distinct.length == segs.length)
    }
  }
}
