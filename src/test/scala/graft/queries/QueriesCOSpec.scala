package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesCO pack (script mix, range frames,
  * argminmax, ordered string agg). */
class QueriesCOSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q367 script mix: zh is CJK-heavy, others are not") {
    val rows = SparkEntry.queries("q367_script_mix")(spark, dir).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("cjk_bp")).toMap
    assert(rows.contains("zh"))
    assert(rows("zh") > 1000, "Chinese documents carry CJK characters")
    rows.filterKeys(_ != "zh").values.foreach(bp => assert(bp < rows("zh")))
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
