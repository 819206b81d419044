package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesCQ pack (min-max scaling, keep policies,
  * bounce rate, backfill planning). */
class QueriesCQSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q375 min-max: extremes pinned, at least one at each boundary") {
    val rows = SparkEntry.queries("q375_minmax_scale")(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_at_floor") >= 1)
      assert(r.getAs[Long]("n_at_ceil") >= 1)
      assert(r.getAs[Long]("min_cents") < r.getAs[Long]("max_cents"))
    }
  }

  test("q376 keep policies: longest keeps at least as many chars as first") {
    val m = SparkEntry.queries("q376_keep_policies")(spark, dir).collect()
      .map(r => r.getAs[String]("policy") ->
        (r.getAs[Long]("chars_kept"), r.getAs[Long]("chars_dropped"))).toMap
    assert(m.size == 2)
    assert(m("b_keep_longest")._1 >= m("a_keep_first")._1,
      "keeping the longest copy can only retain more characters")
    m.values.foreach { case (kept, dropped) => assert(kept > 0 && dropped >= 0) }
  }

  test("q377 bounce rate: bounced ≤ sessions; engaged depth ≥ 2") {
    val rows = SparkEntry.queries("q377_bounce_rate")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bounced") <= r.getAs[Long]("n_sessions"))
      val d = r.getAs[Long]("engaged_depth_micro")
      assert(d == 0 || d >= 2000000, "an engaged session has ≥ 2 events")
    }
  }

  test("q378 backfill: missing = expected − observed coverage; batches bound gaps") {
    val rows = SparkEntry.queries("q378_backfill_plan")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_missing") < r.getAs[Long]("n_expected"))
      assert(r.getAs[Long]("max_batch_len") <= r.getAs[Long]("n_missing"))
      assert((r.getAs[Long]("n_batches") == 0)
        == (r.getAs[Long]("n_missing") == 0))
    }
  }
}
