package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Structural invariants of the QueriesN pack. */
class QueriesNSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q13b range window: window stats bounded by per-user totals") {
    val rows = SparkEntry.queries("q13b_range_window")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, maxN) = (r.getAs[Long]("n_events"), r.getAs[Long]("max_win_n"))
      assert(maxN >= 1 && maxN <= n)
    }
  }

  test("q97 bloom: zero misses (the Bloom guarantee), pruning actually prunes") {
    val r = SparkEntry.queries("q97_bloom_prune")(spark, dir).collect().head
    assert(r.getAs[Long]("n_missed") == 0, "a Bloom filter must never miss a true key")
    assert(r.getAs[Long]("n_pass") >= r.getAs[Long]("n_true"))
    assert(r.getAs[Long]("n_pass") ==
      r.getAs[Long]("n_true") + r.getAs[Long]("n_false_pos"))
    // with ~30 build keys in 1071 bits, the filter must reject most
    // non-matching orders (fp rate well under 50%)
    assert(r.getAs[Long]("fp_bp") < 5000, s"fp_bp = ${r.getAs[Long]("fp_bp")}")
    assert(r.getAs[Long]("n_pass") < r.getAs[Long]("n_orders"))
  }
}
