package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesCG pack (erasure audit, tz bucketing,
  * feature hashing, scheduling policy). */
class QueriesCGSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q335 erasure: cascade rows present, zero orphans after delete") {
    val m = SparkEntry.queries("q335_erasure_audit")(spark, dir).collect()
      .map(r => r.getAs[String]("tbl") -> r.getAs[Long]("n_rows")).toMap
    assert(m("1_customer") >= 1)
    assert(m("5_orphans_after") == 0, "cascade leaves no dangling lineitems")
    assert(m.size == 5)
  }

  test("q336 tz bucketing: peak hour within [0, 23], peak ≤ total") {
    val rows = SparkEntry.queries("q336_tz_bucketing")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Long]("peak_hour")
      assert(h >= 0 && h <= 23)
      assert(r.getAs[Long]("n_at_peak") <= r.getAs[Long]("n_events"))
    }
  }

  test("q337 feature hashing: buckets ≤ 64 and ≤ words; collisions consistent") {
    val rows = SparkEntry.queries("q337_feature_hashing")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val used = r.getAs[Long]("n_buckets_used")
      assert(used <= 64 && used <= r.getAs[Long]("n_words"))
      // a bucket holding k words contributes k−1 to (words − used)
      assert((r.getAs[Long]("n_colliding_buckets") > 0)
        == (r.getAs[Long]("n_words") > used))
    }
  }

  test("q338 SJF never waits longer than FIFO (exchange argument)") {
    val rows = SparkEntry.queries("q338_sjf_vs_fifo")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("sjf_wait") <= r.getAs[Long]("fifo_wait"))
      assert(r.getAs[Long]("sjf_vs_fifo_bp") <= 10000)
    }
  }
}
