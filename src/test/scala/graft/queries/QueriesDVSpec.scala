package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesDV pack (class balance, entropy rate, tail
  * sampling, G-counter merge). */
class QueriesDVSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q495 balance: every class kept at exactly the minority count") {
    val rows = SparkEntry.queries("q495_class_balance")(spark, dir).collect()
    assert(rows.nonEmpty)
    val target = rows.map(_.getAs[Long]("target")).distinct
    assert(target.length == 1)
    rows.foreach { r =>
      assert(r.getAs[Long]("kept") == target.head,
        "balanced corpus: all classes downsampled to the minimum")
      assert(r.getAs[Long]("kept") + r.getAs[Long]("dropped") ==
        r.getAs[Long]("n"))
    }
    assert(rows.map(_.getAs[Long]("dropped")).min == 0,
      "the minority class drops nothing")
  }

  test("q496 entropy rate: bounded by ln(5), pi sums near 1") {
    val rows = SparkEntry.queries("q496_entropy_rate")(spark, dir).collect()
    assert(rows.length == 5)
    val rate = rows.map(_.getAs[Long]("rate_micro")).distinct
    assert(rate.length == 1)
    assert(rate.head >= 0 && rate.head <= 1609438,
      "entropy rate bounded by ln(5) nats")
    rows.foreach { r =>
      assert(r.getAs[Long]("h_micro") >= 0 &&
        r.getAs[Long]("h_micro") <= 1609439)
    }
    val piSum = rows.map(_.getAs[Long]("pi_micro")).sum
    assert(piSum >= 999900 && piSum <= 1000000,
      "stationary approximation conserves mass up to DIV floor")
  }

  test("q497 tail sampling: all error traces retained, volume biased to tail") {
    val r = SparkEntry.queries("q497_tail_sampling")(spark, dir)
      .collect().head
    assert(r.getAs[Long]("kept_err_traces") == r.getAs[Long]("err_traces"),
      "tail-based sampling never drops an error trace")
    assert(r.getAs[Long]("kept") <= r.getAs[Long]("traces"))
    assert(r.getAs[Long]("volume_bp") >= r.getAs[Long]("keep_bp"),
      "kept traces skew large: volume share >= trace share")
  }

  test("q498 G-counter: merge dominates replicas, never exceeds truth") {
    val rows = SparkEntry.queries("q498_gcounter_merge")(spark, dir).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val (t, m) = (r.getAs[Long]("truth"), r.getAs[Long]("merged"))
      val reps = Seq(r.getAs[Long]("r1"), r.getAs[Long]("r2"),
        r.getAs[Long]("r3"))
      assert(m == reps.max, "CRDT merge is the elementwise max")
      assert(m <= t, "a replica can only lag truth, never lead it")
      assert(r.getAs[Long]("lag") == t - m)
      reps.foreach(x => assert(x <= t))
    }
  }
}
