package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesBI pack (restatement, on-time score,
  * LSH index evaluation, HLL accuracy). */
class QueriesBISpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q242 restatement: late <= true, bp consistent") {
    val rows = SparkEntry.queries("q242_restatement")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_late") <= r.getAs[Long]("n_true"))
      assert(r.getAs[Long]("restate_bp") ==
        r.getAs[Long]("n_late") * 10000L / r.getAs[Long]("n_true"))
    }
  }

  test("q243 on-time: volume floor respected, sorted by late_bp") {
    val rows = SparkEntry.queries("q243_supplier_ontime")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val bps = rows.map(_.getAs[Long]("late_bp"))
    assert(bps.zip(bps.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("n_ship") >= 20L)
      assert(r.getAs[Long]("n_late") <= r.getAs[Long]("n_ship"))
    }
  }

  test("q244 lsh eval: hits bounded by both sets, bps in range") {
    val r = SparkEntry.queries("q244_lsh_eval")(spark, dir).collect().head
    assert(r.getAs[Long]("n_cand_true") <= r.getAs[Long]("n_cand"))
    assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_truth"))
    assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_cand"))
    Seq("precision_bp", "recall_bp").foreach { c =>
      if (!r.isNullAt(r.fieldIndex(c))) {
        val v = r.getAs[Long](c)
        assert(v >= 0L && v <= 10000L)
      }
    }
  }

  test("q245 hll: estimate within 15% of exact (4096 buckets)") {
    val rows = SparkEntry.queries("q245_hll_accuracy")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("est_users") > 0L)
      assert(r.getAs[Long]("err_bp") < 1500L,
        s"HLL with m=4096 should be well under 15% on ${r.getAs[String]("event_type")}")
    }
  }
}
