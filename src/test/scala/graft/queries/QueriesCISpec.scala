package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesCI pack (higher-order arrays, unionByName,
  * SCD2 merge, positional profile). */
class QueriesCISpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q343 array functional: long tokens ≤ tokens; mean length sane") {
    val rows = SparkEntry.queries("q343_array_functional")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("long_tokens") <= r.getAs[Long]("tokens"))
      assert(r.getAs[Long]("docs_with_number") <= r.getAs[Long]("n_docs"))
      val m = r.getAs[Long]("mean_tok_len_micro")
      assert(m >= 1000000 && m <= 30000000, "mean token length 1..30 chars")
    }
  }

  test("q344 unionByName: missing column shows only for epoch 1") {
    val rows = SparkEntry.queries("q344_union_by_name")(spark, dir).collect()
    val missing = rows.filter(_.getAs[String]("segment") == "(missing)")
    assert(missing.length == 1)
    assert(missing(0).getAs[Long]("n_epoch2") == 0,
      "epoch 2 always carries the segment")
    assert(rows.filter(_.getAs[String]("segment") != "(missing)")
      .forall(_.getAs[Long]("n_epoch1") == 0))
  }

  test("q345 SCD2 merge: open intervals = keys; closed = deltas applied") {
    val rows = SparkEntry.queries("q345_scd2_merge")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_intervals")
      val closed = r.getAs[Long]("n_closed")
      assert(closed < n, "every key keeps exactly one open interval")
    }
  }

  test("q346 positional profile: 10 deciles, token counts balanced") {
    val rows = SparkEntry.queries("q346_positional_profile")(spark, dir).collect()
    assert(rows.length == 10)
    val counts = rows.map(_.getAs[Long]("n_tokens"))
    assert(counts.max <= counts.min * 2,
      "relative-position deciles hold similar token volume")
    rows.foreach(r => assert(r.getAs[Long]("numeric_bp") <= 10000))
  }
}
