package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesBK pack (double-fire, shuffle balance,
  * langid margin, revenue bridge). */
class QueriesBKSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q250 double fire: dups bounded, bp consistent") {
    val rows = SparkEntry.queries("q250_double_fire")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dups") <= r.getAs[Long]("n_events"))
      assert(r.getAs[Long]("dup_bp") ==
        r.getAs[Long]("n_dups") * 10000L / r.getAs[Long]("n_events"))
    }
  }

  test("q251 shuffle balance: buckets within count, skew >= 10000bp (= perfectly even)") {
    val r = SparkEntry.queries("q251_shuffle_balance")(spark, dir).collect().head
    assert(r.getAs[Long]("n_buckets") <= 32L)
    assert(r.getAs[Long]("min_bucket") <= r.getAs[Long]("max_bucket"))
    assert(r.getAs[Long]("skew_bp") >= 9999L,
      "max*nb/total is >= 1 by definition (truncation allows 9999)")
  }

  test("q252 langid margin: buckets capped at 4, doc count conserved") {
    val rows = SparkEntry.queries("q252_langid_margin")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getAs[Long]("margin_bucket")
      assert(m >= 0L && m <= 4L)
    }
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == graft.Tables.t(spark, dir, "documents").count())
  }

  test("q253 bridge: effects sum to delta exactly") {
    val rows = SparkEntry.queries("q253_revenue_bridge")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("volume_effect_cents") + r.getAs[Long]("mix_effect_cents")
        == r.getAs[Long]("delta_cents"), "the bridge must reconcile to zero residual")
    }
  }
}
