package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesBP pack (discount lift, status mix, length
  * quartiles). */
class QueriesBPSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q270 discount lift: shares sum to ~10000, qty means positive") {
    val rows = SparkEntry.queries("q270_discount_lift")(spark, dir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("rev_share_bp")).sum
    assert(total >= 9990L && total <= 10000L)
    rows.foreach(r => assert(r.getAs[Long]("mean_qty_milli") > 0L))
  }

  test("q271 status mix: per-year shares sum to ~10000") {
    val rows = SparkEntry.queries("q271_status_mix")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Int]("yr")).foreach { case (_, g) =>
      val s = g.map(_.getAs[Long]("share_bp")).sum
      assert(s >= 9990L && s <= 10000L)
    }
  }

  test("q272 quartiles: per-lang quartiles ordered and non-overlapping") {
    val rows = SparkEntry.queries("q272_length_quartiles")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, g) =>
      val qs = g.sortBy(_.getAs[Long]("quartile"))
      assert(qs.map(_.getAs[Long]("quartile")).toSeq == (1L to qs.length))
      qs.zip(qs.tail).foreach { case (a, b) =>
        assert(a.getAs[Long]("max_chars") <= b.getAs[Long]("min_chars"),
          "ntile on sorted lengths yields non-overlapping ranges")
      }
    }
  }
}
