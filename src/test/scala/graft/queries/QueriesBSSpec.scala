package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesBS pack (Q2/Q11/Q14/Q20 shapes). */
class QueriesBSSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q281 min-cost supplier: unit cents non-decreasing with rank") {
    val rows = SparkEntry.queries("q281_min_cost_supplier")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val units = rows.map(_.getAs[Long]("unit_cents")).toSeq
    assert(units == units.sorted)
    rows.foreach(r => assert(r.getAs[Long]("unit_cents") > 0L))
  }

  test("q282 important parts: every kept part is above the 1/1000 line") {
    val rows = SparkEntry.queries("q282_important_parts")(spark, dir).collect()
    assert(rows.nonEmpty)
    // value*1000 > total  ⟹  share_bp = value*10000/total >= 10
    rows.foreach(r => assert(r.getAs[Long]("share_bp") >= 10L))
    val vals = rows.map(_.getAs[Long]("value_cp")).toSeq
    assert(vals == vals.sorted.reverse)
  }

  test("q283 promo share: promo <= total, bp within range") {
    val rows = SparkEntry.queries("q283_promo_share")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("promo_cp") <= r.getAs[Long]("total_cp"))
      val bp = r.getAs[Long]("promo_bp")
      assert(bp >= 0L && bp <= 10000L)
    }
  }

  test("q284 dominant suppliers: pairs >= suppliers (a supplier can dominate several parts)") {
    val rows = SparkEntry.queries("q284_dominant_suppliers")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dominant_pairs") >= r.getAs[Long]("n_suppliers"))
      assert(r.getAs[Long]("n_suppliers") > 0L)
    }
  }
}
