package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesAL pack. */
class QueriesALSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q161 agreement: intersection bounded by both sets; union arithmetic consistent") {
    val r = SparkEntry.queries("q161_dedup_agreement")(spark, dir).collect().head
    val a = r.getAs[Long]("n_minhash"); val b = r.getAs[Long]("n_simhash")
    val i = r.getAs[Long]("n_both"); val u = r.getAs[Long]("n_union")
    assert(i <= math.min(a, b))
    assert(u == a + b - i)
    if (u > 0) assert(r.getAs[Long]("agreement_bp") == i * 10000 / u)
  }

  test("q162 join planner: byte estimates recompute; small dims broadcastable") {
    val rows = SparkEntry.queries("q162_join_planner")(spark, dir).collect()
    assert(rows.length == 5)
    val region = rows.find(_.getAs[String]("tbl") == "region").get
    assert(region.getAs[Boolean]("broadcastable"), "region is always tiny")
    rows.foreach { r =>
      assert(r.getAs[Long]("est_bytes") >= 8 * r.getAs[Long]("n_rows"))
    }
  }

  test("q163 completeness: expected = present + missing; present>0 for every type") {
    val rows = SparkEntry.queries("q163_completeness")(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_days_expected") ==
        r.getAs[Long]("n_days_present") + r.getAs[Long]("n_missing"))
      assert(r.getAs[Long]("n_days_present") > 0)
      if (r.getAs[Long]("n_missing") == 0)
        assert(r.isNullAt(r.fieldIndex("first_missing_day")))
    }
  }
}
