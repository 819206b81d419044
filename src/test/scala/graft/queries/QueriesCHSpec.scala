package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesCH pack (SPRT, unpivot, quantile norm,
  * LOF outliers). */
class QueriesCHSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q339 SPRT: decision point within the stream; llr consistent with verdict") {
    val rows = SparkEntry.queries("q339_sprt")(spark, dir).collect()
    assert(rows.nonEmpty)
    val boundA = math.round(math.log(19.0) * 1e6)
    rows.foreach { r =>
      assert(r.getAs[Long]("decision_rn") <= r.getAs[Long]("n_obs"))
      val d = r.getAs[String]("decision")
      val llr = r.getAs[Long]("llr_micro")
      if (d == "h1") assert(llr >= boundA)
      if (d == "h0") assert(llr <= -boundA)
      if (d == "none") assert(llr > -boundA && llr < boundA)
    }
  }

  test("q340 unpivot: roundtrip counts match direct aggregation") {
    val rows = SparkEntry.queries("q340_unpivot")(spark, dir).collect()
    assert(rows.length == 6, "3 return flags × 2 line statuses")
    val total = rows.map(_.getAs[Long]("cnt")).sum
    assert(total == spark.read.parquet(s"$dir/lineitem.parquet").count())
  }

  test("q341 quantile norm: every source spans the same global support") {
    val rows = SparkEntry.queries("q341_quantile_norm")(spark, dir).collect()
    assert(rows.nonEmpty)
    // rank-1 maps to global min, rank-n to global max for every source
    assert(rows.map(_.getAs[Long]("min_norm")).distinct.length == 1,
      "all sources share the global minimum after normalization")
    assert(rows.map(_.getAs[Long]("max_norm")).distinct.length == 1,
      "all sources share the global maximum after normalization")
  }

  test("q342 LOF: ordered desc, ratios positive") {
    val rows = SparkEntry.queries("q342_lof_outliers")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 15)
    val ls = rows.map(_.getAs[Long]("lof_micro")).toSeq
    assert(ls == ls.sortBy(-_))
    rows.foreach { r =>
      assert(r.getAs[Long]("sd_a") >= 0 && r.getAs[Long]("sd_nbrs") > 0)
    }
  }
}
