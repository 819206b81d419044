package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesDS pack (median polish, tiering, absorbing
  * lifetime, dict sharing). */
class QueriesDSSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q483 median polish: 7 row + 24 col effects, residuals centered") {
    val rows = SparkEntry.queries("q483_median_polish")(spark, dir).collect()
    assert(rows.count(_.getAs[String]("kind") == "row") == 7)
    assert(rows.count(_.getAs[String]("kind") == "col") == 24)
    val mn = rows.find(_.getAs[String]("kind") == "residmin").get
      .getAs[Long]("effect")
    val mx = rows.find(_.getAs[String]("kind") == "residmax").get
      .getAs[Long]("effect")
    assert(mn <= 0 && mx >= 0,
      "median-centered residuals straddle zero")
  }

  test("q484 tiering: partitions parts, cost ordering holds") {
    val rows = SparkEntry.queries("q484_storage_tiers")(spark, dir).collect()
    val nParts = graft.Tables.t(spark, dir, "lineitem")
      .select("l_partkey").distinct().count()
    assert(rows.map(_.getAs[Long]("parts")).sum == nParts)
    rows.foreach { r =>
      assert(r.getAs[Long]("storage_cost") >= r.getAs[Long]("units"),
        "cheapest tier costs 1 per unit")
      if (r.getAs[String]("tier") != "cold")
        assert(r.getAs[Long]("misplaced") == 0)
    }
  }

  test("q485 absorbing lifetime: probabilities and lifetimes coherent") {
    val r = SparkEntry.queries("q485_absorbing_lifetime")(spark, dir)
      .collect().head
    val (paa, pad, pda) = (r.getAs[Long]("paa"), r.getAs[Long]("pad"),
      r.getAs[Long]("pda"))
    assert(paa + pad >= 999999 && paa + pad <= 1000000,
      "active-row probabilities sum to 1 up to DIV floor")
    assert(pda >= 0 && pda <= 1000000)
    val ta = r.getAs[Long]("t_active_milli")
    if (ta != -1) {
      assert(ta >= 1000, "at least the current period survives")
      assert(r.getAs[Long]("t_dormant_milli") <= ta + 2000,
        "t_D <= t_A up to the micro-DIV floor slack (exact when " +
          "probabilities are unquantized: pda <= paa + pad = 1)")
    }
  }

  test("q486 dict sharing: shared dictionary never larger than the sum") {
    val rows = SparkEntry.queries("q486_dict_sharing")(spark, dir).collect()
    assert(rows.nonEmpty)
    val saving = rows.map(_.getAs[Long]("sharing_saving_bp")).distinct
    assert(saving.length == 1)
    assert(saving.head >= 0 && saving.head < 10000,
      "union of dictionaries <= sum of dictionaries")
    rows.foreach { r =>
      assert(r.getAs[Long]("dict_words") <= r.getAs[Long]("g_words"))
      assert(r.getAs[Long]("coverage_bp") <= 10000)
    }
  }
}
