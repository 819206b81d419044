package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesDW pack (weighted intervals, curation
  * funnel). */
class QueriesDWSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q499 DP: dominates the value of any single job and greedy count") {
    val rows = SparkEntry.queries("q499_weighted_intervals")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    // direct in-memory DP recomputation per supplier
    val jobs = graft.Tables.t(spark, dir, "lineitem")
      .selectExpr("l_suppkey",
        "unix_millis(CAST(l_shipdate AS TIMESTAMP)) DIV 86400000 AS st",
        "CAST(l_quantity AS BIGINT) DIV 10 + 1 AS dur",
        "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS wv",
        "l_orderkey", "l_linenumber")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(1) + r.getLong(2),
        r.getLong(3), r.getLong(4), r.getInt(5)))
      .groupBy(_._1)
    var dpTotal = 0L
    jobs.foreach { case (_, js) =>
      val sorted = js.sortBy(j => (j._3, j._2, j._5, j._6))
      val n = sorted.length
      val best = new Array[Long](n + 1)
      for (i <- 1 to n) {
        val j = sorted(i - 1)
        // p = #jobs with en <= st_i in end-sorted order
        val p = sorted.count(_._3 <= j._2)
        best(i) = math.max(best(i - 1), j._4 + best(p))
      }
      dpTotal += best(n)
    }
    assert(rows.map(_.getAs[Long]("dp_value")).sum == dpTotal,
      "distributed DP must equal the direct sequential DP")
  }

  test("q500 funnel: stages partition the corpus, split only on kept") {
    val rows = SparkEntry.queries("q500_curation_funnel")(spark, dir)
      .collect()
    val total = rows.map(_.getAs[Long]("docs")).sum
    assert(total == graft.Tables.t(spark, dir, "documents").count(),
      "every document lands in exactly one (stage, split) cell")
    rows.foreach { r =>
      val (st, sp) = (r.getAs[String]("stage"), r.getAs[String]("split"))
      if (st == "kept") assert(Set("train", "val", "test").contains(sp))
      else assert(sp == "-")
      assert(r.getAs[Long]("chars") >= r.getAs[Long]("docs"),
        "every doc has at least one char")
    }
    assert(rows.exists(_.getAs[String]("stage") == "kept"),
      "the funnel keeps a non-empty corpus")
  }
}
