package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesDA pack (Haar energy, Hill tail index,
  * Markov power steps, Gumbel return levels). */
class QueriesDASpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q415 Haar: approx coefficient equals the series total per type") {
    val rows = SparkEntry.queries("q415_haar_energy")(spark, dir).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    import org.apache.spark.sql.functions._
    val totals = graft.Tables.t(spark, dir, "events")
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byType.foreach { case (tp, rs) =>
      assert(rs.length == 6, "levels 0..5 per type")
      val approx = rs.find(_.getAs[Long]("lvl") == 0L).get.getAs[Long]("energy")
      assert(approx == totals(tp),
        "unnormalized Haar approximation at depth 5 is the 32-day total")
      rs.filter(_.getAs[Long]("lvl") > 0)
        .foreach(r => assert(r.getAs[Long]("energy") >= 0))
    }
  }

  test("q416 Hill: alpha positive and k as specified") {
    val rows = SparkEntry.queries("q416_hill_tail")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("k") == 10)
      assert(r.getAs[Long]("sum_log_micro") >= 0,
        "top-10 revenues are >= the 11th order statistic")
      val a = r.getAs[Long]("alpha_micro")
      assert(a == -1 || a > 0)
    }
  }

  test("q417 Markov: mass stays ~1 under integer truncation, decays never grow") {
    val rows = SparkEntry.queries("q417_markov_power")(spark, dir).collect()
    val bySt = rows.groupBy(_.getAs[Long]("step"))
    assert(bySt.keySet == Set(1L, 2L, 3L))
    bySt.foreach { case (_, rs) =>
      val total = rs.map(_.getAs[Long]("mass_micro")).sum
      // row-normalization + per-step DIV each drop at most ~1e-6 * states
      assert(total <= 1000000L && total >= 1000000L - 5 * 12,
        s"mass conserved up to truncation: $total")
      rs.foreach(r => assert(r.getAs[Long]("mass_micro") > 0))
    }
  }

  test("q418 Gumbel: return level clears the mean, few exceedances") {
    val rows = SparkEntry.queries("q418_gumbel_return")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n") >= 20, "one block per day observed")
      assert(r.getAs[Long]("beta_micro") >= 0)
      assert(r.getAs[Long]("rl30_micro") >= r.getAs[Long]("mu_micro"),
        "return level sits above the location parameter")
      val ex = r.getAs[Long]("exceed_cnt")
      assert(ex >= 0 && ex <= r.getAs[Long]("n") / 4,
        "a 30-block return level cannot be exceeded often")
    }
  }
}
