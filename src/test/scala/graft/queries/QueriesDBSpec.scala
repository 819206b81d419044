package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesDB pack (fixed effects, Borda, Burrows'
  * Delta, greedy coverage). */
class QueriesDBSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q419 FE: one row per type, alpha reconstructs the type mean") {
    val rows = SparkEntry.queries("q419_fixed_effects")(spark, dir).collect()
    assert(rows.length == 5)
    val betas = rows.map(_.getAs[Long]("beta_micro")).distinct
    assert(betas.length == 1, "slope is global across types")
    rows.foreach { r =>
      val (a, b, xb, yb) = (r.getAs[Long]("alpha_milli"), betas.head,
        r.getAs[Long]("xbar_milli"), r.getAs[Long]("ybar_milli"))
      assert(a == yb - (b * xb) / 1000000L)
      assert(r.getAs[Long]("n_days") >= 20)
    }
  }

  test("q420 Borda: scores bounded by 3(n-1), ranks are permutation slots") {
    val rows = SparkEntry.queries("q420_borda")(spark, dir).collect()
    assert(rows.length == 15)
    val scores = rows.map(_.getAs[Long]("borda"))
    assert(scores.sorted.reverse.sameElements(scores), "descending order")
    val n = graft.Tables.t(spark, dir, "lineitem")
      .select("l_partkey").distinct().count()
    rows.foreach { r =>
      Seq("r_rev", "r_qty", "r_ord").foreach { c =>
        assert(r.getAs[Long](c) >= 1 && r.getAs[Long](c) <= n)
      }
      assert(r.getAs[Long]("borda") == 3 * n - r.getAs[Long]("r_rev") -
        r.getAs[Long]("r_qty") - r.getAs[Long]("r_ord"))
    }
  }

  test("q421 Burrows: symmetric pair set, self-distance absent, delta >= 0") {
    val rows = SparkEntry.queries("q421_burrows_delta")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("sa") < r.getAs[String]("sb"))
      assert(r.getAs[Long]("delta_milli") >= 0)
      assert(r.getAs[Long]("n_markers") >= 1 && r.getAs[Long]("n_markers") <= 30)
    }
    val srcs = (rows.map(_.getAs[String]("sa")) ++
      rows.map(_.getAs[String]("sb"))).distinct
    assert(rows.length == srcs.length * (srcs.length - 1) / 2,
      "every unordered source pair appears exactly once")
  }

  test("q422 greedy coverage: gains non-increasing, cum telescopes") {
    val rows = SparkEntry.queries("q422_greedy_coverage")(spark, dir)
      .collect().sortBy(_.getAs[Long]("step"))
    assert(rows.length == 3)
    val gains = rows.map(_.getAs[Long]("gain"))
    assert(gains.zip(gains.tail).forall { case (a, b) => b <= a },
      "submodularity: marginal gains never increase")
    assert(rows.map(_.getAs[String]("source")).distinct.length == 3,
      "a source is picked at most once")
    var cum = 0L
    rows.foreach { r => cum += r.getAs[Long]("gain")
      assert(r.getAs[Long]("cum") == cum) }
  }
}
