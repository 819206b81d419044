package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesDM pack (CMS change, V-opt histogram,
  * self-excitation, k-anonymity). */
class QueriesDMSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q459 change hitters: CMS one-sidedness per half, deltas ordered") {
    val rows = SparkEntry.queries("q459_cms_change")(spark, dir).collect()
    assert(rows.length == 10)
    val deltas = rows.map(_.getAs[Long]("delta"))
    assert(deltas.sorted.reverse.sameElements(deltas))
    rows.foreach { r =>
      assert(r.getAs[Long]("over1") >= 0, "CMS estimate >= true count (half 1)")
      assert(r.getAs[Long]("over2") >= 0, "CMS estimate >= true count (half 2)")
      assert(r.getAs[Long]("delta") ==
        math.abs(r.getAs[Long]("c1") - r.getAs[Long]("c2")))
    }
  }

  test("q460 V-opt: optimal SSE never exceeds the equi-width baseline") {
    val rows = SparkEntry.queries("q460_vopt_histogram")(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("sse_micro") <= r.getAs[Long]("equi_sse_micro"),
        "the enumerated optimum includes the 6/12/18 baseline")
      assert(r.getAs[Long]("improvement_bp") >= 0)
      val (c1, c2, c3) = (r.getAs[Long]("c1"), r.getAs[Long]("c2"),
        r.getAs[Long]("c3"))
      assert(c1 >= 1 && c1 < c2 && c2 < c3 && c3 <= 23)
      assert(r.getAs[Long]("sse_micro") >= 0)
    }
  }

  test("q461 self-excitation: probabilities in bounds") {
    val rows = SparkEntry.queries("q461_self_excitation")(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("p_obs_bp") >= 0 && r.getAs[Long]("p_obs_bp") <= 10000)
      assert(r.getAs[Long]("p_exp_bp") >= 0 && r.getAs[Long]("p_exp_bp") <= 10000)
      assert(r.getAs[Long]("short_gaps") <= r.getAs[Long]("n_gaps"))
      assert(r.getAs[Long]("n_gaps") == r.getAs[Long]("n") - 1)
    }
  }

  test("q462 k-anonymity: generalization monotonically reduces risk") {
    val rows = SparkEntry.queries("q462_kanonymity")(spark, dir)
      .collect().sortBy(_.getAs[Long]("level"))
    assert(rows.length == 3)
    val kmins = rows.map(_.getAs[Long]("k_min"))
    assert(kmins.zip(kmins.tail).forall { case (a, b) => b >= a },
      "dropping a QI can only merge classes and raise min k")
    val classes = rows.map(_.getAs[Long]("classes"))
    assert(classes.zip(classes.tail).forall { case (a, b) => b <= a })
    val risk = rows.map(_.getAs[Long]("risk_bp"))
    assert(risk.zip(risk.tail).forall { case (a, b) => b <= a })
  }
}
