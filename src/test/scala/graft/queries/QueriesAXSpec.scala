package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesAX pack (containment, STL decomposition,
  * lifecycle, tree rollup). */
class QueriesAXSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q198 containment: bp in [8000, 10000], asymmetric pairs, n_a consistent") {
    val rows = SparkEntry.queries("q198_containment")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bp = r.getAs[Long]("containment_bp")
      assert(bp >= 8000L && bp <= 10000L)
      assert(r.getAs[Long]("id_a") != r.getAs[Long]("id_b"))
      // containment of A in B can hit 10000 only when |A| <= |B|
      if (bp == 10000L) assert(r.getAs[Int]("n_a") <= r.getAs[Int]("n_b"))
    }
  }

  test("q199 STL: 7 dow rows, seasonal components roughly sum to zero") {
    val rows = SparkEntry.queries("q199_stl_decompose")(spark, dir).collect()
    assert(rows.length == 7)
    assert(rows.map(_.getAs[Long]("dow")).sorted.toSeq == (0L to 6L))
    // trend removal keeps each seasonal component well below the series
    // level, and the weighted components roughly cancel relative to the
    // total volume (short series leave boundary bias, so the bound is
    // scale-relative, not absolute)
    val total = rows.map(r => r.getAs[Long]("seasonal_milli") * r.getAs[Long]("n_days")).sum
    val volume = rows.map(r => r.getAs[Long]("mean_y_milli") * r.getAs[Long]("n_days")).sum
    assert(math.abs(total) * 20 <= volume,
      s"seasonal components should cancel to within 5% of volume: $total vs $volume")
    rows.foreach { r =>
      assert(math.abs(r.getAs[Long]("seasonal_milli")) < r.getAs[Long]("mean_y_milli"),
        "seasonal component below the series level")
    }
  }

  test("q200 lifecycle: active = new + retained + resurrected; churn bounded") {
    val rows = SparkEntry.queries("q200_lifecycle")(spark, dir).collect()
    assert(rows.nonEmpty)
    val byM = rows.map(r => r.getAs[Long]("m") -> r).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_active") ==
        r.getAs[Long]("n_new") + r.getAs[Long]("n_retained") + r.getAs[Long]("n_resurrected"))
      // churned-out of m <= active in m-1
      byM.get(r.getAs[Long]("m") - 1).foreach { prev =>
        assert(r.getAs[Long]("n_churned") <= prev.getAs[Long]("n_active"))
        // conservation with the previous month: actives(m-1) split into
        // retained(m) + churned(m)
        assert(prev.getAs[Long]("n_active") ==
          r.getAs[Long]("n_retained") + r.getAs[Long]("n_churned"))
      }
    }
  }

  test("q201 tree rollup: level-l subtree contains its level-(l+1) parent share") {
    val rows = SparkEntry.queries("q201_tree_rollup")(spark, dir).collect()
    assert(rows.nonEmpty)
    val m = rows.map(r => (r.getAs[Long]("node"), r.getAs[Int]("lvl")) ->
      r.getAs[Long]("subtree_cents")).toMap
    // whenever both (node, lvl) and (node DIV 10, lvl+1) are in the top-30,
    // the parent subtree must be >= the child subtree
    m.foreach { case ((node, lvl), cents) =>
      m.get((node / 10, lvl + 1)).foreach { parent =>
        assert(parent >= cents, s"parent of $node at lvl $lvl")
      }
    }
    // level-0 nodes are leaf parts: their subtree equals their own revenue
    val lvl0 = rows.filter(_.getAs[Int]("lvl") == 0)
    lvl0.foreach(r => assert(r.getAs[Long]("n_parts") == 1L))
  }
}
