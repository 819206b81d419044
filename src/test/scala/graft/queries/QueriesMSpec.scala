package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Structural invariants of the q45 Lloyd iteration. */
class QueriesMSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q45 kmeans: conservation, stability bounds, and a sane similarity") {
    val rows = SparkEntry.queries("q45_kmeans_iter")(spark, dir).collect()
    assert(rows.nonEmpty)
    val nVecs = graft.Tables.t(spark, dir, "embeddings").count()
    // every vector is assigned in both iterations
    assert(rows.map(_.getAs[Long]("n_iter1")).sum == nVecs)
    assert(rows.map(_.getAs[Long]("n_iter2")).sum == nVecs)
    rows.foreach { r =>
      val (n1, n2, stable) = (r.getAs[Long]("n_iter1"), r.getAs[Long]("n_iter2"),
        r.getAs[Long]("n_stable"))
      assert(stable <= n1 && stable <= math.max(n2, stable)) // stay ⊆ both sides
      assert(r.getAs[Double]("mean_sim6") >= -1.0 && r.getAs[Double]("mean_sim6") <= 1.0)
    }
    // the M-step should not destroy cohesion: most vectors stay put
    val stay = rows.map(_.getAs[Long]("n_stable")).sum
    assert(stay * 10 >= nVecs * 5, s"only $stay/$nVecs stable after one Lloyd step")
  }

  test("q96 CMS: one-sided estimate, exact recovery for dominant tokens") {
    val rows = SparkEntry.queries("q96_cms_heavy_hitters")(spark, dir).collect()
    assert(rows.length == 15)
    rows.foreach { r =>
      // the count-min guarantee: never an underestimate
      assert(r.getAs[Long]("overcount") >= 0)
      assert(r.getAs[Long]("cms_n") ==
        r.getAs[Long]("exact_n") + r.getAs[Long]("overcount"))
    }
    // with ~30 distinct tokens over 3x64 cells, estimates stay close:
    // total overcount is bounded well under the total mass
    val totalExact = rows.map(_.getAs[Long]("exact_n")).sum
    val totalOver = rows.map(_.getAs[Long]("overcount")).sum
    assert(totalOver < totalExact, s"overcount $totalOver vs exact $totalExact")
  }
}
