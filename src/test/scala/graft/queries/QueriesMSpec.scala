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
}
