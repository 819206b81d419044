package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesBB pack (session trigrams, ER clusters,
  * rare-vocabulary coverage). */
class QueriesBBSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q215 trigrams: top-15, descending, grams are 3 event types") {
    val rows = SparkEntry.queries("q215_session_3gram")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 15)
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, "sorted desc")
    rows.foreach { r =>
      assert(r.getAs[String]("gram").split(">").length == 3)
      assert(r.getAs[Long]("n") > 0L)
    }
  }

  test("q216 ER clusters: sizes >= 2, component count consistent with edges") {
    // sf0.01: blocked d<=2 edges exist (41 pairs); sf0.001 has none
    val rows = SparkEntry.queries("q216_er_clusters")(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("cluster_size") >= 2L,
        "label propagation only labels nodes that appear in edges")
      assert(r.getAs[Long]("n_clusters") > 0L)
    }
  }

  test("q217 rare coverage: bp bounds, covered <= total") {
    val rows = SparkEntry.queries("q217_rare_coverage")(spark, dir).collect()
    assert(rows.nonEmpty)
    val tot = rows.head.getAs[Long]("total_rare")
    rows.foreach { r =>
      assert(r.getAs[Long]("total_rare") == tot, "corpus constant")
      assert(r.getAs[Long]("n_rare_covered") <= tot)
      val bp = r.getAs[Long]("coverage_bp")
      assert(bp >= 0L && bp <= 10000L)
    }
  }
}
