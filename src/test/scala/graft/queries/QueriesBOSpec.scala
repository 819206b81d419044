package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesBO pack (keyword retrieval, HHI, repeat
  * purchase, fanout profile). */
class QueriesBOSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q266 keyword: tf ranked desc, results <= 10") {
    val rows = SparkEntry.queries("q266_keyword_search")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val tfs = rows.map(_.getAs[Long]("tf"))
    assert(tfs.zip(tfs.tail).forall { case (a, b) => a >= b })
    assert(tfs.forall(_ >= 2L), "a doc matching both terms has tf >= 2")
  }

  test("q267 hhi: bounded by (10000/n_suppliers, 10000]") {
    val rows = SparkEntry.queries("q267_hhi")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Long]("hhi"); val n = r.getAs[Long]("n_suppliers")
      assert(h <= 10000L)
      assert(h >= 10000L / n - 10L, "HHI is minimized by equal shares (floor slack)")
    }
  }

  test("q268 repeat: bp consistent, repeats bounded") {
    val rows = SparkEntry.queries("q268_repeat_purchase")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_repeat") <= r.getAs[Long]("n_pairs"))
      assert(r.getAs[Long]("repeat_bp") ==
        r.getAs[Long]("n_repeat") * 10000L / r.getAs[Long]("n_pairs"))
    }
  }

  test("q269 fanout: three relations, min <= mean <= max") {
    val rows = SparkEntry.queries("q269_fanout_profile")(spark, dir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val mn = r.getAs[Long]("min_fanout"); val mx = r.getAs[Long]("max_fanout")
      val mean = r.getAs[Long]("mean_fanout_milli")
      assert(mn * 1000L <= mean && mean <= mx * 1000L)
    }
  }
}
