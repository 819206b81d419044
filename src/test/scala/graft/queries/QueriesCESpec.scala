package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesCE pack (modularity, inverted index,
  * FIFO matching, fair share). */
class QueriesCESpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q327 modularity: Σe_c ≤ m implied by Σd_c = 2m; Q within [-1, 1]") {
    val rows = SparkEntry.queries("q327_modularity")(spark, dir).collect()
    assert(rows.nonEmpty)
    val q = rows.map(_.getAs[Long]("contrib_micro")).sum
    assert(q >= -1000000 && q <= 1000000, "modularity is bounded")
    rows.foreach(r => assert(r.getAs[Long]("e_c") >= 0))
  }

  test("q328 inverted index: df ≤ cf, postings head ≤ 5 sorted ids") {
    val rows = SparkEntry.queries("q328_inverted_index")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("df") <= r.getAs[Long]("cf"))
      val ids = r.getAs[String]("postings_head").split(",").map(_.toLong).toSeq
      assert(ids.length <= 5 && ids == ids.sorted)
    }
  }

  test("q329 FIFO: allocations conserve min(supply, demand) per bucket") {
    val rows = SparkEntry.queries("q329_fifo_match")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("alloc_qty") > 0)
      assert(r.getAs[Long]("n_split_lots") <= r.getAs[Long]("n_allocs"))
    }
  }

  test("q330 fair share: Σalloc == capacity; nobody over-allocated") {
    val rows = SparkEntry.queries("q330_fair_share")(spark, dir).collect()
    assert(rows.nonEmpty)
    val totalD = rows.map(_.getAs[Long]("d")).sum
    val totalA = rows.map(_.getAs[Long]("alloc")).sum
    assert(totalA == totalD / 2, "water level exhausts the capacity exactly")
    rows.foreach { r =>
      assert(r.getAs[Long]("alloc") <= r.getAs[Long]("d"),
        "max-min fairness never exceeds demand")
    }
  }
}
