package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesW pack. */
class QueriesWSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q39 fuzzy join: every typo'd probe links back to exactly its source") {
    val rows = SparkEntry.queries("q39_fuzzy_join")(spark, dir).collect()
    val byLink = rows.map(r => r.getAs[String]("self_link") ->
      (r.getAs[Long]("n_links"), r.getAs[Long]("n_probes_linked"))).toMap
    val n = spark.read.parquet(s"$dir/customer.parquet").count()
    assert(byLink.contains("true"))
    assert(byLink("true") == ((n, n)), "each probe must link to its own source")
    // distance-1 deletions of unique 18-char names cannot reach other names
    assert(!byLink.contains("false"), s"unexpected cross-links: $byLink")
  }

  test("q12b work batches: full chunks except possibly the last, contiguous ids") {
    val rows = SparkEntry.queries("q12b_work_batches")(spark, dir).collect()
      .sortBy(_.getAs[Long]("batch_id"))
    assert(rows.nonEmpty)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("batch_id") == i, "batch ids are dense from 0")
      val n = r.getAs[Long]("n_tasks")
      if (i < rows.length - 1) assert(n == 16, "inner batches are full chunks")
      else assert(n >= 1 && n <= 16)
    }
  }
}
