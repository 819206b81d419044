package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesCR pack (prefix index, log2 histogram,
  * CUPED, pseudonym join). */
class QueriesCRSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q379 prefix index: completions share their prefix") {
    val rows = SparkEntry.queries("q379_prefix_index")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("top_completion")
        .startsWith(r.getAs[String]("prefix")))
      assert(r.getAs[Long]("n_words") <= r.getAs[Long]("occurrences"))
    }
  }

  test("q380 log2 histogram: shares ≈ 10000 bp; bit buckets plausible") {
    val rows = SparkEntry.queries("q380_log2_histogram")(spark, dir).collect()
    assert(rows.nonEmpty)
    val s = rows.map(_.getAs[Long]("share_bp")).sum
    assert(s > 10000 - rows.length && s <= 10000)
    rows.foreach { r =>
      val b = r.getAs[Long]("bits")
      assert(b >= 1 && b <= 40)
    }
  }

  test("q381 CUPED: adjusted variance ≤ raw variance (reduction ≥ 0)") {
    val r = SparkEntry.queries("q381_cuped")(spark, dir).collect()(0)
    assert(r.getAs[Long]("var_adj_n2") <= r.getAs[Long]("var_raw_n2"),
      "projecting out the covariate direction cannot increase variance")
    val red = r.getAs[Long]("reduction_bp")
    assert(red >= 0 && red <= 10000, "reduction is ρ² ∈ [0,1]")
  }

  test("q382 pseudonym join: every segment's joins preserved exactly") {
    val rows = SparkEntry.queries("q382_pseudonym_join")(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Int]("joins_preserved") == 1)
      assert(r.getAs[Long]("n_tokenized") == r.getAs[Long]("n_raw"))
    }
  }
}
