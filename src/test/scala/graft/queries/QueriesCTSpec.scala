package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesCT pack (JL distortion, second-price
  * auctions, phonetic blocking, k-truss support). */
class QueriesCTSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q387 JL: ratio stats ordered, shares bounded") {
    val r = SparkEntry.queries("q387_jl_distortion")(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_pairs") > 0)
    val (mn, mx, mean) = (r.getAs[Long]("min_ratio_micro"),
      r.getAs[Long]("max_ratio_micro"), r.getAs[Long]("mean_ratio_micro"))
    assert(mn <= mean && mean <= mx)
    assert(mn >= 0, "squared-distance ratio cannot be negative")
    assert(r.getAs[Long]("within_30pct_bp") <= 10000)
  }

  test("q388 second price: p2 ≤ p1 revenue, ratio ≤ 10000 bp") {
    val rows = SparkEntry.queries("q388_second_price")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("rev_second_cents") <= r.getAs[Long]("rev_first_cents"),
        "second price is never above the winning bid")
      assert(r.getAs[Long]("ratio_bp") <= 10000)
      assert(r.getAs[Long]("n_auctions") > 0)
    }
  }

  test("q389 phonetic: keys are 4 chars, examples collide consistently") {
    val rows = SparkEntry.queries("q389_phonetic_block")(spark, dir).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[String]("pkey").length == 4)
      assert(r.getAs[Long]("n_words") <= r.getAs[Long]("n_occ"))
      // first/last word share the key's leading letter
      assert(r.getAs[String]("first_word").head.toUpper ==
        r.getAs[String]("pkey").head)
      assert(r.getAs[String]("last_word").head.toUpper ==
        r.getAs[String]("pkey").head)
    }
    // the synthetic ~31-word corpus is phonetically collision-free —
    // exactly one distinct word per key IS the correctness signal here
    // (a buggy key that merged or split words would break it)
    assert(rows.forall(_.getAs[Long]("n_words") == 1))
    assert(rows.map(_.getAs[String]("pkey")).distinct.length == 20)
  }

  test("q390 k-truss: truss counts consistent with the support histogram") {
    val rows = SparkEntry.queries("q390_ktruss_support")(spark, dir).collect()
    assert(rows.nonEmpty)
    val t3 = rows.head.getAs[Long]("truss3_edges")
    val t4 = rows.head.getAs[Long]("truss4_edges")
    assert(t4 <= t3, "4-truss is a subgraph of the 3-truss")
    val withSupport = rows.filter(_.getAs[Long]("support_bucket") >= 1)
      .map(_.getAs[Long]("n_edges")).sum
    assert(withSupport == t3,
      "edges with support ≥ 1 are exactly the 3-truss survivors")
  }
}
