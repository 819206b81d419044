package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesDR pack (MRR/nDCG, counting Bloom,
  * shift-share, hashed embeddings). */
class QueriesDRSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q479 ranking metrics: bounds and reciprocal-rank identities") {
    val rows = SparkEntry.queries("q479_mrr_ndcg")(spark, dir).collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      val fr = r.getAs[Long]("first_rel")
      if (fr > 0) assert(r.getAs[Long]("rr_micro") == 1000000L / fr)
      else assert(r.getAs[Long]("rr_micro") == 0L)
      val nd = r.getAs[Long]("ndcg_micro")
      assert(nd >= 0 && nd <= 1000000,
        "nDCG in [0,1]: DCG cannot exceed the ideal ordering")
      assert(r.getAs[Long]("n_rel") <= 5)
      assert(r.getAs[Long]("dcg") <= r.getAs[Long]("idcg"))
    }
  }

  test("q480 counting Bloom: deletability without false negatives") {
    val r = SparkEntry.queries("q480_counting_bloom")(spark, dir)
      .collect().head
    assert(r.getAs[Long]("false_negatives") == 0L,
      "counting cells guarantee retained items never read zero")
    assert(r.getAs[Long]("ghost_present") <= r.getAs[Long]("n_deleted"))
    assert(r.getAs[Long]("max_counter") >= 1)
    assert(r.getAs[Long]("live_cells") <= 3 * 128)
  }

  test("q481 shift-share: components + residual reconstruct the delta") {
    val rows = SparkEntry.queries("q481_shift_share")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val delta = r.getAs[Long]("r2") - r.getAs[Long]("r1")
      assert(delta == r.getAs[Long]("national") + r.getAs[Long]("mix") +
        r.getAs[Long]("competitive") + r.getAs[Long]("residual"),
        "decomposition must reconcile exactly with the residual carried")
    }
    // national + mix components sum pattern: mix sums to ~0 across nations
    val mixTot = rows.map(_.getAs[Long]("mix")).sum
    val r1Tot = rows.map(_.getAs[Long]("r1")).sum
    assert(math.abs(mixTot) <= r1Tot / 100,
      "segment-mix effects largely cancel in aggregate")
  }

  test("q482 hashed embeddings: cosine bounds and full pair coverage") {
    val rows = SparkEntry.queries("q482_hash_embeddings")(spark, dir).collect()
    val langs = (rows.map(_.getAs[String]("la")) ++
      rows.map(_.getAs[String]("lb"))).distinct
    assert(rows.length == langs.length * (langs.length - 1) / 2)
    rows.foreach { r =>
      val c = r.getAs[Long]("cos_micro")
      assert(c >= -1000000 && c <= 1000000)
    }
  }
}
