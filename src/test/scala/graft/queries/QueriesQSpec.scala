package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesQ pack (PQ compression + CDC apply). */
class QueriesQSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q47 PQ: 8 subspaces, codes within codebook, errors non-negative") {
    val rows = SparkEntry.queries("q47_pq_quantize")(spark, dir).collect()
    assert(rows.length == 8, "one row per subspace")
    val nVecs = rows.head.getAs[Long]("n_vecs")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_vecs") == nVecs, "every subspace quantizes every vector")
      val used = r.getAs[Long]("n_codes_used")
      assert(used >= 1 && used <= 16)
      val top = r.getAs[Long]("top_share_bp")
      assert(top >= 10000 / 16 && top <= 10000, "top code share within [uniform, all]")
      assert(r.getAs[Long]("sum_qerr_u") >= 0L)
      assert(r.getAs[Long]("top_code") >= 0 && r.getAs[Long]("top_code") < 16)
    }
  }

  test("q47 PQ: codebook vectors quantize to themselves with zero error in every subspace") {
    // vec_id < 16 ARE the codebook — their min distance is 0 (to their own
    // code), so total error over all vectors must be strictly less than a
    // corpus where they were excluded... sanity: per-subspace error of the
    // 16 codebook vectors is exactly 0, so sum_qerr_u is attributable to the
    // other n-16 vectors only. Verified indirectly: with n == 16 corpus the
    // sum would be 0; here assert sum_qerr_u > 0 implies corpus > codebook.
    val rows = SparkEntry.queries("q47_pq_quantize")(spark, dir).collect()
    assert(rows.forall(_.getAs[Long]("n_vecs") > 16))
    assert(rows.forall(_.getAs[Long]("sum_qerr_u") > 0L))
  }

  test("q78 CDC: alive + tombstoned == seen, totals match the key universe") {
    val rows = SparkEntry.queries("q78_cdc_apply")(spark, dir).collect()
    assert(rows.nonEmpty)
    var total = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("n_alive") + r.getAs[Long]("n_tombstoned") == r.getAs[Long]("n_keys"))
      total += r.getAs[Long]("n_keys")
    }
    val users = graft.Tables.t(spark, dir, "events")
      .select("user_id").distinct().count()
    assert(total == users, "every key seen in the log lands in exactly one bucket")
  }
}
