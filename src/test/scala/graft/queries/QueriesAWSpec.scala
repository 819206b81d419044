package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesAW pack (token bucket, k-core peel, MIPS
  * pruning, booking quote). */
class QueriesAWSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q194 token bucket: equals sequential in-memory replay") {
    val ev = graft.Tables.t(spark, dir, "events")
      .selectExpr("user_id", "ts DIV 1000000 AS ts_ms", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cap = 500L; val cost = 25L
    val expected = ev.groupBy(_._1).map { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      var tok = cap; var prev = sorted.head._2; var thr = 0L
      sorted.foreach { case (_, ts, _) =>
        tok = math.min(cap, tok + (ts - prev) / 1000L)
        if (tok >= cost) tok -= cost else thr += 1L
        prev = ts
      }
      u -> ((sorted.length.toLong, thr, tok))
    }
    val got = SparkEntry.queries("q194_token_bucket")(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("n_throttled"),
          r.getAs[Long]("final_tokens")))).toMap
    assert(got.size == expected.size)
    expected.foreach { case (u, e) => assert(got(u) == e, s"user $u") }
  }

  test("q195 kcore: survivors shrink monotonically; all degrees >= 3 would hold at fixpoint") {
    val rows = SparkEntry.queries("q195_kcore")(spark, dir).collect()
      .sortBy(_.getAs[Long]("round"))
    assert(rows.map(_.getAs[Long]("round")).toSeq == Seq(1L, 2L, 3L))
    val nodes = rows.map(_.getAs[Long]("n_nodes"))
    val edgesN = rows.map(_.getAs[Long]("n_edges"))
    assert(nodes.zip(nodes.tail).forall { case (a, b) => a >= b })
    assert(edgesN.zip(edgesN.tail).forall { case (a, b) => a >= b })
    // an edge needs 2 endpoints of degree>=3 ⇒ edges >= ceil(3*nodes/2)/... weak sanity:
    rows.foreach { r =>
      if (r.getAs[Long]("n_nodes") > 0)
        assert(r.getAs[Long]("n_edges") * 2 >= r.getAs[Long]("n_nodes"),
          "each surviving node carries at least one edge")
    }
  }

  test("q196 mips: best is the true max dot; bound never prunes the best") {
    val rows = SparkEntry.queries("q196_mips_prune")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val np = r.getAs[Long]("n_prunable"); val nc = r.getAs[Long]("n_corpus")
      assert(np >= 0L && np < nc, "the best itself is never prunable")
      assert(r.getAs[Long]("prune_bp") == np * 10000 / nc)
    }
    // cross-check best_dot6 for one query against a brute recompute
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).toArray).toMap
    val q0 = emb(0L)
    val best = emb.view.filterKeys(_ != 0L).map { case (id, v) =>
      var d = 0.0
      var i = 0
      while (i < v.length) { d += q0(i).toDouble * v(i).toDouble; i += 1 }
      (math.floor(d * 1e6).toLong, -id)
    }.max
    val got = rows.find(_.getAs[Long]("q_id") == 0L).get
    assert(got.getAs[Long]("best_dot6") == best._1)
    assert(got.getAs[Long]("best_vec_id") == -best._2)
  }

  test("q197 quote: totals exceed base by 12%+tax+cleaning; markup consistent") {
    val rows = SparkEntry.queries("q197_booking_quote")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val base = r.getAs[Long]("sum_base_cents"); val tot = r.getAs[Long]("sum_total_cents")
      val n = r.getAs[Long]("n_orders")
      assert(tot > base)
      // service 12% + tax 8% on (base+service+cleaning): markup must be
      // at least 20% of base (plus fixed fees) and below 25%
      val markup = r.getAs[Long]("markup_bp")
      assert(markup >= 2000L, s"markup $markup")
      assert(markup <= 2500L + 10000L * 5000L * n / base, s"markup $markup")
      assert(r.getAs[Long]("avg_total_cents") == tot / n)
    }
  }
}
