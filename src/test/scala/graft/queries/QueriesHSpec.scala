package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Structural invariants of the round-4 queries on the real testdata —
  * cross-checks the algebra the oracle can't see (the oracle proves
  * engine parity; these prove the numbers mean what they claim). */
class QueriesHSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q80 cube: grand total row equals the sum of each full-detail slice") {
    val rows = SparkEntry.queries("q80_cube")(spark, dir).collect()
    val byGid = rows.groupBy(_.getAs[Long]("gid"))
    val detailN = byGid(0L).map(_.getAs[Long]("n")).sum
    val grand = byGid(3L) // both columns rolled up
    assert(grand.length == 1 && grand.head.getAs[Long]("n") == detailN)
    // each single-rollup level re-partitions the same total
    assert(byGid(1L).map(_.getAs[Long]("n")).sum == detailN)
    assert(byGid(2L).map(_.getAs[Long]("n")).sum == detailN)
  }

  test("q81 deciles: per-segment counts cover every customer, lo <= hi monotone") {
    val rows = SparkEntry.queries("q81_ntile_deciles")(spark, dir).collect()
    val nCustomers = graft.Tables.t(spark, dir, "customer").count()
    assert(rows.map(_.getAs[Long]("n")).sum == nCustomers)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val byDecile = rs.sortBy(_.getAs[Long]("decile"))
      assert(byDecile.forall(r => r.getAs[Double]("lo") <= r.getAs[Double]("hi")))
      // decile bucket boundaries are non-decreasing across the segment
      val his = byDecile.map(_.getAs[Double]("hi"))
      assert(his.zip(his.tail).forall { case (a, b) => a <= b })
    }
  }

  test("q82 set ops: inclusion-exclusion holds (either = a_only + b_only + both)") {
    val m = SparkEntry.queries("q82_set_ops")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    assert(m("either") == m("a_only") + m("b_only") + m("both"))
    assert(m.values.forall(_ >= 0))
  }

  test("q36 keep-best: keeper is a member, clusters match q35's clustering") {
    val keep = SparkEntry.queries("q36_dedup_keep_best")(spark, dir).collect()
    val q35 = SparkEntry.queries("q35_dedup_cluster")(spark, dir).collect()
      .map(r => r.getAs[Long]("cluster") -> r.getAs[Long]("n_docs")).toMap
    assert(keep.nonEmpty && keep.length == q35.size)
    keep.foreach { r =>
      val cluster = r.getAs[Long]("cluster")
      assert(q35(cluster) == r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("keep_doc") >= cluster) // label = min doc id in cluster
      assert(r.getAs[Long]("drop_chars") >= 0L)
    }
  }

  test("q43 recall: bounded by [0, 10000] bp and consistent with n_hits") {
    val rows = SparkEntry.queries("q43_ann_recall")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (k, hits, bp) =
        (r.getAs[Long]("k_total"), r.getAs[Long]("n_hits"), r.getAs[Long]("recall_bp"))
      assert(hits >= 0 && hits <= k)
      assert(bp == hits * 10000 / k)
    }
  }

  test("q44 centroid: norm stats positive, centroid norm <= mean norm (Jensen)") {
    val rows = SparkEntry.queries("q44_centroid")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_vecs")
      val cnorm = r.getAs[Double]("cnorm6")
      val meanNorm = r.getAs[Double]("sum_norm") / n
      assert(n > 0 && cnorm >= 0)
      // ||mean(v)|| <= mean(||v||) — triangle inequality; rounding slack
      assert(cnorm <= meanNorm + 1e-5)
    }
  }

  test("q56 tf-idf: ranks are 1..3 per doc, df <= corpus size, scores non-increasing") {
    val rows = SparkEntry.queries("q56_tfidf")(spark, dir).collect()
    val nDocs = graft.Tables.t(spark, dir, "documents").count()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rn"))
      assert(sorted.map(_.getAs[Int]("rn")).toSeq == (1 to sorted.length))
      val scores = sorted.map(_.getAs[Double]("tfidf6"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    assert(rows.forall(_.getAs[Long]("df") <= nDocs))
  }

  test("q73 stream-dedup accounting: dup_events = n_events - n_keys >= 0") {
    val rows = SparkEntry.queries("q73_stream_dedup")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("dup_events") ==
        r.getAs[Long]("n_events") - r.getAs[Long]("n_keys"))
      assert(r.getAs[Long]("dup_events") >= 0)
    }
  }
}
