package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesBD pack (dwell matrix, dedup savings,
  * label separation, link Jaccard). */
class QueriesBDSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q222 dwell: non-negative dwell, mean <= max, sorted by volume") {
    val rows = SparkEntry.queries("q222_dwell_matrix")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (x, y) => x >= y })
    rows.foreach { r =>
      assert(r.getAs[Long]("mean_dwell_ms") >= 0L)
      assert(r.getAs[Long]("mean_dwell_ms") <= r.getAs[Long]("max_dwell_ms"))
    }
  }

  test("q223 dedup savings: dropped <= docs, savings consistent with chars") {
    val rows = SparkEntry.queries("q223_dedup_savings")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dropped") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("chars_dropped") <= r.getAs[Long]("total_chars"))
      val bp = r.getAs[Long]("savings_bp")
      assert(bp >= 0L && bp <= 10000L)
      assert(bp == r.getAs[Long]("chars_dropped") * 10000L / r.getAs[Long]("total_chars"))
    }
  }

  test("q224 separation: cos in [-1e6, 1e6], labels intact, sample nonempty") {
    val rows = SparkEntry.queries("q224_label_separation")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("intra_cos6", "inter_cos6").foreach { c =>
        if (!r.isNullAt(r.fieldIndex(c))) {
          val v = r.getAs[Long](c)
          assert(v >= -1000000L && v <= 1000000L, s"$c=$v out of cosine range")
        }
      }
      assert(r.getAs[Long]("n_intra") + r.getAs[Long]("n_inter") > 0L)
    }
  }

  test("q225 link jaccard: bp in [0,10000], common bounded by min degree") {
    val rows = SparkEntry.queries("q225_link_jaccard")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val c = r.getAs[Long]("common")
      assert(c <= math.min(r.getAs[Long]("deg_a"), r.getAs[Long]("deg_b")))
      val bp = r.getAs[Long]("jacc_bp")
      assert(bp >= 0L && bp <= 10000L)
    }
  }
}
