package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Structural invariants of the QueriesI pack on the real testdata (the
  * oracle proves engine parity; these prove the numbers mean what they
  * claim). */
class QueriesISpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q58 segment dedup: every reported segment has 5 words and n_occ >= 2") {
    val rows = SparkEntry.queries("q58_segment_dedup")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("seg").split(" ").length == 5)
      assert(r.getAs[Long]("n_occ") >= 2)
      assert(r.getAs[Long]("n_docs") <= r.getAs[Long]("n_occ"))
      assert(r.getAs[Long]("first_doc") <= r.getAs[Long]("last_doc"))
      // cross-doc duplicates only in this corpus: a doc never repeats
      // its own segment, so distinct docs == occurrences
      assert(r.getAs[Long]("n_docs") == r.getAs[Long]("n_occ"))
    }
  }

  test("q59 repetition: bp signals bounded, top-word implies dup-word consistency") {
    val rows = SparkEntry.queries("q59_repetition")(spark, dir).collect()
    val nDocs = graft.Tables.t(spark, dir, "documents")
      .filter("length(trim(text)) > 0").count()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      val (dup, top, bi, tri) = (r.getAs[Long]("dup_word_bp"), r.getAs[Long]("top_word_bp"),
        r.getAs[Long]("top_bigram_bp"), r.getAs[Long]("dup_trigram_bp"))
      assert(dup >= 0 && dup < 10000)
      assert(top > 0 && top <= 10000)
      assert(bi >= 0 && bi <= 10000)
      assert(tri >= 0 && tri < 10000)
      // a word repeated k times contributes k-1 dups: top_word_bp-derived
      // lower bound on dup_word_bp (top count - 1 duplicates at least)
      val n = r.getAs[Long]("n_words")
      val topCnt = top * n / 10000 // floor recovers at least the count - 1
      assert(dup * n / 10000 + n >= topCnt) // sanity: counts live on one scale
    }
  }

  test("q83 point-in-polygon: agrees with a driver-side ray-cast reimplementation") {
    val out = SparkEntry.queries("q83_point_in_polygon")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_inside")).toMap
    // reference implementation in plain Scala over collected points
    val pts = graft.Tables.t(spark, dir, "events")
      .selectExpr("event_id", "user_id").collect()
      .map { r =>
        val (e, u) = (r.getLong(0), r.getLong(1))
        val lng = ((u * 47 + e * 13) % 36000) / 100.0 - 180 + 0.005
        val lat = ((u * 31 + e * 7) % 17000) / 100.0 - 85 + 0.005
        (lng, lat)
      }
    val regions = graft.Tables.t(spark, dir, "region")
      .selectExpr("r_regionkey", "r_name").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getString(1)))
    val offs = Seq((-30, -40, 20, -35), (20, -35, 32, 10), (32, 10, 5, 45),
      (5, 45, -25, 20), (-25, 20, -30, -40))
    val expected = regions.map { case (k, name) =>
      val cx = k * 72 - 144.0
      val n = pts.count { case (px, py) =>
        val crossings = offs.count { case (dx1, dy1, dx2, dy2) =>
          val (x1, y1, x2, y2) = (cx + dx1, dy1.toDouble, cx + dx2, dy2.toDouble)
          ((y1 > py) != (y2 > py)) && px < x1 + (py - y1) * (x2 - x1) / (y2 - y1)
        }
        crossings % 2 == 1
      }
      name -> n.toLong
    }.filter(_._2 > 0).toMap
    assert(out == expected)
  }

  test("q86 stratified sample: achieved rate within 3x band of the target rate") {
    val rows = SparkEntry.queries("q86_stratified_sample")(spark, dir).collect()
    val target = Map("A" -> 1000L, "N" -> 500L, "R" -> 2500L)
    assert(rows.map(_.getString(0)).toSet == target.keySet)
    rows.foreach { r =>
      val bp = r.getAs[Long]("achieved_bp")
      val t = target(r.getString(0))
      // hash-uniformity: loose band (small SF); exactness is the oracle's job
      assert(bp > t / 3 && bp < t * 3)
      assert(r.getAs[Long]("n_sample") <= r.getAs[Long]("n_total"))
    }
  }

  test("q87 incremental agg: merged partials equal the full scan for every group") {
    val rows = SparkEntry.queries("q87_incremental_agg")(spark, dir).collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getAs[Boolean]("matches_full")))
  }
}
