package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesCU pack (FOR bit-packing, Little's law,
  * directional width, PMI collocations). */
class QueriesCUSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q391 FOR packing: bytes conserved and bounded") {
    val rows = SparkEntry.queries("q391_for_bitpack")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("bits") >= 0 && r.getAs[Long]("bits") <= 64)
      assert(r.getAs[Long]("packed_bytes") > 0)
      assert(r.getAs[Long]("savings_bp") < 10000)
      assert(r.getAs[Long]("raw_bytes") >= r.getAs[Long]("n_blocks") * 8)
    }
  }

  test("q392 Little's law: sweep integral equals Σduration exactly") {
    val rows = SparkEntry.queries("q392_littles_law")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("identity_ok") == 1)
      assert(r.getAs[Long]("area_ms") == r.getAs[Long]("sum_dur_ms"),
        "∫concurrency dt must equal the sum of interval lengths")
      assert(r.getAs[Long]("l_sweep_micro") == r.getAs[Long]("l_direct_micro"))
      assert(r.getAs[Long]("t_ms") > 0)
    }
  }

  test("q393 directional width: widths within the coordinate envelope") {
    val rows = SparkEntry.queries("q393_directional_width")(spark, dir).collect()
    assert(rows.length == 40, "5 event types × 8 directions")
    rows.foreach { r =>
      val (dx, dy) = (r.getAs[Int]("dx"), r.getAs[Int]("dy"))
      val bound = math.abs(dx) * 36000L + math.abs(dy) * 17000L
      val w = r.getAs[Long]("width")
      assert(w >= 0 && w <= bound,
        s"support width along ($dx,$dy) exceeds the lattice extent")
    }
  }

  test("q394 PMI: frequent pairs attract, counts consistent") {
    val rows = SparkEntry.queries("q394_pmi_collocations")(spark, dir).collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      assert(r.getAs[Long]("c2") <= r.getAs[Long]("cx"),
        "bigram count cannot exceed first-word unigram count")
      assert(r.getAs[Long]("c2") <= r.getAs[Long]("cy"))
    }
  }
}
