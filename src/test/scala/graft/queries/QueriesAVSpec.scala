package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesAV pack (polygon centroid, autocorrelation,
  * tokenizer fertility, max drawdown). */
class QueriesAVSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q190 centroid: inside the pentagon bbox, area matches q89") {
    val rows = SparkEntry.queries("q190_polygon_centroid")(spark, dir).collect()
    assert(rows.nonEmpty)
    // pentagon offsets span x in [-30, 32], y in [-40, 45] around (cx, 0)
    val areas = SparkEntry.queries("q89_polygon_area")(spark, dir)
      .collect().map(r => r.getAs[String]("r_name") -> r.getAs[Long]("area2")).toMap
    rows.foreach { r =>
      val cx = r.getAs[Long]("cx_micro") / 1e6
      val cy = r.getAs[Long]("cy_micro") / 1e6
      assert(cy > -40 && cy < 45, s"cy $cy")
      assert(math.abs(r.getAs[Long]("a2")) == areas(r.getAs[String]("r_name")),
        "signed 2A magnitude must equal q89's |2A|")
      // centroid x must sit within the translated bbox
      assert(cx > -180 - 30 - 1 && cx < 180 + 32 + 1)
    }
  }

  test("q191 acf: lag-0 normalization sane, values in [-1000, 1000]") {
    val rows = SparkEntry.queries("q191_autocorr")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("acf1_milli", "acf2_milli", "acf3_milli").foreach { c =>
        if (!r.isNullAt(r.fieldIndex(c))) {
          val v = r.getAs[Long](c)
          assert(v >= -1000L && v <= 1000L, s"$c = $v out of [-1, 1]")
        }
      }
      assert(r.getAs[Long]("n_days") > 3L)
    }
  }

  test("q191 acf1 equals in-memory recompute") {
    val daily = graft.Tables.t(spark, dir, "events")
      .selectExpr("event_type", "ts DIV 1000000 DIV 86400000 AS d")
      .groupBy("event_type", "d").count()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = daily.groupBy(_._1).map { case (et, rows) =>
      val ys = rows.sortBy(_._2).map(_._3)
      val n = ys.length
      val s = ys.sum
      val dev = ys.map(y => n * y - s)
      val den = dev.map(d => d * d).sum
      val num = dev.dropRight(1).zip(dev.drop(1)).map { case (a, b) => a * b }.sum
      val milli = {
        val nn = num * 1000
        if (den == 0) 0L
        else if ((nn >= 0) == (den >= 0)) math.abs(nn) / math.abs(den)
        else -(math.abs(nn) / math.abs(den))
      }
      et -> milli
    }
    val got = SparkEntry.queries("q191_autocorr")(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("acf1_milli")).toMap
    expected.foreach { case (et, v) => assert(got(et) == v, s"$et acf1") }
  }

  test("q192 fertility: subwords <= chars, words <= chars, ratios consistent") {
    val rows = SparkEntry.queries("q192_fertility")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val chars = r.getAs[Long]("n_chars"); val w = r.getAs[Long]("n_words")
      val sub = r.getAs[Long]("n_subwords")
      assert(sub <= chars && w <= chars)
      if (w > 0) {
        assert(r.getAs[Long]("fertility_bp") == sub * 10000 / w)
        assert(r.getAs[Long]("chars_per_word_bp") == chars * 10000 / w)
      }
    }
  }

  test("q193 drawdown: dd bounded by peak, trough day exists, final <= peak") {
    val rows = SparkEntry.queries("q193_drawdown")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val peak = r.getAs[Long]("peak_cents"); val fin = r.getAs[Long]("final_cents")
      val dd = r.getAs[Long]("max_drawdown_cents")
      assert(dd >= 0L && dd <= peak)
      assert(fin <= peak)
      assert(dd >= peak - fin, "max drawdown at least the end-of-series drawdown")
      assert(!r.isNullAt(r.fieldIndex("trough_day")))
    }
  }
}
