package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesDN pack (ALS, item-item CF, leakage audit,
  * LSM write amplification). */
class QueriesDNSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q463 ALS: the least-squares half-sweep cannot raise the fit error") {
    val rows = SparkEntry.queries("q463_als_rank1")(spark, dir).collect()
    assert(rows.nonEmpty)
    val before = rows.map(_.getAs[Long]("sse_before")).distinct
    val after = rows.map(_.getAs[Long]("sse_after")).distinct
    assert(before.length == 1 && after.length == 1)
    // v' minimizes SSE given u exactly; quantization to micro can only
    // add a sliver — allow 0.1% slack
    assert(after.head <= before.head + before.head / 1000,
      s"ALS update must not raise SSE: ${before.head} -> ${after.head}")
    rows.foreach { r =>
      assert(r.getAs[Long]("v1_milli") >= 0)
      assert(r.getAs[Long]("n_raters") > 0)
    }
  }

  test("q464 item-item: cosine bounds, neighbor lists distinct") {
    val rows = SparkEntry.queries("q464_item_item_cf")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("brand")).foreach { case (b, rs) =>
      assert(rs.length <= 3)
      val cos = rs.sortBy(_.getAs[Long]("rk")).map(_.getAs[Long]("cos_micro"))
      assert(cos.zip(cos.tail).forall { case (a, c) => c <= a })
      cos.foreach(c => assert(c >= 0 && c <= 1000000))
      assert(!rs.map(_.getAs[String]("neighbor")).contains(b))
    }
  }

  test("q465 leakage: naive features dominate clean, both labels present") {
    val rows = SparkEntry.queries("q465_leakage_audit")(spark, dir).collect()
    assert(rows.length == 2, "label classes 0 and 1 both populated")
    rows.foreach { r =>
      assert(r.getAs[Long]("naive_total") >= r.getAs[Long]("clean_total"))
      assert(r.getAs[Long]("leaked_users") <= r.getAs[Long]("users"))
      assert(r.getAs[Long]("inflation_milli") >= 0)
    }
  }

  test("q466 LSM: leveled writes more than tiered, identities hold") {
    val rows = SparkEntry.queries("q466_lsm_wa")(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val l = r.getAs[Long]("levels")
      assert(l >= 1)
      assert(r.getAs[Long]("wa_leveled_x2") == 2 + 11 * l)
      assert(r.getAs[Long]("wa_tiered_x2") == 2 + 2 * l)
      assert(r.getAs[Long]("written_leveled") > r.getAs[Long]("written_tiered"))
      assert(r.getAs[Long]("written_tiered") >= r.getAs[Long]("bytes"))
    }
  }
}
