package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariants for the QueriesEX pack (bookings-chain cost planner,
  * SemDeDup cluster dedup). */
class QueriesEXSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q603 bookings chain: cap, 2-calls budget, and the AOI gate hold") {
    val out = SparkEntry.queries("q603_bookings_chain")(spark, dir).collect()
    assert(out.nonEmpty)
    val total = out.map(_.getAs[Long]("n_selected")).sum
    assert(total <= 500, "global top-500 staleness cap")
    out.foreach { r =>
      assert(r.getAs[Long]("api_calls") == 2 * r.getAs[Long]("n_selected"),
        "booking-detail chain costs exactly 2 API calls per listing")
      assert(r.getAs[Long]("n_never") <= r.getAs[Long]("n_selected"))
      // only AOI-gated nations (nationkey % 3 == 0) appear
      assert(r.getAs[String]("n_name") != null)
    }
    val aoiNames = Tables.t(spark, dir, "nation")
      .where(expr("n_nationkey % 3 = 0"))
      .select("n_name").collect().map(_.getString(0)).toSet
    out.foreach(r => assert(aoiNames(r.getAs[String]("n_name"))))
  }

  test("q604 SemDeDup: keeper is kept, kept+dup == bucket size, and every " +
      "bucket keeps at least one") {
    val out = SparkEntry.queries("q604_semdedup")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, dup, kept) = (r.getAs[Long]("n"), r.getAs[Long]("n_dup"),
        r.getAs[Long]("n_kept"))
      assert(dup + kept == n, "every bucket member is classified once")
      assert(kept >= 1, "the keeper itself is always kept")
      assert(r.getAs[Long]("keeper_id") >= 0)
    }
    // conservation: bucket sizes sum to the corpus vector count
    val vecs = Tables.t(spark, dir, "embeddings").count()
    assert(out.map(_.getAs[Long]("n")).sum == vecs)
  }
}
