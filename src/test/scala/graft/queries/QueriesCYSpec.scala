package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesCY pack (Erlang-C staffing, join-order
  * enumeration, Naive Bayes, isotonic calibration). */
class QueriesCYSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q407 Erlang: staffing covers load, wait prob under the SLA") {
    val rows = SparkEntry.queries("q407_erlang_staffing")(spark, dir).collect()
    assert(rows.length == 24, "one staffing decision per hour of day")
    rows.foreach { r =>
      val (a, c, w) = (r.getAs[Long]("offered_micro"), r.getAs[Long]("c_req"),
        r.getAs[Long]("wait_micro"))
      assert(c >= 1, "synthetic load is well under the 24-agent cap")
      assert(c * 1000000L > a, "required agents must exceed the offered load")
      assert(w >= 0 && w <= 200000,
        "wait probability at c_req is within the 20% SLA")
    }
  }

  test("q408 join order: FK-first plans beat the cross-product plan") {
    val rows = SparkEntry.queries("q408_join_order_dp")(spark, dir).collect()
    assert(rows.length == 3)
    val byPlan = rows.map(r => r.getAs[String]("plan") -> r).toMap
    val cross = byPlan("LxC_then_O")
    assert(cross.getAs[Long]("rk") == 3,
      "the unjoinable-pair cross product must cost the most")
    rows.foreach { r =>
      assert(r.getAs[Long]("total_cost") ==
        r.getAs[Long]("first_rows") + r.getAs[Long]("n_final"))
    }
    assert(rows.count(_.getAs[Long]("is_best") == 1L) == 1)
  }

  test("q409 Naive Bayes: confusion matrix covers the eval split exactly once") {
    val rows = SparkEntry.queries("q409_naive_bayes")(spark, dir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    import org.apache.spark.sql.functions._
    val evalDocs = graft.Tables.t(spark, dir, "documents")
      .withColumn("h", graft.functions.PortableHash
        .md5Long(col("doc_id"), salt = "split~") % 100)
      .where(col("h") >= 90).count()
    assert(total == evalDocs, "every test-split doc gets exactly one prediction")
    rows.foreach(r => assert(r.getAs[Long]("n_docs") > 0))
  }

  test("q410 isotonic: fit is monotone and pools within the raw range") {
    val rows = SparkEntry.queries("q410_isotonic")(spark, dir).collect()
      .sortBy(_.getAs[Long]("dec"))
    assert(rows.nonEmpty)
    val iso = rows.map(_.getAs[Long]("iso_micro"))
    assert(iso.zip(iso.tail).forall { case (a, b) => b >= a },
      "isotonic fit must be non-decreasing")
    val raw = rows.map(_.getAs[Long]("raw_micro"))
    assert(iso.forall(v => v >= raw.min - 1 && v <= raw.max),
      "pooled averages stay inside the raw-rate envelope")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_conv") <= r.getAs[Long]("n_users"))
    }
  }
}
