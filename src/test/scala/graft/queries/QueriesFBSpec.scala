package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariants for the QueriesFB pack (selectivity feedback, encoding
  * advisor, position bias, IVF nprobe sweep). */
class QueriesFBSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q617 selectivity: actuals recount and estimates stay in [0, n]") {
    val out = SparkEntry.queries("q617_selectivity_feedback")(spark, dir).collect()
    assert(out.length == 5)
    val n = Tables.t(spark, dir, "lineitem").count()
    out.foreach { r =>
      assert(r.getAs[Long]("est_rows") >= 0 && r.getAs[Long]("est_rows") <= n)
      assert(r.getAs[Long]("act_rows") >= 0 && r.getAs[Long]("act_rows") <= n)
    }
  }

  test("q618 encoding advisor: stats are internally consistent and the " +
      "rule priority is honored") {
    val out = SparkEntry.queries("q618_encoding_advisor")(spark, dir).collect()
    assert(out.length == 4)
    out.foreach { r =>
      val (n, ndv, runs) = (r.getAs[Long]("n"), r.getAs[Long]("ndv"),
        r.getAs[Long]("n_runs"))
      assert(ndv <= n && runs <= n && runs >= 1)
      val enc = r.getAs[String]("encoding")
      if (n >= runs * 3) assert(enc == "rle")
      else if (ndv * 100 <= n) assert(enc == "dict")
      else if (r.getAs[Long]("width_bits") <= 16) assert(enc == "for_bitpack")
      else assert(enc == "plain")
    }
  }

  test("q619 position bias: positions are 1..10 and event counts are " +
      "monotone non-increasing in position") {
    val out = SparkEntry.queries("q619_position_bias")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val p = r.getAs[Long]("pos")
      assert(p >= 1 && p <= 10)
      assert(r.getAs[Long]("n_clicks") + r.getAs[Long]("n_purchases")
        <= r.getAs[Long]("n_events"))
    }
    // position p+1 can only exist within a session that also has p
    val evs = out.sortBy(_.getAs[Long]("pos")).map(_.getAs[Long]("n_events"))
    assert(evs.zip(evs.tail).forall { case (a, b) => b <= a })
  }

  test("q620 nprobe sweep: recall is monotone in nprobe and within range") {
    val out = SparkEntry.queries("q620_ivf_nprobe_sweep")(spark, dir).collect()
      .sortBy(_.getAs[Long]("nprobe"))
    assert(out.map(_.getAs[Long]("nprobe")).toSeq == Seq(1L, 2L, 4L))
    val rec = out.map(_.getAs[Long]("recall_bp"))
    rec.foreach(bp => assert(bp >= 0 && bp <= 10000))
    assert(rec.zip(rec.tail).forall { case (a, b) => b >= a },
      "probing more cells can only find more of the ground truth")
  }
}
