package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants for the QueriesEC pack ((s,S) inventory, MMR retrieval,
  * Mann–Kendall trend, temperature mixture). */
class QueriesECSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q518 (s,S): brute-force replay matches; level bounds hold") {
    val out = SparkEntry.queries("q518_ss_inventory")(spark, dir).collect()
      .map(r => r.getAs[Long]("pk") -> r).toMap
    val daily = graft.Tables.t(spark, dir, "lineitem")
      .where("l_quantity IS NOT NULL")
      .selectExpr("l_partkey % 30 AS pk",
        "unix_millis(CAST(l_shipdate AS TIMESTAMP)) DIV 86400000 AS day",
        "CAST(floor(l_quantity + 0.5) AS BIGINT) AS q")
      .groupBy("pk", "day").agg(expr("CAST(sum(q) AS BIGINT) AS d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    daily.foreach { case (pk, rows) =>
      var lvl = 300L; var ord = 0L; var so = 0L
      rows.sortBy(_._2).foreach { case (_, _, d) =>
        val t = lvl - d
        if (t < 0) so += 1
        if (t < 75) { ord += 1; lvl = 300 } else lvl = t
      }
      val r = out(pk)
      assert(r.getAs[Long]("n_days") == rows.length.toLong)
      assert(r.getAs[Long]("n_orders") == ord, s"pk=$pk orders")
      assert(r.getAs[Long]("n_stockouts") == so, s"pk=$pk stockouts")
      assert(r.getAs[Long]("end_level") == lvl, s"pk=$pk level")
      assert(lvl >= 75 && lvl <= 300,
        "post-policy level always sits in [s, S]")
      assert(so <= ord, "every stockout day also triggers a reorder")
    }
  }

  test("q519 MMR: picks are distinct, first pick is max relevance, " +
      "and every later pick maximizes the penalized score at its step") {
    val out = SparkEntry.queries("q519_mmr_diversify")(spark, dir).collect()
    assert(out.length == 10)
    val ids = out.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length == 10, "no candidate picked twice")
    val rel = out.map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("rel_micro")).toMap
    // pick 1 is pure relevance (penalty 0)
    assert(out.head.getAs[Long]("penalty_micro") == 0L)
    assert(out.head.getAs[Long]("score10") == 7 * out.head.getAs[Long]("rel_micro"))
    // scores are the greedy's own maxima: monotone structure means the
    // same vec never scores higher than the pick made at its own step
    out.foreach { r =>
      assert(r.getAs[Long]("score10") ==
        7 * r.getAs[Long]("rel_micro") - 3 * r.getAs[Long]("penalty_micro"))
      assert(r.getAs[Long]("rel_micro") <= rel.values.max)
    }
    // diversity: MMR must not return the plain top-10 by relevance when
    // penalties bite — verify penalties are non-trivial on this corpus
    assert(out.map(_.getAs[Long]("penalty_micro")).max > 0L)
  }

  test("q520 Mann–Kendall: inversion-count recomputation of S and the " +
      "tie-corrected variance match") {
    val r = SparkEntry.queries("q520_mann_kendall")(spark, dir).collect().head
    val daily = graft.Tables.t(spark, dir, "orders")
      .where("o_totalprice IS NOT NULL")
      .selectExpr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS day",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
      .groupBy("day").agg(expr("CAST(sum(cents) AS BIGINT) DIV 1000 AS rev"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1)
    val n = daily.length.toLong
    var sS = 0L
    for (i <- daily.indices; j <- (i + 1) until daily.length)
      sS += java.lang.Long.signum(daily(j)._2 - daily(i)._2).toLong
    val tt = daily.groupBy(_._2).values.map(_.length.toLong)
      .map(t => t * (t - 1) * (2 * t + 5)).sum
    val var18 = n * (n - 1) * (2 * n + 5) - tt
    assert(r.getAs[Long]("n_days") == n)
    assert(r.getAs[Long]("s_stat") == sS)
    assert(r.getAs[Long]("var18") == var18)
    val z = if (sS > 0) (sS - 1) / math.sqrt(var18 / 18.0)
      else if (sS < 0) (sS + 1) / math.sqrt(var18 / 18.0) else 0.0
    assert(r.getAs[Long]("z_milli") == math.floor(z * 1000).toLong)
  }

  test("q521 temperature mixture: weights sum to ~1e6 and T=2 flattens " +
      "the distribution (small groups boosted, big groups damped)") {
    val out = SparkEntry.queries("q521_temperature_mixture")(spark, dir).collect()
    assert(out.nonEmpty)
    val wSum = out.map(_.getAs[Long]("w_ppm")).sum
    val sSum = out.map(_.getAs[Long]("share_ppm")).sum
    // integer floor division loses at most 1 ppm per group
    assert(wSum <= 1000000L && wSum >= 1000000L - out.length)
    assert(sSum <= 1000000L && sSum >= 1000000L - out.length)
    val biggest = out.maxBy(_.getAs[Long]("n"))
    val smallest = out.minBy(_.getAs[Long]("n"))
    assert(biggest.getAs[Long]("boost_bp") <= 10000,
      "largest group is damped (boost ≤ 1)")
    assert(smallest.getAs[Long]("boost_bp") >= 10000,
      "smallest group is boosted (boost ≥ 1)")
  }
}
