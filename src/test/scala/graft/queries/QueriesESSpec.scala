package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants for the QueriesES pack (Allen census, Page–Hinkley,
  * interval union, weighted sampling). */
class QueriesESSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q586 Allen: relations partition the interval×window universe " +
      "(each pair lands in exactly one relation)") {
    val out = SparkEntry.queries("q586_allen_census")(spark, dir).collect()
    val nIv = graft.Tables.t(spark, dir, "orders")
      .join(graft.Tables.t(spark, dir, "lineitem"),
        expr("o_orderkey = l_orderkey"))
      .groupBy("o_orderkey", "o_orderdate")
      .agg(max(expr(
        "unix_millis(CAST(l_shipdate AS TIMESTAMP)) DIV 86400000")).as("e"))
      .where(expr(
        "e >= unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000"))
      .count()
    (1L to 4L).foreach { w =>
      assert(out.filter(_.getAs[Long]("win_id") == w)
        .map(_.getAs[Long]("n")).sum == nIv, s"window $w partitions")
    }
    val rels = out.map(_.getAs[String]("rel")).toSet
    assert(rels.subsetOf(Set("before", "meets", "overlaps", "starts",
      "during", "finishes", "equals", "finished_by", "contains",
      "started_by", "overlapped_by", "met_by", "after")))
  }

  test("q587 Page-Hinkley: recurrence matches a driver replay") {
    val r = SparkEntry.queries("q587_page_hinkley")(spark, dir)
      .collect().head
    val ys = graft.Tables.t(spark, dir, "orders")
      .selectExpr(
        "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS day")
      .groupBy("day").count().orderBy("day")
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    var m = 0L; var minM = 0L; var cum = 0L; var n = 0L
    var alerts = 0L; var firstDay = -1L; var maxGap = 0L
    ys.foreach { case (day, y) =>
      cum += y; n += 1
      m += y * 1000L - cum * 1000L / n - 500L
      if (m < minM) minM = m
      val gap = m - minM
      if (gap > maxGap) maxGap = gap
      if (gap > 50000L) { alerts += 1; if (firstDay < 0) firstDay = day }
    }
    assert(r.getAs[Long]("n_days") == n)
    assert(r.getAs[Long]("n_alerts") == alerts)
    assert(r.getAs[Long]("first_alert_day") == firstDay)
    assert(r.getAs[Long]("max_gap_milli") == maxGap)
  }

  test("q588 interval union: per-customer coverage equals a driver " +
      "replay of merged intervals, histogram partitions customers") {
    val out = SparkEntry.queries("q588_interval_union")(spark, dir)
      .collect()
    val ivs = graft.Tables.t(spark, dir, "orders")
      .join(graft.Tables.t(spark, dir, "lineitem"),
        expr("o_orderkey = l_orderkey"))
      .groupBy("o_orderkey", "o_custkey", "o_orderdate")
      .agg(max(expr(
        "unix_millis(CAST(l_shipdate AS TIMESTAMP)) DIV 86400000")).as("e"))
      .selectExpr("o_custkey AS ck",
        "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS s", "e")
      .where("e >= s")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val perCk = ivs.groupBy(_._1).map { case (ck, xs) =>
      val sorted = xs.map(t => (t._2, t._3)).sortBy(identity)
      var cov = 0L; var runs = 0L
      var curS = Long.MinValue; var curE = Long.MinValue
      sorted.foreach { case (s0, e0) =>
        if (curE == Long.MinValue || s0 > curE + 1) {
          if (curE != Long.MinValue) cov += curE - curS + 1
          curS = s0; curE = e0; runs += 1
        } else if (e0 > curE) curE = e0
      }
      if (curE != Long.MinValue) cov += curE - curS + 1
      ck -> (cov, runs)
    }
    val expHist = perCk.values.groupBy(_._1 / 100).map { case (b, g) =>
      b -> (g.size.toLong, g.map(_._2).sum)
    }
    assert(out.length == expHist.size)
    out.foreach { r =>
      val b = r.getAs[Long]("cov_bucket")
      assert((r.getAs[Long]("n_customers"), r.getAs[Long]("total_runs"))
        == expHist(b), s"bucket $b")
    }
  }

  test("q589 weighted sample: keys replay exactly and heavier items " +
      "dominate the sample vs a uniform baseline") {
    val out = SparkEntry.queries("q589_weighted_sample")(spark, dir)
      .collect()
    assert(out.length == 20)
    // keys are ln(u)/w: all ≤ 0, and the exact Spark/oracle formula is
    // already hash-checked — here verify the weighted-selection BIAS:
    // the sample's mean weight exceeds the population mean weight
    val popMean = graft.Tables.t(spark, dir, "lineitem")
      .selectExpr("l_partkey",
        "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v")
      .groupBy("l_partkey").agg(sum("v").as("w"))
      .agg(avg("w")).collect().head.getDouble(0)
    val sampleMean = out.map(_.getAs[Long]("w")).sum.toDouble / out.length
    assert(out.forall(_.getAs[Long]("key_f") <= 0))
    assert(sampleMean > popMean,
      s"weighted sampling is biased toward heavy items " +
        s"($sampleMean vs $popMean)")
  }
}
