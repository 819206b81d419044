package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants for the QueriesEG pack (LPT makespan, char entropy,
  * padding waste, uplift segments). */
class QueriesEGSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q534 LPT: replay matches, loads conserve work, and the 4/3 " +
      "guarantee holds against the lower bound") {
    val out = SparkEntry.queries("q534_lpt_makespan")(spark, dir).collect()
    assert(out.length == 4)
    val tasks = graft.Tables.t(spark, dir, "lineitem")
      .selectExpr("l_partkey % 200 AS tid",
        "CAST(floor(l_quantity + 0.5) AS BIGINT) AS q")
      .groupBy("tid").agg(expr("CAST(sum(q) AS BIGINT) AS dur"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(t => (-t._2, t._1))
    val loads = Array.fill(4)(0L); val counts = Array.fill(4)(0L)
    tasks.foreach { case (_, d) =>
      var w = 0
      for (k <- 1 until 4) if (loads(k) < loads(w)) w = k
      loads(w) += d; counts(w) += 1
    }
    out.foreach { r =>
      val w = r.getAs[Long]("worker").toInt
      assert(r.getAs[Long]("load") == loads(w), s"worker $w load")
      assert(r.getAs[Long]("n_tasks") == counts(w))
      assert(r.getAs[Long]("makespan") == loads.max)
    }
    assert(out.map(_.getAs[Long]("load")).sum == tasks.map(_._2).sum,
      "work conservation")
    val lb = math.max((tasks.map(_._2).sum + 3) / 4, tasks.map(_._2).max)
    assert(out.head.getAs[Long]("lower_bound") == lb)
    assert(out.head.getAs[Long]("ratio_bp") <= 13334,
      "LPT stays within 4/3 of the lower bound")
  }

  test("q535 char entropy: H1 <= H0 per source (conditioning reduces " +
      "entropy) and H0 is bounded by ln(alphabet)") {
    val out = SparkEntry.queries("q535_char_entropy")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val h0 = r.getAs[Long]("h0_micro"); val h1 = r.getAs[Long]("h1_micro")
      val alpha = r.getAs[Long]("alpha_size")
      assert(h0 > 0)
      // per-term floors lose at most alpha^2 micro-nats
      assert(h1 <= h0 + alpha * alpha,
        s"conditional entropy below unigram entropy (${r.getAs[String]("source")})")
      assert(h0 <= math.ceil(math.log(alpha.toDouble) * 1e6).toLong + alpha,
        "H0 <= ln(alphabet size)")
      assert(r.getAs[Long]("compress_bp") >= -1 &&
        r.getAs[Long]("compress_bp") <= 10000)
    }
  }

  test("q536 padding waste: packed cost never exceeds padded cost and " +
      "batch replay matches") {
    val r = SparkEntry.queries("q536_padding_waste")(spark, dir).collect().head
    assert(r.getAs[Long]("pack_cost") <= r.getAs[Long]("pad_cost"))
    val docs = graft.Tables.t(spark, dir, "documents")
      .where("text IS NOT NULL")
      .selectExpr("doc_id", "size(CASE WHEN length(trim(text)) = 0 " +
        "THEN array() ELSE split(trim(text), '\\\\s+') END) AS len")
      .where("len >= 1")
      .collect().map(x => (x.getLong(0) / 8, x.getInt(1).toLong))
      .groupBy(_._1)
    val padCost = docs.values.map { g =>
      val ls = g.map(_._2); ls.size * ls.max * ls.max
    }.sum
    val packCost = docs.values.flatMap(_.map(x => x._2 * x._2)).sum
    assert(r.getAs[Long]("pad_cost") == padCost)
    assert(r.getAs[Long]("pack_cost") == packCost)
    assert(r.getAs[Long]("n_batches") == docs.size.toLong)
    assert(r.getAs[Long]("attn_savings_bp") ==
      (padCost - packCost) * 10000 / padCost)
  }

  test("q537 uplift: conversion counts match a direct join and group " +
      "sizes partition each segment") {
    val out = SparkEntry.queries("q537_uplift_segments")(spark, dir).collect()
    assert(out.nonEmpty)
    val cust = graft.Tables.t(spark, dir, "customer")
      .where("c_mktsegment IS NOT NULL")
      .selectExpr("c_custkey", "c_mktsegment").collect()
      .map(x => (x.getLong(0), x.getString(1)))
    val cutoff = graft.Tables.t(spark, dir, "orders")
      .agg(expr("max(unix_millis(CAST(o_orderdate AS TIMESTAMP))) - 31536000000"))
      .collect().head.getLong(0)
    val conv = graft.Tables.t(spark, dir, "orders")
      .where(s"unix_millis(CAST(o_orderdate AS TIMESTAMP)) >= $cutoff")
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    val bySeg = cust.groupBy(_._2)
    out.foreach { r =>
      val seg = r.getAs[String]("segment")
      val rows = bySeg(seg)
      val g1 = rows.filter(_._1 % 2 == 1); val g0 = rows.filter(_._1 % 2 == 0)
      assert(r.getAs[Long]("n1") == g1.length.toLong)
      assert(r.getAs[Long]("n0") == g0.length.toLong)
      assert(r.getAs[Long]("x1") == g1.count(c => conv(c._1)).toLong)
      assert(r.getAs[Long]("x0") == g0.count(c => conv(c._1)).toLong)
    }
  }
}
