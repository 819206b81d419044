package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import graft.dedup.Dedup
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Invariants for the QueriesEZ pack (token dispersion, CDC net effect,
  * idle capital, mergeable MinHash). */
class QueriesEZSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q609 dispersion: counts conserve and shares stay in [0, 10000]") {
    val out = SparkEntry.queries("q609_token_dispersion")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_bursty") <= r.getAs[Long]("vocab_audited"))
      assert(r.getAs[Long]("bursty_occurrences") <= r.getAs[Long]("occurrences"))
      Seq("bursty_vocab_bp", "bursty_mass_bp").foreach { c =>
        assert(r.getAs[Long](c) >= 0 && r.getAs[Long](c) <= 10000, c)
      }
    }
  }

  test("q610 CDC net effect: every user classified exactly once") {
    val out = SparkEntry.queries("q610_cdc_net_effect")(spark, dir).collect()
    val users = Tables.t(spark, dir, "events")
      .select(countDistinct("user_id")).collect()(0).getLong(0)
    val events = Tables.t(spark, dir, "events").count()
    assert(out.map(_.getAs[Long]("n_keys")).sum == users)
    assert(out.map(_.getAs[Long]("n_ops")).sum == events)
    val dom = Set("transient", "net_insert", "net_delete", "net_update")
    out.foreach { r =>
      assert(dom(r.getAs[String]("net_class")))
      assert(r.getAs[Long]("avg_ops") <= r.getAs[Long]("max_ops"))
    }
  }

  test("q611 idle capital: matches an independent recount") {
    val out = SparkEntry.queries("q611_idle_capital")(spark, dir).collect()
    val cust = Tables.t(spark, dir, "customer")
      .selectExpr("c_custkey", "c_nationkey",
        "CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS b")
    val Seq(sum_, n) = cust.where(col("b") > 0)
      .agg(sum("b"), count(lit(1))).collect()(0).toSeq.map(x => x.toString.toLong)
    val avg = sum_ / n
    val recent = Tables.t(spark, dir, "orders")
      .where(expr("o_orderdate >= DATE '2000-01-01'"))
      .select(col("o_custkey")).distinct()
      .collect().map(_.getLong(0)).toSet
    val want = cust.collect()
      .filter(r => r.getAs[Long]("b") > avg && !recent(r.getAs[Long]("c_custkey")))
    assert(out.map(_.getAs[Long]("n_cust")).sum == want.length)
    assert(out.map(_.getAs[Long]("idle_cents")).sum ==
      want.map(_.getAs[Long]("b")).sum)
  }

  test("q612 MinHash merge: elementwise min of shard sigs IS the corpus sig") {
    val nH = 16
    val tok = Tables.t(spark, dir, "documents")
      .withColumn("w", TextFunctions.words(col("text")))
      .filter(size(col("w")) > 0)
      .select(pmod(col("doc_id"), lit(8L)).as("shard"),
        explode(col("w")).as("word"))
      .select(col("shard"), Dedup.shingleHash(col("word")).as("h"))
    val shardSigs = tok.groupBy("shard")
      .agg(Dedup.minhashAggs(col("h"), nH).head,
        Dedup.minhashAggs(col("h"), nH).tail: _*)
    // merge = elementwise min across shard rows
    val merged = shardSigs.agg(
      min(col("_mh0")).as("_mh0"),
      (1 until nH).map(j => min(col(s"_mh$j")).as(s"_mh$j")): _*).collect()(0)
    val direct = tok.agg(Dedup.minhashAggs(col("h"), nH).head,
      Dedup.minhashAggs(col("h"), nH).tail: _*).collect()(0)
    (0 until nH).foreach { j =>
      assert(merged.getAs[Long](s"_mh$j") == direct.getAs[Long](s"_mh$j"), s"component $j")
    }
    val out = SparkEntry.queries("q612_minhash_merge")(spark, dir).collect()
    assert(out.length == 28)
    out.foreach { r =>
      assert(r.getAs[Long]("est_jac_bp") >= 0 && r.getAs[Long]("est_jac_bp") <= 10000)
      assert(r.getAs[Long]("exact_jac_bp") >= 0 && r.getAs[Long]("exact_jac_bp") <= 10000)
    }
  }
}
