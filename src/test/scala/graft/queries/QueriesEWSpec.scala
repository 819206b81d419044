package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants for the QueriesEW pack (quantile merge, zone maps,
  * isotonic fit, survivorship). */
class QueriesEWSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q599 quantile merge: merged sketch estimates land within the " +
      "sketch's resolution of the exact quantiles") {
    val out = SparkEntry.queries("q599_quantile_merge")(spark, dir)
      .collect()
    assert(out.map(_.getAs[Long]("p")).toSet == Set(50L, 90L, 99L))
    out.foreach { r =>
      // 10-bucket local sketches: merged rank error ≤ ~1 bucket per
      // nation; values are dollar-scaled so 15% covers sf0.001 noise
      assert(r.getAs[Long]("err_bp") < 1500,
        s"p${r.getAs[Long]("p")} err ${r.getAs[Long]("err_bp")}")
      assert(r.getAs[Long]("est") > 0 && r.getAs[Long]("exact") > 0)
    }
  }

  test("q600 zone maps: sorting by the predicate column dominates — " +
      "by_day skips the most rows and nearly everything outside Q1-1995") {
    val out = SparkEntry.queries("q600_zonemap_advisor")(spark, dir)
      .collect()
    assert(out.length == 3)
    val byKey = out.map(r => r.getAs[String]("sort_key") ->
      r.getAs[Long]("rows_skipped_bp")).toMap
    assert(byKey("by_day") > 5000, s"day-sorted skips most rows: $byKey")
    assert(byKey("by_day") > byKey("by_price"))
    assert(byKey("by_day") > byKey("by_custbucket"))
    assert(out.head.getAs[String]("sort_key") == "by_day", "ranked first")
  }

  test("q601 isotonic: the minimax fit is monotone (zero violations) " +
      "and matches a driver PAVA replay") {
    val r = SparkEntry.queries("q601_isotonic_minimax")(spark, dir)
      .collect().head
    assert(r.getAs[Long]("viol_after") == 0L)
    assert(r.getAs[Long]("iso_min") <= r.getAs[Long]("iso_max"))
    // driver PAVA on the same bucket census must give the same fit
    val buckets = graft.Tables.t(spark, dir, "lineitem")
      .selectExpr(
        "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) DIV 100 DIV 1000 AS b",
        "CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END AS y")
      .groupBy("b").agg(count(lit(1)).as("n"), sum("y").as("x"))
      .orderBy("b").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    // pool-adjacent-violators in exact rationals
    case class Block(n: Long, x: Long)
    val st = scala.collection.mutable.Stack.empty[Block]
    buckets.foreach { case (_, n, x) =>
      var blk = Block(n, x)
      while (st.nonEmpty &&
          st.top.x * blk.n >= blk.x * st.top.n) { // top avg >= new avg
        val t = st.pop(); blk = Block(t.n + blk.n, t.x + blk.x)
      }
      st.push(blk)
    }
    val fits = st.toSeq.reverse.flatMap(b =>
      Seq.fill(1)(b.x * 1000000 / b.n)) // per-block quantized level
    assert(r.getAs[Long]("iso_min") == fits.min)
    assert(r.getAs[Long]("iso_max") == fits.max)
  }

  test("q602 survivorship: exactly one survivor per cluster and the " +
      "cascade replays (longest, then min lang, then min id)") {
    val out = SparkEntry.queries("q602_survivorship")(spark, dir).collect()
    val docs = graft.Tables.t(spark, dir, "documents")
      .where("text IS NOT NULL")
      .selectExpr("doc_id", "source", "lang", "length(text) AS len",
        "lower(trim(text)) AS key")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getInt(3), r.getString(4)))
    val clusters = docs.groupBy(_._5)
    val survivors = clusters.values.map { g =>
      g.minBy(d => (-d._4, d._3, d._1))
    }.toSeq
    assert(out.map(_.getAs[Long]("n_survivors")).sum ==
      clusters.size.toLong)
    assert(out.map(_.getAs[Long]("n_docs")).sum == docs.length.toLong)
    val bySrc = survivors.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    out.foreach { r =>
      assert(r.getAs[Long]("n_survivors") ==
        bySrc.getOrElse(r.getAs[String]("source"), 0L),
        s"source ${r.getAs[String]("source")}")
    }
  }
}
