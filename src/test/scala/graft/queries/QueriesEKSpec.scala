package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants for the QueriesEK pack (join-card audit, Q7/Q16 shapes,
  * Huber IRLS). */
class QueriesEKSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q550 join-card audit: FK joins estimate exactly when the FK side " +
      "determines cardinality (est = na for PK-FK joins)") {
    val out = SparkEntry.queries("q550_join_card_error")(spark, dir).collect()
    assert(out.length == 3)
    out.foreach { r =>
      // PK side is a superset: max(da, db) = db = nb → est = na
      assert(r.getAs[Long]("est") == r.getAs[Long]("na") *
        r.getAs[Long]("nb") / math.max(r.getAs[Long]("da"), r.getAs[Long]("db")))
      assert(r.getAs[Long]("err_bp") >= 0)
      // every fact row joins exactly once on these FK joins
      assert(r.getAs[Long]("actual") == r.getAs[Long]("na"),
        s"${r.getAs[String]("join_name")} is a clean FK join")
    }
  }

  test("q551 volume shipping: both directions present and revenue " +
      "conserves against a direct filter") {
    val out = SparkEntry.queries("q551_volume_shipping")(spark, dir).collect()
    assert(out.nonEmpty)
    val dirs = out.map(r => (r.getAs[String]("supp_nation"),
      r.getAs[String]("cust_nation"))).distinct
    assert(dirs.length == 2, "both shipping directions appear")
    assert(dirs.toSet == Set(("NATION_3", "NATION_8"), ("NATION_8", "NATION_3")))
    val total = out.map(_.getAs[Long]("rev_cp")).sum
    val direct = graft.Tables.t(spark, dir, "lineitem")
      .join(graft.Tables.t(spark, dir, "orders"), expr("l_orderkey = o_orderkey"))
      .join(graft.Tables.t(spark, dir, "supplier"), expr("l_suppkey = s_suppkey"))
      .join(graft.Tables.t(spark, dir, "customer"), expr("o_custkey = c_custkey"))
      .join(graft.Tables.t(spark, dir, "nation").selectExpr("n_nationkey AS snk", "n_name AS sn"),
        expr("s_nationkey = snk"))
      .join(graft.Tables.t(spark, dir, "nation").selectExpr("n_nationkey AS cnk", "n_name AS cn"),
        expr("c_nationkey = cnk"))
      .where("sn IN ('NATION_3','NATION_8') AND cn IN ('NATION_3','NATION_8') AND sn <> cn")
      .selectExpr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * " +
        "(100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS rev")
      .agg(expr("CAST(sum(rev) AS BIGINT)")).collect().head.getLong(0)
    assert(total == direct)
  }

  test("q552 partsupp count: supplier counts match a direct recount and " +
      "excluded suppliers never appear") {
    val out = SparkEntry.queries("q552_partsupp_count")(spark, dir).collect()
    assert(out.length == 20)
    val bad = graft.Tables.t(spark, dir, "supplier")
      .where("s_acctbal < 0").select("s_suppkey")
      .collect().map(_.getLong(0)).toSet
    val link = graft.Tables.t(spark, dir, "lineitem")
      .select("l_partkey", "l_suppkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filterNot(p => bad(p._2))
    val parts = graft.Tables.t(spark, dir, "part")
      .selectExpr("p_partkey", "p_brand", "p_type", "p_size DIV 10 AS szb")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getAs[Number](3).longValue)).toMap
    val counts = link.flatMap { case (pk, sk) => parts.get(pk).map(g => (g, sk)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size.toLong).toMap
    out.foreach { r =>
      val key = (r.getAs[String]("p_brand"), r.getAs[String]("p_type"),
        r.getAs[Long]("szb"))
      assert(counts(key) == r.getAs[Long]("supplier_cnt"), s"$key")
    }
    // top-20 really is the top: every reported count >= any unreported one
    val reported = out.map(r => (r.getAs[String]("p_brand"),
      r.getAs[String]("p_type"), r.getAs[Long]("szb"))).toSet
    val minReported = out.map(_.getAs[Long]("supplier_cnt")).min
    counts.filterNot(kv => reported(kv._1)).values.foreach { c =>
      assert(c <= minReported)
    }
  }

  test("q553 Huber IRLS: robust fit downweights outliers and tracks a " +
      "direct Scala replay") {
    val r = SparkEntry.queries("q553_huber_irls")(spark, dir).collect().head
    val days = graft.Tables.t(spark, dir, "orders")
      .where("o_totalprice IS NOT NULL")
      .selectExpr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS day",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c")
      .groupBy("day").agg(expr("CAST(sum(c) AS BIGINT) DIV 1000 AS y"))
      .orderBy("day").collect().map(x => (x.getLong(0), x.getLong(1)))
    val d0 = days.map(_._1).min
    val xy = days.map { case (d, y) => (d - d0, y) }
    def wols(ws: Map[Long, Long]) = {
      val sw = xy.map(p => ws(p._1)).sum.toDouble
      val swx = xy.map(p => ws(p._1) * p._1).sum.toDouble
      val swy = xy.map(p => ws(p._1) * p._2).sum.toDouble
      val swxx = xy.map(p => ws(p._1) * p._1 * p._1).sum.toDouble
      val swxy = xy.map(p => ws(p._1) * p._1 * p._2).sum.toDouble
      val b = (sw * swxy - swx * swy) / (sw * swxx - swx * swx)
      (((swy - (sw * swxy - swx * swy) / (sw * swxx - swx * swx) * swx) / sw), b)
    }
    val unit = xy.map(p => p._1 -> 1L).toMap
    var (a, b) = wols(unit)
    val n = xy.length
    val srr = xy.map(p => math.floor({ val e = p._2 - (a + b * p._1); e * e }).toLong).sum
    val c = 1.345 * math.sqrt(srr.toDouble / n)
    var nd = 0L
    for (_ <- 1 to 2) {
      val ws = xy.map { p =>
        val res = math.abs(p._2 - (a + b * p._1))
        p._1 -> (if (res <= c) 1000000L else math.floor(c / res * 1e6).toLong)
      }.toMap
      nd = ws.values.count(_ < 1000000L).toLong
      val f = wols(ws); a = f._1; b = f._2
    }
    assert(math.abs(r.getAs[Long]("a_milli") - math.floor(a * 1000).toLong) <= 2)
    assert(math.abs(r.getAs[Long]("b_milli") - math.floor(b * 1000).toLong) <= 2)
    assert(r.getAs[Long]("n_downweighted") == nd)
    assert(r.getAs[Long]("c_milli") > 0)
  }
}
