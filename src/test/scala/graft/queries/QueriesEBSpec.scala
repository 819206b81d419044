package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesEB pack (Cohen's kappa, Welch t-test,
  * Croston intermittent demand, hull diameter). */
class QueriesEBSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q514 kappa: identity holds and agreement bounds are respected") {
    val r = SparkEntry.queries("q514_cohens_kappa")(spark, dir).collect().head
    val n = r.getAs[Long]("n"); val agree = r.getAs[Long]("agree")
    val po = r.getAs[Long]("po_bp"); val pe = r.getAs[Long]("pe_bp")
    val k = r.getAs[Long]("kappa_bp")
    assert(n > 0 && agree <= n)
    assert(po == agree * 10000 / n)
    assert(k <= 10000, "kappa never exceeds 1")
    // the two raters both measure document length, so agreement must
    // beat chance by a wide margin on this corpus
    assert(po > pe, "observed agreement beats chance")
    assert(k > 3000, s"length-vs-wordcount raters agree strongly, got $k")
  }

  test("q515 Welch: direct double recomputation from raw rows matches") {
    val r = SparkEntry.queries("q515_welch_ttest")(spark, dir).collect().head
    val rows = graft.Tables.t(spark, dir, "orders")
      .where("o_totalprice IS NOT NULL")
      .selectExpr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DIV 100 AS y",
        "CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g")
      .collect().map(x => (x.getLong(0), x.getInt(1)))
    val g1 = rows.filter(_._2 == 1).map(_._1)
    val g0 = rows.filter(_._2 == 0).map(_._1)
    val (n1, n0) = (g1.length.toLong, g0.length.toLong)
    assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n0") == n0)
    def meanVar(g: Array[Long]) = {
      val n = g.length; val m = g.map(_.toDouble).sum / n
      (m, g.map(x => (x - m) * (x - m)).sum / (n - 1))
    }
    val (m1, v1) = meanVar(g1); val (m0, v0) = meanVar(g0)
    val se2 = v1 / n1 + v0 / n0
    val t = (m1 - m0) / math.sqrt(se2)
    val df = se2 * se2 /
      ((v1 / n1) * (v1 / n1) / (n1 - 1) + (v0 / n0) * (v0 / n0) / (n0 - 1))
    // recomputation uses a different summation order — allow 1 milli ulp
    assert(math.abs(r.getAs[Long]("t_milli") - math.floor(t * 1000).toLong) <= 1)
    assert(math.abs(r.getAs[Long]("df_milli") - math.floor(df * 1000).toLong) <= 1)
    assert(df >= math.min(n1, n0) - 1 - 0.001 && df <= n1 + n0 - 2 + 0.001,
      "Welch df sits between min(n)-1 and pooled df")
  }

  test("q516 Croston: brute-force recurrence per part group matches") {
    val out = SparkEntry.queries("q516_croston")(spark, dir).collect()
      .map(r => r.getAs[Long]("pk") -> r).toMap
    val daily = graft.Tables.t(spark, dir, "lineitem")
      .where("l_quantity > 45")
      .selectExpr("l_partkey % 40 AS pk",
        "unix_millis(CAST(l_shipdate AS TIMESTAMP)) DIV 86400000 AS day",
        "CAST(floor(l_quantity + 0.5) AS BIGINT) AS q")
      .groupBy("pk", "day").agg(org.apache.spark.sql.functions.expr("CAST(sum(q) AS BIGINT) AS q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    daily.foreach { case (pk, rows) =>
      val seq = rows.sortBy(_._2)
      var z = seq.head._3; var p = 1L; var prev = seq.head._2
      seq.tail.foreach { case (_, day, q) =>
        z = (q + 3 * z) / 4; p = ((day - prev) + 3 * p) / 4; prev = day
      }
      val r = out(pk)
      assert(r.getAs[Long]("n_days") == seq.length.toLong, s"pk=$pk n_days")
      assert(r.getAs[Long]("z") == z, s"pk=$pk z")
      assert(r.getAs[Long]("p") == p, s"pk=$pk p")
      assert(r.getAs[Long]("rate_bp") == (if (p > 0) z * 10000 / p else 0L))
    }
    assert(out.size == daily.size)
  }

  test("q517 diameter: all-pairs brute force over cells equals the hull scan") {
    val out = SparkEntry.queries("q517_hull_diameter")(spark, dir).collect()
    assert(out.nonEmpty)
    val cells = graft.Tables.t(spark, dir, "customer")
      .join(graft.Tables.t(spark, dir, "nation"), org.apache.spark.sql.functions.expr("c_nationkey = n_nationkey"))
      .join(graft.Tables.t(spark, dir, "region"), org.apache.spark.sql.functions.expr("n_regionkey = r_regionkey"))
      .selectExpr("r_name AS region",
        "CAST((c_custkey * 37) % 1000 AS BIGINT) DIV 25 AS x",
        "CAST((c_custkey * 61) % 800 AS BIGINT) DIV 25 AS y")
      .distinct().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    out.foreach { r =>
      val region = r.getAs[String]("region")
      val pts = cells(region).map(c => (c._2, c._3)).distinct
      assert(r.getAs[Long]("n_cells") == pts.length.toLong)
      var best = (-1L, 0L, 0L, 0L, 0L)
      for (i <- pts.indices; j <- (i + 1) until pts.length) {
        val (a, b) =
          if (Ordering[(Long, Long)].lt(pts(i), pts(j))) (pts(i), pts(j))
          else (pts(j), pts(i))
        val d2 = (a._1 - b._1) * (a._1 - b._1) + (a._2 - b._2) * (a._2 - b._2)
        val cand = (d2, a._1, a._2, b._1, b._2)
        if (cand._1 > best._1 || (cand._1 == best._1 &&
            Ordering[(Long, Long, Long, Long)].lt(
              (cand._2, cand._3, cand._4, cand._5),
              (best._2, best._3, best._4, best._5))))
          best = cand
      }
      assert(r.getAs[Long]("diam2") == best._1, s"$region diam2")
      assert((r.getAs[Long]("px"), r.getAs[Long]("py"),
        r.getAs[Long]("qx"), r.getAs[Long]("qy")) ==
        ((best._2, best._3, best._4, best._5)), s"$region endpoints")
    }
  }
}
