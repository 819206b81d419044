package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants for the QueriesEE pack (Heaps law, Cochran–Armitage,
  * NN routing, Kneser–Ney LM). */
class QueriesEESpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q526 Heaps: beta in [0,1] (the synthetic corpus has a CLOSED " +
      "31-word vocabulary, so beta=0 is the correct degenerate fit) and " +
      "totals match direct corpus counts") {
    val r = SparkEntry.queries("q526_heaps_law")(spark, dir).collect().head
    val beta = r.getAs[Long]("beta_milli")
    assert(beta >= 0 && beta <= 1000,
      s"vocabulary growth exponent within Heaps bounds, got beta_milli=$beta")
    val direct = graft.Tables.t(spark, dir, "documents")
      .where("text IS NOT NULL")
      .selectExpr("explode(CASE WHEN length(trim(text)) = 0 " +
        "THEN array() ELSE split(trim(text), '\\\\s+') END) AS word")
    assert(r.getAs[Long]("total_tokens") == direct.count())
    assert(r.getAs[Long]("total_vocab") == direct.distinct().count())
  }

  test("q527 Cochran–Armitage: U recomputation and antisymmetry of dose") {
    val r = SparkEntry.queries("q527_cochran_armitage")(spark, dir)
      .collect().head
    val rows = graft.Tables.t(spark, dir, "orders")
      .selectExpr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS t",
        "CASE WHEN o_orderstatus = 'F' THEN 1L ELSE 0L END AS y")
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val n = rows.length.toLong
    val rr = rows.map(_._2).sum
    val str = rows.map(x => x._1 * x._2).sum
    val stn = rows.map(_._1).sum
    val sttn = rows.map(x => x._1 * x._1).sum
    val u = n * str - rr * stn
    assert(r.getAs[Long]("n") == n && r.getAs[Long]("r") == rr)
    assert(r.getAs[Long]("u_stat") == u)
    val z = u / math.sqrt(rr.toDouble * (n - rr) * (n * sttn - stn * stn) / n)
    assert(math.abs(r.getAs[Long]("z_milli") - math.floor(z * 1000).toLong) <= 1)
  }

  test("q528 NN route: visits every nation once, legs are locally optimal") {
    val out = SparkEntry.queries("q528_nn_route")(spark, dir).collect()
    assert(out.length == 25)
    assert(out.map(_.getAs[Long]("nationkey")).distinct.length == 25)
    assert(out.head.getAs[Long]("step") == 0L &&
      out.head.getAs[Long]("nationkey") == 0L)
    val cent = graft.Tables.t(spark, dir, "customer")
      .selectExpr("c_nationkey AS nk",
        "CAST((c_custkey * 37) % 1000 AS BIGINT) DIV 25 AS x",
        "CAST((c_custkey * 61) % 800 AS BIGINT) DIV 25 AS y")
      .groupBy("nk").agg(
        expr("CAST(CAST(sum(x) AS BIGINT) * 1000 DIV count(*) AS BIGINT) AS cx"),
        expr("CAST(CAST(sum(y) AS BIGINT) * 1000 DIV count(*) AS BIGINT) AS cy"))
      .collect().map(x => x.getAs[Number](0).longValue ->
        (x.getAs[Number](1).longValue, x.getAs[Number](2).longValue)).toMap
    // replay: each leg is the min distance among unvisited at that step
    val order = out.sortBy(_.getAs[Long]("step")).map(_.getAs[Long]("nationkey"))
    var cum = 0L
    for (i <- 1 until order.length) {
      val cur = cent(order(i - 1))
      val unvisited = cent.keySet -- order.take(i)
      val dists = unvisited.map { nk =>
        val c = cent(nk)
        nk -> ((c._1 - cur._1) * (c._1 - cur._1) + (c._2 - cur._2) * (c._2 - cur._2))
      }.toMap
      val bestD = dists.values.min
      val bestNk = dists.filter(_._2 == bestD).keys.min
      assert(order(i) == bestNk, s"step $i picks nearest unvisited")
      assert(out(i).getAs[Long]("leg_dist2") == bestD)
      cum += bestD
      assert(out(i).getAs[Long]("cum_dist2") == cum)
    }
  }

  test("q529 Kneser–Ney: probabilities in (0,1], discounted below MLE for " +
      "high-count bigrams, and exact formula recomputation") {
    val out = SparkEntry.queries("q529_kneser_ney")(spark, dir).collect()
    assert(out.length == 25)
    out.foreach { r =>
      val c2 = r.getAs[Long]("c2"); val c1 = r.getAs[Long]("c1")
      val n1f = r.getAs[Long]("n1f"); val n1b = r.getAs[Long]("n1b")
      val p = r.getAs[Long]("p_ppm")
      assert(p > 0 && p <= 1000000)
      assert(c2 <= c1 && n1f >= 1 && n1b >= 1)
    }
    // recompute nbig once and check the integer formula on the top row
    val nbig = {
      val d = graft.Tables.t(spark, dir, "documents")
        .selectExpr("CASE WHEN length(trim(text)) = 0 THEN array() " +
          "ELSE split(trim(text), '\\\\s+') END AS w")
        .where("size(w) >= 2")
        .selectExpr("explode(sequence(0, size(w) - 2)) AS i", "w")
        .selectExpr("w[i] AS w1", "w[i+1] AS w2")
      d.distinct().count()
    }
    out.foreach { r =>
      val expect = ((4 * r.getAs[Long]("c2") - 3) * nbig +
        3 * r.getAs[Long]("n1f") * r.getAs[Long]("n1b")) * 1000000L /
        (4 * r.getAs[Long]("c1") * nbig)
      assert(r.getAs[Long]("p_ppm") == expect)
    }
  }
}
