package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesDZ pack (Bradley–Terry, DSIR weights,
  * sketch quantiles, convex hull). */
class QueriesDZSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q506 Bradley–Terry: conserved wins, permutation rank, ppm norm") {
    val rows = SparkEntry.queries("q506_bradley_terry")(spark, dir).collect()
    assert(rows.nonEmpty)
    // every match produces exactly one win: Σ wins = Σ matches / 2
    // (each match appears in both participants' n_matches)
    val wins = rows.map(_.getAs[Long]("wins")).sum
    val matches = rows.map(_.getAs[Long]("n_matches")).sum
    assert(matches % 2 == 0 && wins == matches / 2)
    val ranks = rows.map(_.getAs[Long]("rank")).sorted
    assert(ranks.sameElements(1L to rows.length))
    // normalized strengths sum to 1e6 up to one integer-floor per type
    val s = rows.map(_.getAs[Long]("strength_ppm")).sum
    assert(s <= 1000000L && s > 1000000L - rows.length * 2)
    // the rank-1 type won at least its fair share of its matches
    val top = rows.find(_.getAs[Long]("rank") == 1L).get
    assert(top.getAs[Long]("wins") * 2 >= top.getAs[Long]("n_matches"))
  }

  test("q507 DSIR: doc accounting and top-vs-mean dominance") {
    val rows = SparkEntry.queries("q507_dsir_weights")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("mean_score_ppm") > 0)
      assert(r.getAs[Long]("top_score_ppm") >= r.getAs[Long]("mean_score_ppm"))
    }
    // per-source doc counts cover exactly the docs with >= 2 words
    val expected = graft.Tables.t(spark, dir, "documents")
      .selectExpr("size(split(trim(text), '\\\\s+')) AS nw")
      .where("nw >= 2").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == expected)
  }

  test("q508 sketch quantiles: exact side is the true rank quantile, " +
      "estimates stay inside the value range and are monotone") {
    val rows = SparkEntry.queries("q508_sketch_quantiles")(spark, dir)
      .collect().sortBy(_.getAs[Long]("q_pct"))
    assert(rows.length == 4)
    val vs = graft.Tables.t(spark, dir, "orders")
      .selectExpr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v")
      .collect().map(_.getLong(0)).sorted
    val n = vs.length
    rows.foreach { r =>
      val q = r.getAs[Long]("q_pct"); val exact = r.getAs[Long]("exact")
      val rank = (n * q + 99) / 100
      assert(exact == vs(rank.toInt - 1), s"exact p$q")
      assert(r.getAs[Long]("est") >= vs.head && r.getAs[Long]("est") <= vs.last)
      assert(r.getAs[Long]("n") == n)
    }
    val ests = rows.map(_.getAs[Long]("est"))
    assert(ests.sameElements(ests.sorted), "estimates monotone in q")
  }

  test("q509 hull: matches an independent gift-wrapping hull per region") {
    val rows = SparkEntry.queries("q509_convex_hull")(spark, dir).collect()
    assert(rows.nonEmpty)
    val cells = graft.Tables.t(spark, dir, "customer")
      .join(graft.Tables.t(spark, dir, "nation"),
        org.apache.spark.sql.functions.expr("c_nationkey = n_nationkey"))
      .join(graft.Tables.t(spark, dir, "region"),
        org.apache.spark.sql.functions.expr("n_regionkey = r_regionkey"))
      .selectExpr("r_name AS region",
        "CAST((c_custkey * 37) % 1000 AS BIGINT) DIV 25 AS x",
        "CAST((c_custkey * 61) % 800 AS BIGINT) DIV 25 AS y")
      .distinct().collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    def cross(o: (Long, Long), a: (Long, Long), b: (Long, Long)) =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    rows.foreach { r =>
      val region = r.getAs[String]("region")
      val pts = cells(region)
      assert(r.getAs[Long]("n_cells") == pts.length)
      // gift wrapping (Jarvis march) — a different algorithm than the
      // query's monotone chain; strict turns drop collinear vertices.
      assert(pts.length > 2, s"$region has a real point cloud")
      val start = pts.minBy(p => (p._1, p._2))
      var hull = Vector(start)
      var done = false
      while (!done) {
        val cur = hull.last
        var cand = pts.find(_ != cur).get
        pts.foreach { p =>
          if (p != cur) {
            val c = cross(cur, cand, p)
            if (c < 0 || (c == 0 &&
                (math.abs(p._1 - cur._1) + math.abs(p._2 - cur._2)) >
                  (math.abs(cand._1 - cur._1) + math.abs(cand._2 - cur._2))))
              cand = p
          }
        }
        if (cand == start) done = true else hull = hull :+ cand
      }
      val m = hull.length
      val area2 = (0 until m).map { i =>
        val (x1, y1) = hull(i); val (x2, y2) = hull((i + 1) % m)
        x1 * y2 - x2 * y1
      }.sum
      assert(r.getAs[Long]("hull_vertices") == m, s"$region vertices")
      assert(r.getAs[Long]("hull_area2") == math.abs(area2), s"$region area")
      assert(r.getAs[Long]("sum_hx") == hull.map(_._1).sum)
      assert(r.getAs[Long]("sum_hy") == hull.map(_._2).sum)
    }
  }
}
