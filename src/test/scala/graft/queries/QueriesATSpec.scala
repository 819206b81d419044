package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesAT pack (winsorize, pyramid, graph shape). */
class QueriesATSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q182 winsorize: wmean between p05 and p95; raw mean sane") {
    val rows = SparkEntry.queries("q182_winsorize")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p05 = r.getAs[Long]("p05_cents"); val p95 = r.getAs[Long]("p95_cents")
      val wm = r.getAs[Long]("wmean_cents")
      assert(p05 <= p95)
      assert(wm >= p05 && wm <= p95, s"wmean $wm outside [$p05,$p95]")
      // clamping can only pull the mean toward the interior
      val raw = r.getAs[Long]("mean_cents")
      assert(math.abs(wm - raw) <= math.abs(raw) + p95)
    }
  }

  test("q183 pyramid: total conserved across zooms, tiles coarsen") {
    val rows = SparkEntry.queries("q183_tile_pyramid")(spark, dir).collect()
      .sortBy(_.getAs[Long]("zoom"))
    assert(rows.map(_.getAs[Long]("zoom")).toSeq == Seq(6L, 8L, 10L))
    val totals = rows.map(_.getAs[Long]("total_points")).distinct
    assert(totals.length == 1, s"pyramid loses points: ${totals.mkString(",")}")
    val tiles = rows.map(_.getAs[Long]("n_tiles"))
    assert(tiles(0) <= tiles(1) && tiles(1) <= tiles(2), "coarser zoom → fewer tiles")
    val mx = rows.map(_.getAs[Long]("max_tile_n"))
    assert(mx(0) >= mx(1) && mx(1) >= mx(2), "coarser zoom → denser max tile")
  }

  test("q184 assortativity: in [-1e6, 1e6]") {
    val rows = SparkEntry.queries("q184_assortativity")(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    if (!r.isNullAt(r.fieldIndex("assort_micro"))) {
      val a = r.getAs[Long]("assort_micro")
      assert(a >= -1000000L && a <= 1000000L)
    }
  }

  test("q185 triangles: equals in-memory count on the same graph") {
    val lp = spark.read.parquet(s"$dir/lineitem.parquet")
      .selectExpr("l_orderkey AS ok", "l_partkey AS p").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val support = scala.collection.mutable.Map.empty[(Long, Long), Long]
    lp.groupBy(_._1).foreach { case (_, g) =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length)
        support((ps(i), ps(j))) = support.getOrElse((ps(i), ps(j)), 0L) + 1L
    }
    // NB: .iterator first — Map.collect over tuple results would rebuild a
    // Map and silently dedup edges by first endpoint
    val edges = support.iterator.collect { case (e, s) if s >= 2L => e }.toSet
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val tri = edges.toSeq.map { case (a, b) =>
      adj.getOrElse(a, Set.empty).count(c => b < c && edges.contains((b, c)))
    }.sum
    val deg = scala.collection.mutable.Map.empty[Long, Long]
    edges.foreach { case (a, b) =>
      deg(a) = deg.getOrElse(a, 0L) + 1L; deg(b) = deg.getOrElse(b, 0L) + 1L
    }
    val wedges = deg.values.map(d => d * (d - 1) / 2).sum
    val r = SparkEntry.queries("q185_triangles")(spark, dir).collect().head
    assert(r.getAs[Long]("n_edges") == edges.size.toLong)
    assert(r.getAs[Long]("triangles") == tri.toLong)
    assert(r.getAs[Long]("wedges") == wedges)
  }
}
