package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesAY pack (quantile bins, RLE profile,
  * chi-square independence, bounded BFS). */
class QueriesAYSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q202 bins: ranges disjoint and ordered, rows conserved, ~10% each") {
    val rows = SparkEntry.queries("q202_quantile_bins")(spark, dir).collect()
      .sortBy(_.getAs[Long]("bin"))
    assert(rows.nonEmpty && rows.length <= 10)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("hi_cents") < b.getAs[Long]("lo_cents"))
      case _ =>
    }
    val totalRows = rows.map(_.getAs[Long]("n_rows")).sum
    val n = spark.read.parquet(s"$dir/lineitem.parquet")
      .where("l_extendedprice IS NOT NULL").count()
    assert(totalRows == n, "row conservation across bins")
    // equal-frequency up to tie collapse: each bin within [5%, 15%]
    rows.foreach { r =>
      val share = r.getAs[Long]("n_rows").toDouble / n
      assert(share > 0.05 && share < 0.15, s"bin share $share")
    }
  }

  test("q203 RLE: runs <= events, max_run sane, mean consistent") {
    val rows = SparkEntry.queries("q203_rle_profile")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ne = r.getAs[Long]("n_events"); val nr = r.getAs[Long]("n_runs")
      assert(nr <= ne && nr > 0)
      assert(r.getAs[Long]("max_run") >= ne / nr)
      assert(r.getAs[Long]("mean_run_milli") == ne * 1000 / nr)
    }
    // total events across types equals table size
    val tot = rows.map(_.getAs[Long]("n_events")).sum
    assert(tot == graft.Tables.t(spark, dir, "events").count())
  }

  test("q204 chi-square: non-negative, cells = |segments| x |priorities|") {
    val r = SparkEntry.queries("q204_chisq_indep")(spark, dir).collect().head
    assert(r.getAs[Long]("chi2_micro") >= 0L)
    val segs = spark.read.parquet(s"$dir/customer.parquet")
      .select("c_mktsegment").distinct().count()
    val pris = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderpriority").distinct().count()
    // every (seg, prio) combination present at this data size
    assert(r.getAs[Long]("n_cells") == segs * pris)
  }

  test("q205 BFS: reach telescopes, frontiers match an in-memory BFS") {
    val rows = SparkEntry.queries("q205_bfs_hops")(spark, dir).collect()
      .sortBy(_.getAs[Long]("hop"))
    assert(rows.map(_.getAs[Long]("hop")).toSeq == Seq(1L, 2L, 3L))
    // reached(h) = reached(h-1) + frontier(h); reached(0) = 1 (the source)
    var reach = 1L
    rows.foreach { r =>
      reach += r.getAs[Long]("frontier")
      assert(r.getAs[Long]("reached") == reach)
    }
    // independent in-memory BFS over the same graph
    val lp = spark.read.parquet(s"$dir/lineitem.parquet")
      .selectExpr("l_orderkey AS ok", "l_partkey AS p").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val support = scala.collection.mutable.Map.empty[(Long, Long), Int]
    lp.groupBy(_._1).values.foreach { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length)
        support((ps(i), ps(j))) = support.getOrElse((ps(i), ps(j)), 0) + 1
    }
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    support.foreach { case ((a, b), w) =>
      if (w >= 2) { adj(a) = adj(a) + b; adj(b) = adj(b) + a }
    }
    if (adj.nonEmpty) {
      val src = adj.toSeq.map { case (v, ns) => (-ns.size, v) }.min._2
      var visited = Set(src); var frontier = Set(src)
      rows.foreach { r =>
        val next = frontier.flatMap(adj) -- visited
        assert(r.getAs[Long]("frontier") == next.size.toLong)
        visited ++= next; frontier = next
      }
    }
  }
}
