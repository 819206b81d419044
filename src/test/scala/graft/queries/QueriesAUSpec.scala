package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesAU pack (focal smooth, contamination,
  * butterflies, windowed top-k). */
class QueriesAUSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q186 focal: focal_n = own + neighbor sum; neighbors bounded by 8") {
    val rows = SparkEntry.queries("q186_focal_smooth")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("focal_n") == r.getAs[Long]("n") + r.getAs[Long]("nb_n"))
      val nb = r.getAs[Long]("n_nb_occupied")
      assert(nb >= 0L && nb <= 8L)
      assert(r.getAs[Long]("focal_n") >= r.getAs[Long]("n"))
    }
  }

  test("q187 contamination: contained + novelty = 10000; counts consistent") {
    val rows = SparkEntry.queries("q187_contamination")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getAs[Long]("contained_bp"); val nv = r.getAs[Long]("novelty_bp")
      val ne = r.getAs[Long]("n_eval_trigrams"); val nc = r.getAs[Long]("n_contained")
      assert(nc <= ne)
      assert(c + nv >= 9998L && c + nv <= 10000L, s"bp split $c + $nv") // DIV floors twice
      assert(c >= 0L && nv >= 0L)
    }
  }

  test("q188 butterflies: equals in-memory census") {
    val lp = spark.read.parquet(s"$dir/lineitem.parquet")
      .selectExpr("l_orderkey AS ok", "l_partkey AS p").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = lp.groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted).toMap
    val support = scala.collection.mutable.Map.empty[(Long, Long), Long]
    byOrder.values.foreach { ps =>
      for (i <- ps.indices; j <- i + 1 until ps.length)
        support((ps(i), ps(j))) = support.getOrElse((ps(i), ps(j)), 0L) + 1L
    }
    val butterflies = support.values.map(s => s * (s - 1) / 2).sum
    val dOrd = byOrder.view.mapValues(_.length.toLong).toMap
    val dPart = lp.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val caterpillars = lp.map { case (o, p) => (dOrd(o) - 1) * (dPart(p) - 1) }.sum
    val r = SparkEntry.queries("q188_butterflies")(spark, dir).collect().head
    assert(r.getAs[Long]("butterflies") == butterflies)
    assert(r.getAs[Long]("caterpillars") == caterpillars)
    assert(r.getAs[Long]("n_edges") == lp.length.toLong)
  }

  test("q189 windowed top-k: ranks are 1..3, counts non-increasing in rank") {
    val rows = SparkEntry.queries("q189_stream_topk")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("w_start")).foreach { case (_, g) =>
      val sorted = g.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[Long]("rk")).toSeq == (1L to sorted.length).toSeq)
      val ns = sorted.map(_.getAs[Long]("n"))
      assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    }
  }
}
