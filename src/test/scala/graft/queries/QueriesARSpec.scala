package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesAR pack (mode, exact distribution ranks,
  * Theil–Sen, bitmap overlap). */
class QueriesARSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q175 mode: matches in-memory argmax with smallest-value tiebreak") {
    val qty = spark.read.parquet(s"$dir/lineitem.parquet")
      .selectExpr("l_returnflag", "CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val rows = SparkEntry.queries("q175_mode")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val counts = qty.filter(_._1 == flag).groupBy(_._2).view.mapValues(_.size.toLong)
      val (expQ, expC) = counts.toSeq.maxBy { case (q, c) => (c, -q) }
      assert(r.getAs[Long]("mode_qty") == expQ, s"$flag mode qty")
      assert(r.getAs[Long]("mode_cnt") == expC, s"$flag mode cnt")
      assert(r.getAs[Long]("n_rows") == counts.values.sum)
      assert(r.getAs[Long]("n_distinct") == counts.size.toLong)
    }
  }

  test("q176 distribution: cume monotone to 10000, prank starts at 0") {
    val rows = SparkEntry.queries("q176_cume_dist")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("l_returnflag")).foreach { case (_, g) =>
      val sorted = g.sortBy(_.getAs[Long]("qty"))
      val cumes = sorted.map(_.getAs[Long]("cume_bp"))
      assert(cumes.zip(cumes.tail).forall { case (a, b) => a <= b })
      assert(cumes.last == 10000L)
      assert(sorted.head.getAs[Long]("prank_bp") == 0L)
      assert(sorted.forall(r => r.getAs[Long]("prank_bp") < 10000L))
    }
  }

  test("q177 Theil-Sen: equals in-memory median-of-pairwise-slopes") {
    val ev = graft.Tables.t(spark, dir, "events")
      .selectExpr("event_type", "(ts DIV 1000000) DIV 86400000 AS d")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val rows = SparkEntry.queries("q177_theilsen")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val daily = ev.filter(_._1 == et).groupBy(_._2).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      val slopes = (for {
        (d1, y1) <- daily; (d2, y2) <- daily if d2 > d1
      } yield {
        val num = (y2 - y1) * 1000000L; val den = d2 - d1
        if (num >= 0) num / den else -((-num) / den)
      }).sorted
      assert(r.getAs[Long]("n_pairs") == slopes.length.toLong)
      assert(r.getAs[Long]("theilsen_slope_micro") == slopes((slopes.length + 1) / 2 - 1))
    }
  }

  test("q178 bitmap overlap: actives equal exact distinct; jaccard bounded") {
    val exact = graft.Tables.t(spark, dir, "events")
      .selectExpr("(ts DIV 1000000) DIV 86400000 AS day", "user_id")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rows = SparkEntry.queries("q178_bitmap_overlap")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val day = r.getAs[Long]("day")
      val cur = exact(day); val prev = exact(day - 1)
      assert(r.getAs[Long]("actives") == cur.size.toLong)
      assert(r.getAs[Long]("prev_actives") == prev.size.toLong)
      assert(r.getAs[Long]("overlap") == cur.intersect(prev).size.toLong)
      val j = r.getAs[Long]("jaccard_bp")
      assert(j >= 0L && j <= 10000L)
    }
  }
}
