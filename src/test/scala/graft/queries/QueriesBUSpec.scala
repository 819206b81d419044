package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesBU pack (multivariate/sequential stats),
  * including an independent in-memory recompute of the 2-feature OLS. */
class QueriesBUSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q289 OLS2: slopes match an independent in-memory normal-equation solve") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .selectExpr("l_partkey", "CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS x1",
        "CAST(floor(l_quantity + 0.5) AS BIGINT) AS y").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val parts = spark.read.parquet(s"$dir/part.parquet")
      .selectExpr("p_partkey", "p_brand", "CAST(p_size AS BIGINT) AS x2").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val byBrand = li.flatMap { case (pk, x1, y) =>
      parts.get(pk).map { case (b, x2) => (b, x1, x2, y) }
    }.groupBy(_._1)
    val expect = byBrand.map { case (b, rs) =>
      val n = rs.length.toLong
      val s1 = rs.map(_._2).sum; val s2 = rs.map(_._3).sum; val sy = rs.map(_._4).sum
      val s11 = rs.map(r => r._2 * r._2).sum; val s22 = rs.map(r => r._3 * r._3).sum
      val s12 = rs.map(r => r._2 * r._3).sum
      val s1y = rs.map(r => r._2 * r._4).sum; val s2y = rs.map(r => r._3 * r._4).sum
      val c11 = (n * s11 - s1 * s1).toDouble; val c22 = (n * s22 - s2 * s2).toDouble
      val c12 = (n * s12 - s1 * s2).toDouble
      val c1y = (n * s1y - s1 * sy).toDouble; val c2y = (n * s2y - s2 * sy).toDouble
      val d = c11 * c22 - c12 * c12
      b -> (if (d == 0.0) None else Some((
        math.floor((c1y * c22 - c2y * c12) / d * 1000000).toLong,
        math.floor((c2y * c11 - c1y * c12) / d * 1000000).toLong)))
    }
    val got = SparkEntry.queries("q289_ols2")(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val b = r.getAs[String]("p_brand")
      expect(b) match {
        case Some((b1, b2)) =>
          assert(r.getAs[Long]("b1_micro") == b1, s"b1 for $b")
          assert(r.getAs[Long]("b2_micro") == b2, s"b2 for $b")
        case None => assert(r.isNullAt(r.fieldIndex("b1_micro")))
      }
    }
  }

  test("q290 runs test: above+below = days, runs within [1, n]") {
    val rows = SparkEntry.queries("q290_runs_test")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_days")
      assert(r.getAs[Long]("n_above") + r.getAs[Long]("n_below") == n)
      val runs = r.getAs[Long]("runs")
      assert(runs >= 1L && runs <= n)
    }
  }

  test("q291 PACF: correlations within [-1000, 1000] milli, pacf2 within [-1e6, 1e6]") {
    val rows = SparkEntry.queries("q291_pacf2")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Long]("r1_milli")) <= 1000L)
      assert(math.abs(r.getAs[Long]("r2_milli")) <= 1000L)
      if (!r.isNullAt(r.fieldIndex("pacf2_micro")))
        assert(math.abs(r.getAs[Long]("pacf2_micro")) <= 1000000L)
    }
  }

  test("q292 Theil U2: ratio consistent with its own SSE columns") {
    val rows = SparkEntry.queries("q292_theil_u")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s7 = r.getAs[Long]("sse_naive7"); val srw = r.getAs[Long]("sse_rw")
      assert(s7 >= 0L && srw >= 0L)
      if (srw > 0) assert(r.getAs[Long]("u2_milli") == s7 * 1000 / srw)
    }
  }
}
