package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants + independent re-derivations for the QueriesO pack. */
class QueriesOSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Independent geohash: classic bisection algorithm (textbook form),
    * structurally unrelated to the query's integer bit-interleave. */
  private def bisectGeohash(lat: Double, lng: Double, chars: Int): String = {
    val alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
    var (latLo, latHi) = (-90.0, 90.0)
    var (lngLo, lngHi) = (-180.0, 180.0)
    val sb = new StringBuilder
    var isLng = true
    var bits = 0
    var code = 0
    while (sb.length < chars) {
      if (isLng) {
        val mid = (lngLo + lngHi) / 2
        if (lng >= mid) { code = code * 2 + 1; lngLo = mid }
        else { code = code * 2; lngHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { code = code * 2 + 1; latLo = mid }
        else { code = code * 2; latHi = mid }
      }
      isLng = !isLng
      bits += 1
      if (bits == 5) { sb.append(alphabet(code)); bits = 0; code = 0 }
    }
    sb.toString
  }

  test("bisection reference reproduces the textbook geohash example") {
    // (57.64911, 10.40744) → 'u4pruydqqvj' (classic example value)
    assert(bisectGeohash(57.64911, 10.40744, 6) == "u4pruy")
  }

  test("q85 geohash: integer interleave == independent bisection, for every cell") {
    val expected = graft.Tables.t(spark, dir, "events")
      .selectExpr("event_id", "user_id").collect()
      .map { r =>
        val (e, u) = (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"))
        val lngE3 = ((u * 47 + e * 13) % 36000) * 10 - 180000 + 5
        val latE3 = ((u * 31 + e * 7) % 17000) * 10 - 85000 + 5
        bisectGeohash(latE3 / 1000.0, lngE3 / 1000.0, 6)
      }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = SparkEntry.queries("q85_geohash")(spark, dir).collect()
      .map(r => r.getAs[String]("geohash6") -> r.getAs[Long]("n_points")).toMap
    assert(got.nonEmpty)
    got.foreach { case (gh, n) =>
      assert(expected.getOrElse(gh, -1L) == n, s"cell $gh: got $n, want ${expected.get(gh)}")
    }
  }

  test("q84 corr/slope match an independent two-pass computation") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .selectExpr("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .groupBy(_.getAs[String]("l_returnflag"))
    val out = SparkEntry.queries("q84_stats_corr")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val g = li(r.getAs[String]("l_returnflag"))
      val xs = g.map(_.getAs[Double]("l_quantity"))
      val ys = g.map(_.getAs[Double]("l_extendedprice"))
      val n = xs.length.toDouble
      val (mx, my) = (xs.sum / n, ys.sum / n)
      val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val vx = xs.map(x => (x - mx) * (x - mx)).sum
      val vy = ys.map(y => (y - my) * (y - my)).sum
      val corr = cov / (math.sqrt(vx) * math.sqrt(vy))
      val slope = cov / vx
      assert(math.abs(r.getAs[Double]("corr6") - corr) < 1e-4)
      assert(math.abs(r.getAs[Double]("slope6") - slope) < 1e-4)
      assert(math.abs(r.getAs[Double]("corr6")) <= 1.0)
    }
  }

  test("q91 retry/backoff: schedule invariants") {
    val rows = SparkEntry.queries("q91_retry_backoff")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nFail = r.getAs[Long]("n_fail")
      assert(r.getAs[Long]("n_premature") <= nFail)
      val cap = r.getAs[Long]("max_backoff_s")
      // backoff_s = 2^min(attempt,6): caps at 64, and the cap is reached
      // exactly when a user accumulated >= 6 failures
      assert(cap == (1L << math.min(nFail, 6L)))
      assert(r.getAs[Boolean]("gave_up") == (nFail >= 10))
    }
  }

  test("q98 KMV: small groups exact, estimates sane") {
    val rows = SparkEntry.queries("q98_kmv_distinct")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, est) = (r.getAs[Long]("n_exact"), r.getAs[Long]("n_kmv"))
      assert(est > 0)
      if (exact < 16) assert(est == exact, "below-k groups must report exactly")
      assert(r.getAs[Long]("err_bp") == math.abs(est - exact) * 10000 / exact)
    }
  }
}
