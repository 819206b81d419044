package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesAM pack (statistical monitors). */
class QueriesAMSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q164 GOF: chi2 numerator recomputes from hourly counts") {
    val hours = graft.Tables.t(spark, dir, "events")
      .selectExpr("((ts DIV 1000000) DIV 3600000) % 24 AS hour")
      .collect().map(_.getLong(0))
    val counts = hours.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = hours.length.toLong
    val chiNum = counts.values.map(o => (24 * o - n) * (24 * o - n)).sum
    val r = SparkEntry.queries("q164_arrival_gof")(spark, dir).collect().head
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("chi_num") == chiNum)
    assert(r.getAs[Long]("chi2_micro") ==
      math.floor(chiNum.toDouble / (24 * n).toDouble * 1000000).toLong)
  }

  test("q165 FD audit: the true FD has zero violations, the false one has some") {
    val rows = SparkEntry.queries("q165_fd_audit")(spark, dir).collect()
      .map(r => r.getAs[String]("fd") ->
        (r.getAs[Long]("n_keys"), r.getAs[Long]("n_violating"))).toMap
    assert(rows("l_partkey->p_brand")._2 == 0L, "joining through part must be a true FD")
    assert(rows("l_partkey->l_suppkey")._2 > 0L, "parts ship from several suppliers")
  }

  test("q166 KS drift: D numerator matches a brute-force CDF comparison") {
    val ev = graft.Tables.t(spark, dir, "events")
      .selectExpr("(ts DIV 1000000) DIV 86400000 AS day",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mid = (ev.map(_._1).min + ev.map(_._1).max) / 2
    val h1 = ev.filter(_._1 <= mid).map(_._2).sorted
    val h2 = ev.filter(_._1 > mid).map(_._2).sorted
    val support = (h1 ++ h2).distinct.sorted
    val dNum = support.map { v =>
      val c1 = h1.count(_ <= v).toLong; val c2 = h2.count(_ <= v).toLong
      math.abs(c1 * h2.length - c2 * h1.length)
    }.max
    val r = SparkEntry.queries("q166_ks_drift")(spark, dir).collect().head
    assert(r.getAs[Long]("n1") == h1.length.toLong)
    assert(r.getAs[Long]("n2") == h2.length.toLong)
    assert(r.getAs[Long]("d_num") == dNum)
  }
}
