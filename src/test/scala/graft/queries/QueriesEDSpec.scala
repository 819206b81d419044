package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants for the QueriesED pack (successive halving, LTTB
  * downsampling, Jenks breaks, delta-method ratio test). */
class QueriesEDSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q522 successive halving: brute-force tournament replay matches") {
    val out = SparkEntry.queries("q522_successive_halving")(spark, dir)
      .collect().map(r => r.getAs[String]("arm") -> r).toMap
    val ev = graft.Tables.t(spark, dir, "events")
      .where("value IS NOT NULL")
      .selectExpr("event_type AS arm", "ts DIV 1000000 AS ts_ms", "event_id",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val means = ev.map { case (arm, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3)).map(_._4)
      def m(b: Int) = { val s = sorted.take(b); s.sum * 1000 / s.length }
      arm -> (m(8), m(16), m(32))
    }
    means.foreach { case (arm, (m8, m16, m32)) =>
      val r = out(arm)
      assert(r.getAs[Long]("m8_milli") == m8, s"$arm m8")
      assert(r.getAs[Long]("m16_milli") == m16, s"$arm m16")
      assert(r.getAs[Long]("m32_milli") == m32, s"$arm m32")
    }
    // tournament: k0=5 → keep 3, then 2, then champion
    val byRound = out.values.groupBy(_.getAs[Long]("elim_round"))
      .view.mapValues(_.size).toMap
    assert(byRound.getOrElse(1L, 0) == 2 && byRound.getOrElse(2L, 0) == 1 &&
      byRound.getOrElse(3L, 0) == 1 && byRound.getOrElse(4L, 0) == 1)
    val surv1 = means.toSeq.sortBy { case (a, (m8, _, _)) => (-m8, a) }
      .take(3).map(_._1).toSet
    out.values.filter(_.getAs[Long]("elim_round") == 1L)
      .foreach(r => assert(!surv1(r.getAs[String]("arm"))))
    val champ = means.filter(kv => surv1(kv._1)).toSeq
      .sortBy { case (a, (_, m16, _)) => (-m16, a) }.take(2)
      .sortBy { case (a, (_, _, m32)) => (-m32, a) }.head._1
    assert(out(champ).getAs[Long]("elim_round") == 4L, s"champion $champ")
  }

  test("q523 LTTB: sequential greedy replay matches; endpoints pinned") {
    val out = SparkEntry.queries("q523_lttb_downsample")(spark, dir).collect()
    assert(out.length == 60)
    val daily = graft.Tables.t(spark, dir, "orders")
      .selectExpr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS day")
      .groupBy("day").agg(expr("CAST(count(*) AS BIGINT) AS v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = daily.length
    assert(out.head.getAs[Long]("day") == daily.head._1)
    assert(out.last.getAs[Long]("day") == daily.last._1)
    // replay
    val buckets = Array.fill(58)(scala.collection.mutable.ArrayBuffer[(Long, Long)]())
    for (j <- 1 to n - 2) buckets(((j - 1).toLong * 58 / (n - 2)).toInt) += daily(j)
    var prev = daily.head
    for (b <- 1 to 58) {
      val (m, sxc, syc) =
        if (b == 58) (1L, daily.last._1, daily.last._2)
        else (buckets(b).length.toLong, buckets(b).map(_._1).sum, buckets(b).map(_._2).sum)
      var best: (Long, Long) = null; var bestScore = -1L
      buckets(b - 1).foreach { p =>
        val sc = math.abs((prev._1 * m - sxc) * (p._2 - prev._2) -
          (prev._1 - p._1) * (syc - prev._2 * m))
        if (sc > bestScore) { bestScore = sc; best = p }
      }
      val r = out(b)
      assert(r.getAs[Long]("day") == best._1, s"bucket $b day")
      assert(r.getAs[Long]("v") == best._2, s"bucket $b v")
      prev = best
    }
    // picks are strictly increasing in time (one per bucket)
    assert(out.map(_.getAs[Long]("day")).sliding(2).forall(p => p(0) < p(1)))
  }

  test("q524 Jenks: reported SSE is minimal over a random sample of " +
      "alternative break triples and classes partition the data") {
    val r = SparkEntry.queries("q524_jenks_breaks")(spark, dir).collect().head
    val lv = graft.Tables.t(spark, dir, "orders")
      .where("o_totalprice IS NOT NULL")
      .selectExpr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DIV 1000000 AS v")
      .collect().map(_.getLong(0)).groupBy(identity)
      .map { case (v, g) => (v, g.length.toLong) }.toSeq.sortBy(_._1)
    val total = lv.map(_._2).sum
    assert(r.getAs[Long]("n1") + r.getAs[Long]("n2") +
      r.getAs[Long]("n3") + r.getAs[Long]("n4") == total)
    def cost(breaks: Seq[Int]): Double = {
      val bounds = (0 +: breaks :+ lv.length)
      bounds.sliding(2).map { case Seq(lo, hi) =>
        val seg = lv.slice(lo, hi)
        val w = seg.map(_._2).sum.toDouble
        val sv = seg.map(x => x._1 * x._2).sum.toDouble
        val svv = seg.map(x => x._1 * x._1 * x._2).sum.toDouble
        svv - sv * sv / w
      }.sum
    }
    val bestIdx = Seq(
      lv.indexWhere(_._1 == r.getAs[Long]("v1")) + 1,
      lv.indexWhere(_._1 == r.getAs[Long]("v2")) + 1,
      lv.indexWhere(_._1 == r.getAs[Long]("v3")) + 1)
    val reported = cost(bestIdx)
    assert(math.abs(math.floor(reported * 1000).toLong -
      r.getAs[Long]("sse_milli")) <= 1)
    // exhaustive check on this small level domain
    val m = lv.length
    for (b1 <- 1 until m; b2 <- (b1 + 1) until m; b3 <- (b2 + 1) until m)
      assert(cost(Seq(b1, b2, b3)) >= reported - 1e-6,
        s"($b1,$b2,$b3) beats the reported optimum")
  }

  test("q525 delta method: direct recomputation from per-user rows matches") {
    val r = SparkEntry.queries("q525_delta_method_ratio")(spark, dir)
      .collect().head
    val users = graft.Tables.t(spark, dir, "events")
      .where("value IS NOT NULL")
      .selectExpr("user_id", "CAST(floor(value * 100 + 0.5) AS BIGINT) AS c")
      .groupBy("user_id")
      .agg(expr("CAST(sum(c) AS BIGINT) AS x"), expr("CAST(count(*) AS BIGINT) AS y"))
      .collect().map(x => (x.getLong(0) % 2, x.getLong(1), x.getLong(2)))
    def stats(g: Long) = {
      val rows = users.filter(_._1 == g)
      val n = rows.length
      val xs = rows.map(_._2.toDouble); val ys = rows.map(_._3.toDouble)
      val sx = xs.sum; val sy = ys.sum
      val mx = sx / n; val my = sy / n
      val vx = xs.map(v => (v - mx) * (v - mx)).sum / (n - 1)
      val vy = ys.map(v => (v - my) * (v - my)).sum / (n - 1)
      val cxy = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum / (n - 1)
      val rr = sx / sy
      (n, rr, (vx - 2 * rr * cxy + rr * rr * vy) / (n * my * my))
    }
    val (n1, r1, vr1) = stats(1); val (n0, r0, vr0) = stats(0)
    assert(r.getAs[Long]("n1") == n1.toLong && r.getAs[Long]("n0") == n0.toLong)
    assert(math.abs(r.getAs[Long]("r1_milli") - math.floor(r1 * 1000).toLong) <= 1)
    assert(math.abs(r.getAs[Long]("r0_milli") - math.floor(r0 * 1000).toLong) <= 1)
    val z = (r1 - r0) / math.sqrt(vr1 + vr0)
    assert(math.abs(r.getAs[Long]("z_milli") - math.floor(z * 1000).toLong) <= 1,
      s"z recomputation: got ${r.getAs[Long]("z_milli")}, expected ~${z * 1000}")
  }
}
