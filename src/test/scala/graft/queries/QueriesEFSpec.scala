package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants for the QueriesEF pack (L-moments, prefix cache,
  * transition stationarity, USL fit). */
class QueriesEFSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q530 L-moments: direct sorted-array recomputation matches and " +
      "Hosking bounds hold") {
    val r = SparkEntry.queries("q530_l_moments")(spark, dir).collect().head
    val xs = graft.Tables.t(spark, dir, "orders")
      .where("o_totalprice IS NOT NULL")
      .selectExpr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DIV 100 AS x")
      .collect().map(_.getLong(0)).sorted
    val n = xs.length
    var s0 = BigInt(0); var s1 = BigInt(0); var s2 = BigInt(0); var s3 = BigInt(0)
    for (i <- 1 to n) {
      val x = BigInt(xs(i - 1))
      s0 += x; s1 += (i - 1) * x
      s2 += BigInt(i - 1) * (i - 2) * x
      s3 += BigInt(i - 1) * (i - 2) * (i - 3) * x
    }
    val b0 = s0.toDouble / n
    val b1 = s1.toDouble / n / (n - 1)
    val b2 = s2.toDouble / n / (n - 1) / (n - 2)
    val b3 = s3.toDouble / n / (n - 1) / (n - 2) / (n - 3)
    val l1 = b0; val l2 = 2 * b1 - b0
    val l3 = 6 * b2 - 6 * b1 + b0
    val l4 = 20 * b3 - 30 * b2 + 12 * b1 - b0
    assert(r.getAs[Long]("n") == n.toLong)
    assert(math.abs(r.getAs[Long]("l1_milli") - math.floor(l1 * 1000).toLong) <= 1)
    assert(math.abs(r.getAs[Long]("l2_milli") - math.floor(l2 * 1000).toLong) <= 1)
    assert(math.abs(r.getAs[Long]("t3_micro") - math.floor(l3 / l2 * 1e6).toLong) <= 1)
    assert(math.abs(r.getAs[Long]("t4_micro") - math.floor(l4 / l2 * 1e6).toLong) <= 1)
    // Hosking: |t3| < 1, and t4 >= (5*t3^2 - 1)/4, t4 < 1
    val t3 = r.getAs[Long]("t3_micro") / 1e6; val t4 = r.getAs[Long]("t4_micro") / 1e6
    assert(math.abs(t3) < 1 && t4 < 1 && t4 >= (5 * t3 * t3 - 1) / 4 - 1e-6)
  }

  test("q531 prefix cache: totals match a full Scala replay of " +
      "sessionization + common prefixes") {
    val r = SparkEntry.queries("q531_prefix_cache")(spark, dir).collect().head
    val ev = graft.Tables.t(spark, dir, "events")
      .selectExpr("user_id", "ts DIV 1000000 AS ms", "event_id", "event_type")
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3)))
      .groupBy(_._1)
    var nPairs = 0L; var totTok = 0L; var totPre = 0L
    ev.foreach { case (_, rows) =>
      val sorted = rows.sortBy(e => (e._2, e._3))
      val sessions = scala.collection.mutable.ArrayBuffer[Vector[String]]()
      var cur = Vector[String](); var prevMs = Long.MinValue
      sorted.foreach { e =>
        if (prevMs != Long.MinValue && e._2 - prevMs > 43200000L) {
          sessions += cur; cur = Vector()
        }
        cur :+= e._4; prevMs = e._2
      }
      if (cur.nonEmpty) sessions += cur
      sessions.sliding(2).foreach { pair =>
        if (pair.length == 2) {
          val a = pair(0); val b = pair(1)
          nPairs += 1; totTok += b.length.toLong
          totPre += a.zip(b).takeWhile(p => p._1 == p._2).length.toLong
        }
      }
    }
    assert(r.getAs[Long]("n_pairs") == nPairs)
    assert(r.getAs[Long]("total_tokens") == totTok)
    assert(r.getAs[Long]("total_prefix") == totPre)
    assert(r.getAs[Long]("hit_bp") == totPre * 10000 / totTok)
  }

  test("q532 stationarity: chi2 contributions are nonnegative and the " +
      "half split conserves transitions") {
    val out = SparkEntry.queries("q532_transition_stationarity")(spark, dir)
      .collect()
    assert(out.nonEmpty)
    val totalTrans = out.map(r =>
      r.getAs[Long]("h1_trans") + r.getAs[Long]("h2_trans")).sum
    val directTrans = graft.Tables.t(spark, dir, "events").count() -
      graft.Tables.t(spark, dir, "events").select("user_id").distinct().count()
    assert(totalTrans == directTrans,
      "every consecutive same-user pair is exactly one transition")
    out.foreach { r =>
      assert(r.getAs[Long]("chi2_milli") >= 0)
      assert(r.getAs[Long]("n_dst") >= 1 && r.getAs[Long]("n_dst") <= 5)
      val drifted = r.getAs[Long]("drifted")
      assert(drifted == 0L || drifted == 1L)
    }
  }

  test("q533 USL: reported SSE is the grid minimum (exhaustive replay)") {
    val r = SparkEntry.queries("q533_usl_fit")(spark, dir).collect().head
    val pts = graft.Tables.t(spark, dir, "events")
      .selectExpr("(ts DIV 1000000) DIV 3600000 AS hour", "user_id")
      .groupBy("hour").agg(countDistinct("user_id").as("nc"),
        count(lit(1)).as("x"))
      .groupBy("nc").agg(expr("CAST(sum(x) AS BIGINT) * 1000 DIV count(*) AS xm"))
      .collect().map(x => (x.getAs[Number]("nc").longValue, x.getLong(1)))
    val lmax = pts.map { case (nc, xm) => xm / nc }.max
    var best = (Long.MaxValue, 0L, 0L, 0L)
    for (li <- 0L to 8L; si <- 0L to 7L; ki <- 0L to 7L) {
      val lam = lmax * (li + 4) / 8
      val sse = pts.map { case (nc, xm) =>
        val pred = lam.toDouble * nc /
          (1 + si.toDouble / 32 * (nc - 1) + ki.toDouble / 4096 * nc * (nc - 1))
        math.floor((xm - pred) * (xm - pred) / 1e6).toLong
      }.sum
      if (Ordering[(Long, Long, Long, Long)].lt((sse, lam, si, ki), best))
        best = (sse, lam, si, ki)
    }
    assert(r.getAs[Long]("sse") == best._1)
    assert(r.getAs[Long]("lambda_milli") == best._2)
    assert(r.getAs[Long]("sigma_32") == best._3)
    assert(r.getAs[Long]("kappa_4096") == best._4)
  }
}
