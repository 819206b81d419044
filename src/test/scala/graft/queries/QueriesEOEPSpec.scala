package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants for the QueriesEO + QueriesEP packs (AUC, calibration,
  * k-means, Markov stationary, stump, Nelson–Aalen, G-test, NB). */
class QueriesEOEPSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q570 AUC: doubled-U identity matches a brute-force pairwise " +
      "count with half-credit ties") {
    val r = SparkEntry.queries("q570_auc_rank")(spark, dir).collect().head
    val rows = graft.Tables.t(spark, dir, "orders")
      .selectExpr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) % 997 AS sc",
        """CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           THEN 1 ELSE 0 END AS y""")
      .collect().map(x => (x.getLong(0), x.getInt(1)))
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    // brute force over bounded score histograms (not raw pairs)
    val ph = pos.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nh = neg.groupBy(identity).view.mapValues(_.size.toLong).toMap
    var u2 = 0L
    for ((s1, p) <- ph; (s2, n) <- nh)
      u2 += (if (s1 > s2) 2L * p * n else if (s1 == s2) p * n else 0L)
    assert(r.getAs[Long]("u2") == u2)
    assert(r.getAs[Long]("n_pos") == pos.length.toLong)
    assert(r.getAs[Long]("n_neg") == neg.length.toLong)
    val auc = r.getAs[Long]("auc_ppm")
    assert(auc >= 0 && auc <= 1000000)
  }

  test("q571 calibration: bins partition the fact table and rates are " +
      "exact integer ratios") {
    val out = SparkEntry.queries("q571_calibration_bins")(spark, dir)
      .collect()
    val n = graft.Tables.t(spark, dir, "lineitem").count()
    assert(out.map(_.getAs[Long]("n")).sum == n)
    out.foreach { r =>
      assert(r.getAs[Long]("rate_ppm") >= 0 &&
        r.getAs[Long]("rate_ppm") <= 1000000)
      assert(r.getAs[Long]("gap_ppm") ==
        math.abs(r.getAs[Long]("mean_pred_ppm") - r.getAs[Long]("rate_ppm")))
    }
  }

  test("q572 k-means: 3 Lloyd rounds match a driver replay on the " +
      "bounded cell census") {
    val out = SparkEntry.queries("q572_kmeans_rounds")(spark, dir).collect()
      .map(r => (r.getAs[Long]("cid"),
        (r.getAs[Long]("cx"), r.getAs[Long]("cy"), r.getAs[Long]("npts"))))
      .toMap
    val cells = graft.Tables.t(spark, dir, "orders")
      .selectExpr(
        "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 % 97 AS x",
        "CAST(floor(o_totalprice + 0.5) AS BIGINT) % 89 AS y")
      .groupBy("x", "y").count()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    var cent = Map(0L -> (10L, 10L), 1L -> (50L, 20L), 2L -> (30L, 70L),
      3L -> (80L, 80L))
    var sizes = Map.empty[Long, Long]
    (1 to 3).foreach { _ =>
      val assign = cells.map { case (x, y, cnt) =>
        val cid = cent.toSeq.map { case (id, (cx, cy)) =>
          ((x - cx) * (x - cx) + (y - cy) * (y - cy), id)
        }.min._2
        (cid, x, y, cnt)
      }
      cent = assign.groupBy(_._1).view.mapValues { g =>
        val w = g.map(_._4).sum
        (g.map(t => t._2 * t._4).sum / w, g.map(t => t._3 * t._4).sum / w)
      }.toMap
      sizes = assign.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    }
    cent.foreach { case (cid, (cx, cy)) =>
      assert(out(cid) == ((cx, cy, sizes(cid))), s"centroid $cid")
    }
  }

  test("q573 Markov stationary: quantized power iteration stays within " +
      "ppm mass bounds and matches a driver replay") {
    val out = SparkEntry.queries("q573_markov_stationary")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("stat_ppm")).toMap
    val mass = out.values.sum
    // each quantized DIV loses < 1 ppm per edge; mass stays near 1e6
    assert(mass > 900000 && mass <= 1000000, s"mass $mass")
    // driver replay
    val p = graft.Tables.t(spark, dir, "events")
      .selectExpr("user_id", "ts", "event_id", "event_type")
      .withColumn("nxt", expr(
        """lead(event_type, 1) OVER (PARTITION BY user_id
           ORDER BY ts, event_id)"""))
      .where(col("nxt").isNotNull)
      .groupBy("event_type", "nxt").count()
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val rowTot = p.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val ppm = p.map { case ((a, b), c) => ((a, b), c * 1000000L / rowTot(a)) }
      .toMap
    val states = rowTot.keys.toSeq.sorted
    var x = states.map(_ -> 1000000L / states.size).toMap
    (1 to 3).foreach { _ =>
      x = states.map { b =>
        b -> ppm.collect { case ((a2, b2), w) if b2 == b =>
          x.getOrElse(a2, 0L) * w
        }.sum / 1000000L
      }.toMap
    }
    states.foreach(st => assert(out(st) == x(st), s"state $st"))
  }

  test("q574 stump: the reported threshold is the argmax of a driver " +
      "replay of the gain formula") {
    val r = SparkEntry.queries("q574_info_gain_stump")(spark, dir)
      .collect().head
    val census = graft.Tables.t(spark, dir, "lineitem")
      .selectExpr("l_partkey",
        "CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END AS y")
      .join(graft.Tables.t(spark, dir, "part")
        .select(col("p_partkey"), col("p_size")),
        expr("l_partkey = p_partkey"))
      .groupBy(col("p_size").cast("long").as("sz"))
      .agg(count(lit(1)).as("ns"), sum("y").as("ps"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .sortBy(_._1)
    val n = census.map(_._2).sum
    val p = census.map(_._3).sum
    def h(nn: Long, pp: Long): Double =
      if (pp == 0 || pp == nn) 0.0
      else -(pp.toDouble / nn) * math.log(pp.toDouble / nn) -
        ((nn - pp).toDouble / nn) * math.log((nn - pp).toDouble / nn)
    var best = (Long.MinValue, Long.MaxValue)
    var nl = 0L; var pl = 0L
    census.foreach { case (sz, ns, ps) =>
      nl += ns; pl += ps
      if (nl < n) {
        val g = math.floor((h(n, p) - (nl.toDouble / n) * h(nl, pl) -
          ((n - nl).toDouble / n) * h(n - nl, p - pl)) * 1e6).toLong
        if (g > best._1 || (g == best._1 && sz < best._2)) best = (g, sz)
      }
    }
    assert(r.getAs[Long]("threshold") == best._2)
    assert(r.getAs[Long]("gain_micro") == best._1)
  }

  test("q575 Nelson-Aalen: cumulative hazard is nondecreasing and " +
      "pure-integer increments never exceed 1e6 per event time") {
    val out = SparkEntry.queries("q575_nelson_aalen")(spark, dir).collect()
    assert(out.nonEmpty)
    val hs = out.sortBy(_.getAs[Long]("bucket")).map(_.getAs[Long]("h_micro"))
    assert(hs.zip(hs.tail).forall { case (a, b) => a <= b }, "monotone")
    assert(hs.forall(_ >= 0))
    out.foreach(r => assert(r.getAs[Long]("t_end") / 30 ==
      r.getAs[Long]("bucket")))
  }

  test("q576 G-test: contingency accounts for every order and df " +
      "matches the realized table") {
    val r = SparkEntry.queries("q576_gtest")(spark, dir).collect().head
    val n = graft.Tables.t(spark, dir, "orders").count()
    assert(r.getAs[Long]("n") == n)
    val dims = graft.Tables.t(spark, dir, "orders")
      .join(graft.Tables.t(spark, dir, "customer"),
        expr("o_custkey = c_custkey"))
      .agg(countDistinct("c_mktsegment"), countDistinct("o_orderstatus"))
      .collect().head
    assert(r.getAs[Long]("df") == (dims.getLong(0) - 1) * (dims.getLong(1) - 1))
    // G is non-negative up to the per-cell micro-floor loss (≤ 1 per cell)
    assert(r.getAs[Long]("g_micro") > -100)
  }

  test("q577 naive Bayes: predictions cover every document exactly once " +
      "and accuracy beats the majority-class prior") {
    val out = SparkEntry.queries("q577_naive_bayes")(spark, dir).collect()
    val nDocs = graft.Tables.t(spark, dir, "documents")
      .where("text IS NOT NULL").count()
    assert(out.map(_.getAs[Long]("n_docs")).sum == nDocs)
    out.foreach { r =>
      assert(r.getAs[Long]("n_correct") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("acc_bp") ==
        r.getAs[Long]("n_correct") * 10000 / r.getAs[Long]("n_docs"))
    }
    val overall = out.map(_.getAs[Long]("n_correct")).sum * 10000 / nDocs
    val majority = out.map(_.getAs[Long]("n_docs")).max * 10000 / nDocs
    assert(overall >= majority,
      s"trained NB ($overall bp) >= majority prior ($majority bp)")
  }
}
