package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesZ pack. */
class QueriesZSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q110 trajectory: hop accounting vs the event counts, bounds sane") {
    val rows = SparkEntry.queries("q110_trajectory")(spark, dir).collect()
    assert(rows.nonEmpty)
    val perUser = graft.Tables.t(spark, dir, "events")
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      assert(r.getAs[Long]("n_hops") == perUser(u) - 1, "hops = points - 1")
      assert(r.getAs[Long]("max_ukm") <= r.getAs[Long]("total_ukm"))
      // half Earth circumference ≈ 20015 km = 2.0015e10 micro-km per hop max
      assert(r.getAs[Long]("max_ukm") <= 20016L * 1000000L)
    }
  }

  test("q112 share shift: yearly shares sum to ~10000 bp, shifts cancel per year") {
    val rows = SparkEntry.queries("q112_share_shift")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Int]("yr")).foreach { case (_, g) =>
      val total = g.map(_.getAs[Long]("share_bp")).sum
      // integer floor rounding: total within n_segments of 10000
      assert(total > 10000 - g.length && total <= 10000)
    }
  }

  test("q113 fanout histogram: buckets partition the parents, zero bucket present") {
    val rows = SparkEntry.queries("q113_fanout_hist")(spark, dir).collect()
    val nOrders = spark.read.parquet(s"$dir/orders.parquet").count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == nOrders)
    val zero = rows.find(_.getAs[Long]("fanout") == 0L)
    assert(zero.isDefined, "the generator's childless orders must appear as fanout 0")
  }

  test("q115 as-of snapshot == latest-event-at-or-before-T per key") {
    import org.apache.spark.sql.functions._
    val asOf = Q.millisOf("2024-01-20 00:00:00")
    val ev = graft.Tables.t(spark, dir, "events")
      .withColumn("ts_ms", expr(Q.tsMs)).filter(col("ts_ms") <= asOf)
    val direct = graft.operators.Relational
      .latestSnapshot(ev, Seq(col("user_id")), Seq(col("ts_ms"), col("event_id")))
      .groupBy(expr("user_id % 10").as("bucket"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val viaIntervals = graft.SparkEntry.queries("q115_asof_snapshot")(spark, dir)
      .collect().map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Long]("n_keys"), r.getAs[Double]("value_sum"))).toMap
    assert(viaIntervals == direct,
      "interval reconstruction must equal the direct latest-before-T snapshot")
  }

  test("q114 ties-aware top-k: keeps at least 3 per group, never splits a tie") {
    val rows = SparkEntry.queries("q114_topk_ties")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") >= 3, "rank <= 3 keeps at least 3 rows")
      assert(r.getAs[Long]("max_rank") <= 3)
    }
  }
}
