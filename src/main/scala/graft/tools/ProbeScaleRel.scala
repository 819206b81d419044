package graft.tools

import graft.{GraftSession, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Dev-only relational/graph-family scale probe: replicates `events` (new
  * user-id ranges so per-key history shapes survive) and `orders`/
  * `lineitem` (new order-key ranges, baskets intact) by an integer factor
  * and times the REAL registered queries — §5 linearity evidence for the
  * round-4 additions (sequential-recurrence mapPartitions ops, WAU cover
  * trick, co-occurrence pair mining, hotspot CC, skyline).
  *
  * Usage: ProbeScaleRel [factor] [query...]; default factor=10 at
  * SPARK_GRAFT_SF_DIR.
  */
object ProbeScaleRel {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("probe-scale-rel")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q124_capped_balance", "q149_capped_sessions", "q151_rolling_distinct",
        "q140_cooccurrence", "q145_hotspot_cluster", "q147_skyline",
        "q137_attribution", "q153_scd2_lookup")

    val tmp = java.nio.file.Files.createTempDirectory("graft-scale-rel").toString
    val ev = Tables.t(spark, dir, "events")
    (0 until factor).map { k =>
      ev.select((col("event_id") + lit(k * 100000000L)).as("event_id"),
        col("ts"), (col("user_id") + lit(k * 100000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val ord = Tables.t(spark, dir, "orders")
    (0 until factor).map { k =>
      ord.select((col("o_orderkey") + lit(k * 100000000L)).as("o_orderkey"),
        (col("o_custkey") + lit(k * 100000L)).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val li = Tables.t(spark, dir, "lineitem")
    (0 until factor).map { k =>
      li.select((col("l_orderkey") + lit(k * 100000000L)).as("l_orderkey"),
        col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    println(s"[scale-rel] events=${Tables.t(spark, tmp, "events").count()} " +
      s"lineitem=${Tables.t(spark, tmp, "lineitem").count()} (${factor}x)")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scale-rel] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    for (q <- names) {
      time(s"$q @1x")(SparkEntry.queries(q)(spark, dir).count())
      time(s"$q @${factor}x")(SparkEntry.queries(q)(spark, tmp).count())
    }
    spark.stop()
  }
}
