package graft.tools

import graft.{GraftSession, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Dev-only scale probe for the round-5/6 cohort (q503-q561): replicates
  * the FACT tables (orders, lineitem, customer, documents — new key
  * ranges, baskets/histories intact) by an integer factor, keeps the
  * dimensions (part, supplier, nation, region) fixed — dims grow slower
  * than facts at 100 TB — and times the REAL registered queries at 1×
  * and factor×. Near-linear wall-clock growth is the §5 evidence that
  * no stage in the cohort is super-linear in data volume.
  *
  * Usage: ProbeScaleR5 [factor] [query...]; default factor=10 at
  * SPARK_GRAFT_SF_DIR.
  */
object ProbeScaleR5 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("probe-scale-r5")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q540_assignment", "q545_rich_club", "q546_matrix_profile",
        "q547_causal_impact", "q552_partsupp_count", "q553_huber_irls",
        "q535_char_entropy", "q558_cdc_chunking", "q559_logrank",
        "q560_ordered_target_stats", "q561_katz_centrality")

    val tmp = java.nio.file.Files.createTempDirectory("graft-scale-r5").toString
    val ord = Tables.t(spark, dir, "orders")
    (0 until factor).map { k =>
      ord.select((col("o_orderkey") + lit(k * 100000000L)).as("o_orderkey"),
        (col("o_custkey") + lit(k * 10000000L)).as("o_custkey"),
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
    val cust = Tables.t(spark, dir, "customer")
    (0 until factor).map { k =>
      cust.select(((col("c_custkey") + lit(k * 10000000L)).as("c_custkey") +:
        cust.columns.filter(_ != "c_custkey").map(col).toIndexedSeq): _*)
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    val docs = Tables.t(spark, dir, "documents")
    (0 until factor).map { k =>
      docs.select(((col("doc_id") + lit(k * 10000000L)).as("doc_id") +:
        docs.columns.filter(_ != "doc_id").map(col).toIndexedSeq): _*)
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    Seq("part", "supplier", "nation", "region").foreach { d =>
      Tables.t(spark, dir, d).write.mode("overwrite").parquet(s"$tmp/$d.parquet")
    }
    println(s"[scale-r5] orders=${Tables.t(spark, tmp, "orders").count()} " +
      s"lineitem=${Tables.t(spark, tmp, "lineitem").count()} " +
      s"documents=${Tables.t(spark, tmp, "documents").count()} (${factor}x)")

    def time(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[scale-r5] $label: $dt%.2f s ($n rows)")
      dt
    }
    for (q <- names) {
      val t1 = time(s"$q @1x")(SparkEntry.queries(q)(spark, dir).count())
      val tf = time(s"$q @${factor}x")(SparkEntry.queries(q)(spark, tmp).count())
      println(f"[scale-r5] $q growth: ${tf / t1}%.1fx at ${factor}x data")
    }
    spark.stop()
  }
}
