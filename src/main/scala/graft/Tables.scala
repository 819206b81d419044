package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reader for the driver-generated parquet tables (TESTDATA.md).
  *
  * At 100 TB these reads become partitioned-table scans; all graft
  * operators take DataFrames so the physical layout (partitionBy /
  * bucketing, see sources/Io.scala) is orthogonal to query logic.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
