package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

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

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** Canonical `events.ts` representation: nanos-since-epoch BIGINT.
    *
    * The generator has shipped the column both as parquet TIMESTAMP(NANOS)
    * (which `spark.sql.legacy.parquet.nanosAsLong` surfaces as BIGINT
    * directly) and as TIMESTAMP(MICROS) (which Spark reads as
    * TIMESTAMP_NTZ). Normalize to the BIGINT-nanos contract every query
    * relies on (`ts DIV 1000000` == DuckDB `epoch_ms(ts)`). The conversion
    * is exact integer arithmetic (session TZ is UTC) and stays inside
    * whole-stage codegen, so the scan plan is unchanged.
    */
  private def normalizeEventTs(df: DataFrame): DataFrame =
    if (df.schema("ts").dataType == LongType) df
    else df.withColumn("ts", expr("unix_micros(CAST(ts AS TIMESTAMP)) * 1000"))
}
