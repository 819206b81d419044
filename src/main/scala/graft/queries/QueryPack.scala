package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: Spark implementation + (optionally) the
  * equivalent ANSI SQL for the DuckDB oracle. Column names and types must
  * match between the two (driver sorts columns by name and hashes values).
  */
final case class QDef(
    name: String,
    impl: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryPack {
  def defs: Seq[QDef]

  final def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.impl).toMap
  final def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}

/** Shared helpers keeping Spark and DuckDB arithmetically identical. */
object Q {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.DecimalType

  /** Monetary/2-dp doubles get cast to DECIMAL(18,2) before aggregation:
    * decimal sums are exact and order-independent, so parallel Spark
    * aggregation hash-matches single-threaded DuckDB. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  /** Final OUTPUT form of an exact decimal aggregate: cast to DOUBLE.
    * Both engines convert the identical exact decimal with a correctly-
    * rounded cast → bit-identical doubles. DECIMAL output columns are
    * avoided entirely: the driver's canonicalization of parquet decimals
    * vs oracle decimals diverges (r02: every decimal-output query hash-
    * mismatched; every double/int/string output matched). */
  def dec38(c: Column): Column = c.cast("double")
  val decSql = "DECIMAL(18,2)"
  val dec38Sql = "DOUBLE"

  /** events.ts is nanos-since-epoch BIGINT in Spark (see GraftSession);
    * `ts DIV 1000000` equals DuckDB `epoch_ms(ts)` exactly. */
  val tsMs = "ts DIV 1000000"
  /** Nanos value of a UTC timestamp literal 'yyyy-MM-dd HH:mm:ss'. */
  def nanosOf(isoUtc: String): Long =
    java.time.LocalDateTime.parse(isoUtc.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000000L
  def millisOf(isoUtc: String): Long = nanosOf(isoUtc) / 1000000L
}
