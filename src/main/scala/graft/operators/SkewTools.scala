package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY.md §5). AQE's skew-join splitting is
  * the first line of defense (on in GraftSession); deterministic salting
  * covers the cases AQE can't see — e.g. a pre-aggregation on a hot key
  * (one celebrity listing / one viral grid cell at 100 TB). */
object SkewTools {

  /** Salted inner equi-join: the (large, skewed) left side spreads each
    * key over `nSalts` partitions via a deterministic hash of the whole
    * row; the (smaller) right side is replicated nSalts times. Result
    * rows equal the plain join's exactly. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, nSalts: Int): DataFrame = {
    val salted = left.withColumn("_salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(nSalts)))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(nSalts - 1)).cast("array<bigint>")))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase (partial, then final) aggregation that breaks up a hot
    * grouping key: groupBy(key, salt) first, then merge the partials.
    * `aggs` maps output column name → (partial agg of input col, final
    * merge of the partial col). */
  def saltedCount(df: DataFrame, key: String, nSalts: Int): DataFrame = {
    df.withColumn("_salt", pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(nSalts)))
      .groupBy(col(key), col("_salt")).agg(count(lit(1)).as("_partial"))
      .groupBy(col(key)).agg(sum("_partial").cast("bigint").as("n"))
  }
}
