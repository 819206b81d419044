package graft.sources

import graft.geo.QuadKey
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout helpers for the 100 TB deployment (SURVEY.md §5).
  *
  * Layout rules encoded here:
  *  - geo tables partition by a coarse quadkey prefix (z<=6 → <=4096
  *    dirs): AOI/bbox queries prune partitions before any scan;
  *  - fact tables write sorted-within-partition on their join key so
  *    row-group (min,max) statistics prune at the parquet level;
  *  - target file size governed by repartition before write (one file
  *    per shuffle partition), maxPartitionBytes on read.
  */
object Io {

  /** Write `df` partitioned by quadkey prefix of (lngCol, latCol) at
    * zoom `z`. Returns the partition column name. */
  def writeByQuadkey(df: DataFrame, path: String, lngName: String, latName: String,
                     z: Int): String = {
    val part = "qk_prefix"
    df.withColumn(part,
        QuadKey.qkString(QuadKey.tileX(col(lngName), z), QuadKey.tileY(col(latName), z), z))
      .write.mode("overwrite").partitionBy(part).parquet(path)
    part
  }

  /** Read a quadkey-partitioned table restricted to one tile prefix —
    * partition pruning handles the rest (verify with explain:
    * PartitionFilters, not PushedFilters). */
  def readQuadkeyPrefix(spark: SparkSession, path: String, prefix: String): DataFrame =
    spark.read.parquet(path).filter(col("qk_prefix").startsWith(prefix))

  /** Write sorted-within-partitions on `sortCols` after hash-distributing
    * by `distCol`: parquet row-group stats then prune point/range lookups
    * on the sort key. */
  def writeSorted(df: DataFrame, path: String, nParts: Int, distCol: String,
                  sortCols: String*): Unit =
    df.repartition(nParts, col(distCol))
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(path)

  /** Bucketed managed table: co-locates `key` so equal-bucketed joins run
    * WITHOUT an exchange — the layout for repeated fact⋈fact joins at
    * 100 TB (e.g. responses⋈tasks on listing id, both huge). Bucket
    * counts must match across join partners. */
  def writeBucketed(df: DataFrame, table: String, nBuckets: Int, key: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** JSONL (one JSON object per line) sink — the interchange format of
    * training-data pipelines. gzip-compressed splittable-enough shards
    * sized by `nParts`; schema rides in every record, so downstream
    * tooling needs no sidecar. */
  def writeJsonl(df: DataFrame, path: String, nParts: Int): Unit =
    df.repartition(nParts)
      .write.mode("overwrite")
      .option("compression", "gzip")
      .json(path)

  /** JSONL source with an explicit schema: never infer on a 100 TB corpus
    * (inference is a full extra scan and makes the schema data-dependent).
    * Corrupt lines are quarantined to `_corrupt` instead of failing the
    * job (PERMISSIVE) — count them, alert, keep going. Note: Spark
    * disallows queries that reference ONLY the corrupt column on a raw
    * JSON scan — cache or persist the parsed frame first. */
  def readJsonl(spark: SparkSession, path: String,
                schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt", org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
}
