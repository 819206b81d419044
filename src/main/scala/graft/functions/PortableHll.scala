package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic HyperLogLog computed identically by Spark and DuckDB, so
  * approximate-distinct is a full hash-match oracle query rather than a
  * rows-only check (engine-native HLL implementations differ and can never
  * cross-validate).
  *
  * Construction (m = 64 buckets over [[PortableHash.md5Long]]'s 60-bit
  * portable hash):
  *   bucket = h & 63,  rho = 1 + count-of-trailing-zeros(h >> 6), capped
  *   at 40 (p < 2^-40 per key; the cap is applied identically in both
  *   engines, so the estimate stays bit-identical).
  * The harmonic sum is EXACT integer arithmetic — sum of 2^(40-rho_max)
  * per present bucket plus 2^40 per empty bucket, max 2^46 so it fits an
  * int64 in both engines — and only the final division produces a double,
  * from identical integer inputs. Small-range (linear-counting) correction
  * included, same literals both sides; output rounded to a whole count.
  *
  * At 100 TB this is ONE hash + two partial-aggregating groupBys per
  * group — the same shuffle shape as `approx_count_distinct`, with an
  * oracle. Reference analog: distinct-listing accounting per grid/AOI
  * (SURVEY.md §2A q17).
  */
object PortableHll {
  val M = 64
  val RhoCap = 40
  private val Scale: Long = 1L << RhoCap
  /** alpha_64 * m^2 * 2^RhoCap; one double literal shared by both engines
    * (Double.toString round-trips exactly through DuckDB's parser). */
  private val K: Double = 0.709 * 4096.0 * Scale.toDouble
  private val LinThreshold: Double = 2.5 * M

  /** Approximate distinct `key` per `groupCols` → groupCols + `outName`
    * (BIGINT). */
  def approxDistinct(df: DataFrame, key: Column, groupCols: Seq[String],
                     outName: String): DataFrame = {
    val gs = groupCols.map(col)
    val buckets = df
      .select(gs :+ PortableHash.md5Long(key).as("h"): _*)
      .withColumn("bucket", expr("h & 63"))
      .withColumn("rho", expr("least(1 + bit_count(((h >> 6) & -(h >> 6)) - 1), 40)"))
      .groupBy(gs :+ col("bucket"): _*).agg(max("rho").as("mr"))
    buckets
      .groupBy(gs: _*)
      .agg(sum(expr(s"shiftleft(CAST(1 AS BIGINT), $RhoCap - mr)")).as("zp"),
        count(lit(1)).as("nb"))
      .withColumn("v0", lit(M.toLong) - col("nb"))
      .withColumn("e", lit(K) / (col("zp") + col("v0") * lit(Scale)))
      .withColumn(outName,
        when(col("e") < LinThreshold && col("v0") > 0,
          round(lit(M.toDouble) * log(lit(M.toDouble) / col("v0"))))
          .otherwise(round(col("e"))).cast("bigint"))
      .drop("h", "zp", "nb", "v0", "e")
  }

  /** Scalar twin of the column-level estimate, over raw max-rho registers
    * (0 = bucket empty): IDENTICAL integer accumulation and IEEE op order,
    * so a register set merged incrementally by a stream lands on the same
    * whole-count estimate as the batch aggregate over the same rows
    * (StreamOps.windowedApproxDistinct's batch↔stream equivalence). */
  private[graft] def estimateFromRegs(regs: Array[Int]): Long = {
    var zp = 0L
    var nb = 0L
    var i = 0
    while (i < M) {
      val mr = regs(i)
      if (mr > 0) { nb += 1; zp += 1L << (RhoCap - mr) }
      i += 1
    }
    val v0 = M - nb
    val e = K / (zp + v0 * Scale)
    // round exactly as Spark's Round expression (BigDecimal HALF_UP on the
    // double's exact decimal value) — JVM math.round is floor(x+0.5),
    // which can differ by 1 within an ulp of a .5 boundary (r8 advice)
    def sparkRound(x: Double): Long =
      new java.math.BigDecimal(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    if (e < LinThreshold && v0 > 0)
      sparkRound(M.toDouble * math.log(M.toDouble / v0))
    else sparkRound(e)
  }

  /** DuckDB twin: a sub-select producing (<groupE AS groupName>, <outName>)
    * from `fromSql`. `keyE` is cast to VARCHAR before hashing, matching the
    * Spark side's string cast. */
  def approxDistinctSql(fromSql: String, keyE: String, groupE: String,
                        groupName: String, outName: String): String = {
    val hash = PortableHash.md5LongSql(s"CAST($keyE AS VARCHAR)")
    s"""(
      WITH hh_ AS (SELECT $groupE AS g, $hash AS h FROM $fromSql),
      bb_ AS (SELECT g, h & 63 AS bucket,
                     least(1 + bit_count(((h >> 6) & -(h >> 6)) - 1), $RhoCap) AS rho
              FROM hh_),
      mm_ AS (SELECT g, bucket, max(rho) AS mr FROM bb_ GROUP BY 1, 2),
      zz_ AS (SELECT g, CAST(sum(CAST(1 AS BIGINT) << ($RhoCap - mr)) AS BIGINT) AS zp,
                     count(*) AS nb
              FROM mm_ GROUP BY 1),
      ee_ AS (SELECT g, $M - nb AS v0, $K / (zp + ($M - nb) * $Scale) AS e FROM zz_)
      SELECT g AS $groupName,
             CASE WHEN e < $LinThreshold AND v0 > 0
                  THEN CAST(round($M.0 * ln($M.0 / v0)) AS BIGINT)
                  ELSE CAST(round(e) AS BIGINT) END AS $outName
      FROM ee_)"""
  }
}
