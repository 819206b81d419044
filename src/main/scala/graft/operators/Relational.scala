package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational building blocks mirroring the reference's query surface
  * (latest-response-per-listing, stale-grid selection, upsert-with-move-
  * detection, task accounting — see SURVEY.md §2A).
  *
  * All operators are `DataFrame => DataFrame` compositions of built-in
  * functions: Catalyst sees the full plan, so filter pushdown, partial
  * aggregation and AQE apply unchanged at 100 TB.
  */
object Relational {

  /** Top-k rows per group. Window-based: one shuffle on `partitionCols`.
    * Reference: newest N `AirBnBResponse` rows per listing
    * (/root/reference/src/ubdc_airbnb/ubdc_airbnb/models.py:430 ordering).
    */
  def topKPerGroup(df: DataFrame, partitionCols: Seq[Column], orderCols: Seq[Column], k: Int,
                   rankName: String = "rn"): DataFrame = {
    val w = Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)
    df.withColumn(rankName, row_number().over(w)).filter(col(rankName) <= k)
  }

  /** Latest row per key (argmax by `orderCols`). Same shuffle shape as
    * topKPerGroup(k=1); kept separate because at scale it is often cheaper
    * as `max_by` partial aggregation — both forms produce identical rows.
    * Reference: `AirBnBListing.*_updated_at` freshest-state view. */
  def latestSnapshot(df: DataFrame, keyCols: Seq[Column], orderCols: Seq[Column]): DataFrame =
    topKPerGroup(df, keyCols, orderCols.map(_.desc), 1).drop("rn")

  /** SCD2-style validity intervals: each row valid from its own timestamp
    * until the next row of the same key. Reference: listing movement
    * history notes (workunits.py:158). */
  def scd2Intervals(df: DataFrame, keyCols: Seq[Column], tsCol: Column, tieCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols: _*).orderBy(tsCol +: tieCols: _*)
    df.withColumn("valid_from_ms", tsCol)
      .withColumn("valid_to_ms", lead(tsCol, 1).over(w))
  }

  /** Gap-based sessionization: a new session starts when the time since the
    * previous event of the same key exceeds `gapMs`. Two windows over one
    * shuffle (same partitioning — Catalyst reuses the exchange). */
  def sessionize(df: DataFrame, keyCol: Column, tsMsCol: Column, tieCol: Column, gapMs: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(tsMsCol, tieCol)
    df.withColumn("prev_ts", lag(tsMsCol, 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull || tsMsCol - col("prev_ts") > gapMs, lit(1)).otherwise(lit(0)))
      .withColumn("session_id", sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("prev_ts", "new_sess")
  }

  /** Fixed-width histogram bucket id in [0, nBuckets-1]; values outside
    * [lo, hi) clamp to the edge buckets. Reference: Airbnb price histogram
    * (utils/json_parsers.py:69). */
  def bucketOf(c: Column, lo: Double, width: Double, nBuckets: Int): Column =
    least(greatest(floor((c - lit(lo)) / lit(width)), lit(0)), lit(nBuckets - 1)).cast("int")

  /** As-of (latest-before) lookup: for every row, the most recent value of
    * `pickCol` among rows where `markCol` is true, within the same key,
    * at-or-before the current row. Implemented as carry-forward
    * `last(..., ignoreNulls)` over one ordered window — a single shuffle,
    * no range join (which would be quadratic per key at scale). */
  def asOfCarryForward(df: DataFrame, keyCol: Column, tsCol: Column, tieCol: Column,
                       markCol: Column, pickCol: Column, outName: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(tsCol, tieCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(outName, last(when(markCol, pickCol), ignoreNulls = true).over(w))
  }

  /** Stale-item selection mirroring `op_estimate_listings_or_divide_periodical`
    * (operations/grids.py:80): pick `limit` items whose last activity is
    * older than `cutoffMs` (or never seen), excluding items in `excludeKeys`,
    * oldest (nulls first) first. `excludeKeys` plays the role of the
    * already-submitted-task set. When `hintBroadcast` (default false) the
    * exclusion side is broadcast-hinted — only safe when the caller knows
    * it is small; otherwise AQE picks the join strategy, since at 100 TB
    * the submitted-task set can exceed driver/broadcast limits. */
  def staleScan(universe: DataFrame, keyName: String, lastTsName: String,
                excludeKeys: DataFrame, cutoffMs: Long, limit: Int,
                hintBroadcast: Boolean = false): DataFrame = {
    val excl = if (hintBroadcast) broadcast(excludeKeys) else excludeKeys
    universe
      .join(excl, Seq(keyName), "left_anti")
      .filter(col(lastTsName).isNull || col(lastTsName) <= cutoffMs)
      .orderBy(col(lastTsName).asc_nulls_first, col(keyName).asc)
      .limit(limit)
  }

  /** Upsert merge with change-threshold detection, mirroring
    * `register_listings_from_response` (workunits.py:124): rows in
    * `updates` that are new keys → "created"; existing keys whose value
    * moved more than `threshold` → "moved"; otherwise "unchanged".
    * "created" is decided by join-key absence (a presence marker on the
    * current side), NOT value-NULLness — an existing key whose current
    * value is legitimately NULL must not be misreported as created.
    * Shuffle join on the key (both sides large at 100 TB; AQE handles
    * relative sizes). */
  def upsertMerge(current: DataFrame, updates: DataFrame, keyName: String,
                  curVal: String, updVal: String, threshold: Double): DataFrame = {
    val cur = current.withColumn("_matched", lit(true))
    updates.join(cur, Seq(keyName), "left_outer")
      .withColumn("status",
        when(col("_matched").isNull, lit("created"))
          .when(abs(col(updVal) - col(curVal)) > threshold, lit("moved"))
          .otherwise(lit("unchanged")))
      .drop("_matched")
  }

  /** Largest-remainder proration: distribute each group's BIGINT
    * `totalCol` across its rows proportional to BIGINT `weightCol`,
    * in whole units, conserving the total exactly — floor shares, then
    * +1 to the rows with the largest remainders (ties by `tieCol`).
    * Adds `alloc` and `bump`; q132's exact-money allocation as a
    * reusable operator (two windows over the group partition). */
  def prorate(df: DataFrame, groupCol: String, totalCol: String,
              weightCol: String, tieCol: String): DataFrame = {
    val wsum = Window.partitionBy(groupCol)
    val base = df
      .withColumn("_wsum", sum(weightCol).over(wsum))
      .withColumn("_share", expr(s"$totalCol * $weightCol DIV _wsum"))
      .withColumn("_frac", expr(s"($totalCol * $weightCol) % _wsum"))
      .withColumn("_rem", col(totalCol) - sum("_share").over(wsum))
    val wrank = Window.partitionBy(groupCol)
      .orderBy(col("_frac").desc, col(tieCol))
    base
      .withColumn("bump", when(row_number().over(wrank) <= col("_rem"), 1L)
        .otherwise(0L))
      .withColumn("alloc", col("_share") + col("bump"))
      .drop("_wsum", "_share", "_frac", "_rem")
  }

  /** 2-D skyline (Pareto frontier): distinct (xCol minimized, yCol
    * maximized) points not dominated by any other. The distributed
    * hash-aggregate collapses to one row per distinct x FIRST, so the
    * single global window runs over the (bounded) distinct-x set — the
    * q147 scale shape as a reusable operator. Returns (x, y,
    * multiplicity). */
  def skyline2d(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val counts = df.groupBy(xCol, yCol).agg(count(lit(1)).as("multiplicity"))
    val wSame = Window.partitionBy(xCol).orderBy(col(yCol).desc)
    val perX = counts
      .withColumn("_rk", row_number().over(wSame))
      .where(col("_rk") === 1)
    val wCheaper = Window.orderBy(xCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    perX
      .withColumn("_cm", max(yCol).over(wCheaper))
      .where(col("_cm").isNull || col(yCol) > col("_cm"))
      .drop("_rk", "_cm")
  }
}
