package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global ordering primitives (SURVEY.md §5).
  *
  * `Window.orderBy(...)` with no partition key moves EVERY row to one
  * task ("WindowExec: No Partition Defined") — correct at sf0.1, a
  * serialization point at 100 TB. These helpers compute the exact same
  * global row_number / running sum / ntile with a two-phase plan that
  * stays parallel:
  *
  *   1. `repartitionByRange(nParts, order)` — range exchange, so every
  *      row in partition i sorts before every row in partition j > i
  *      (rows with equal keys land in the same partition);
  *   2. per-partition local window keyed by `spark_partition_id()` —
  *      balanced tasks, never a single global one;
  *   3. per-partition counts/sums (nParts rows) cumulated on the driver
  *      side of a broadcast join — the only unpartitioned window left
  *      runs over ≤ nParts aggregated rows, bounded by construction.
  *
  * The range-partitioned input is materialized once (see
  * [[pinnedRangeParts]]) so the offsets subtree and the main subtree
  * read identical physical partitions.
  *
  * Exactness requires what the single-task form already required for
  * oracle hash-parity: `order` must be a total order (include a
  * tiebreaker column). Results are identical to
  * `row_number().over(Window.orderBy(order))` / running `sum` — only
  * the physical plan changes.
  */
object ScaleRank {

  private val PID = "_sr_pid"
  private val LOC = "_sr_loc"
  private val OFF = "_sr_off"

  /** Range-partition `df` on `order` and FREEZE the partition ids as
    * data via an eager localCheckpoint.
    *
    * Why the checkpoint is load-bearing: RangePartitioner's sample seed
    * derives from the shuffle RDD's id, so two plan instances of the
    * "same" exchange (Catalyst splits them when column pruning differs
    * between consumers — e.g. the offsets subtree needs fewer columns
    * than the main one) draw slightly DIFFERENT range bounds. Offsets
    * computed against instance A then joined to local ranks from
    * instance B were off by a few rows near every boundary (observed on
    * q385/q391: hits 412 vs 415, run-to-run unstable). Materializing
    * once makes every consumer read the same physical rows, so the
    * pid→offset map is exact by construction. The materialization cost
    * is linear in the projected input — inherent to exact global
    * ranking (any engine's global sort materializes a sorted run).
    * On a multi-executor cluster prefer reliable checkpoint storage if
    * executor loss matters; local checkpoint is the single-JVM form. */
  private def pinnedRangeParts(df: DataFrame, order: Seq[Column],
                               nParts: Int): DataFrame =
    df.repartitionByRange(nParts, order: _*)
      .withColumn(PID, spark_partition_id())
      .localCheckpoint()

  /** Per-partition offsets (exclusive prefix over partition ids) of
    * `agg` evaluated per range partition; broadcast-joined back. */
  private def withOffsets(parts: DataFrame, agg: Column, localCol: Column,
                          out: String): DataFrame = {
    val offs = parts.groupBy(PID).agg(agg.as("_sr_part"))
      .withColumn(OFF, coalesce(
        sum("_sr_part").over(Window.orderBy(PID)
          .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col(PID), col(OFF))
    parts.join(broadcast(offs), PID)
      .withColumn(out, localCol + col(OFF))
      .drop(PID, LOC, OFF)
  }

  /** Exact global `row_number() OVER (ORDER BY order)` as column `out`,
    * without a single-partition WindowExec. */
  def withGlobalRowNumber(df: DataFrame, order: Seq[Column], out: String,
                          nParts: Int = 32): DataFrame = {
    val parts = pinnedRangeParts(df, order, nParts)
      .withColumn(LOC, row_number().over(
        Window.partitionBy(PID).orderBy(order: _*)).cast("bigint"))
    withOffsets(parts, count(lit(1)), col(LOC), out)
  }

  /** Exact global running `sum(value) OVER (ORDER BY order ROWS
    * UNBOUNDED PRECEDING)` as column `out`. `value` must be evaluable
    * on `df`'s columns; sums are carried as BIGINT. */
  def withGlobalRunningSum(df: DataFrame, order: Seq[Column], value: Column,
                           out: String, nParts: Int = 32): DataFrame =
    withGlobalRunningSums(df, order, Seq(value -> out), nParts)

  /** N exact global running sums along ONE order in one pass (one
    * range exchange, one local sort, one broadcast offsets join). */
  def withGlobalRunningSums(df: DataFrame, order: Seq[Column],
                            values: Seq[(Column, String)],
                            nParts: Int = 32): DataFrame = {
    val vcols = values.indices.map(i => s"_sr_v$i")
    val withVals = values.zip(vcols).foldLeft(df) {
      case (d, ((v, _), vc)) => d.withColumn(vc, v.cast("bigint"))
    }
    val parts = pinnedRangeParts(withVals, order, nParts)
    val w = Window.partitionBy(PID).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wOff = Window.orderBy(PID)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLoc = vcols.foldLeft(parts) {
      (d, vc) => d.withColumn(s"_sr_l$vc", sum(vc).over(w))
    }
    val aggs = vcols.map(vc => sum(vc).as(s"_sr_p$vc"))
    val offs = vcols.foldLeft(
        parts.groupBy(PID).agg(aggs.head, aggs.tail: _*)) {
        (d, vc) => d.withColumn(s"_sr_o$vc",
          coalesce(sum(s"_sr_p$vc").over(wOff), lit(0L)))
      }
      .select((col(PID) +: vcols.map(vc => col(s"_sr_o$vc"))): _*)
    values.zip(vcols).foldLeft(withLoc.join(broadcast(offs), PID)) {
        case (d, ((_, out), vc)) =>
          d.withColumn(out, col(s"_sr_l$vc") + col(s"_sr_o$vc"))
      }
      .drop(PID +: vcols.flatMap(vc =>
        Seq(vc, s"_sr_l$vc", s"_sr_o$vc")): _*)
  }

  /** `ntile(k)` bucket from a 1-based global row number `rn` out of `n`
    * total rows — the exact SQL ntile split (first n % k buckets get
    * one extra row). Pure integer column math; pair with
    * [[withGlobalRowNumber]] + a broadcast total. */
  def ntileFromRowNumber(rn: Column, n: Column, k: Int): Column = {
    // Spark's `/` on integers is double division; floor+cast is exact
    // for counts < 2^53. CaseWhen evaluates only the taken branch, so
    // the size=0 division can't throw (only reachable when n < k, and
    // then rn <= cut always holds).
    def idiv(a: Column, b: Column): Column = floor(a / b).cast("bigint")
    val kL = lit(k.toLong)
    val size = idiv(n, kL)
    val rem = n % kL
    val cut = rem * (size + lit(1L))
    when(rn <= cut, idiv(rn - 1, size + lit(1L)) + 1)
      .otherwise(rem + idiv(rn - cut - 1, size) + 1)
      .cast("int")
  }

  /** Exact global row_number AND running sum of `value` in ONE
    * range-partitioned pass (one checkpoint, one local sort) — for the
    * Pareto/Lorenz-curve idiom that needs both rank and cumulative
    * value along the same order. */
  def withGlobalRankAndSum(df: DataFrame, order: Seq[Column], value: Column,
                           rnOut: String, sumOut: String,
                           nParts: Int = 32): DataFrame = {
    val parts = pinnedRangeParts(df.withColumn("_sr_v", value.cast("bigint")),
      order, nParts)
    val w = Window.partitionBy(PID).orderBy(order: _*)
    val withLoc = parts
      .withColumn(LOC, row_number().over(w).cast("bigint"))
      .withColumn("_sr_ls", sum("_sr_v").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offs = parts.groupBy(PID)
      .agg(count(lit(1)).as("_sr_c"), sum("_sr_v").as("_sr_s"))
      .withColumn("_sr_offc", coalesce(sum("_sr_c").over(Window.orderBy(PID)
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_sr_offs", coalesce(sum("_sr_s").over(Window.orderBy(PID)
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(PID), col("_sr_offc"), col("_sr_offs"))
    withLoc.join(broadcast(offs), PID)
      .withColumn(rnOut, col(LOC) + col("_sr_offc"))
      .withColumn(sumOut, col("_sr_ls") + col("_sr_offs"))
      .drop(PID, LOC, "_sr_v", "_sr_ls", "_sr_offc", "_sr_offs")
  }

  /** Exact `percentile_disc(num/den)` of `value` (must be integral):
    * the smallest value whose 1-based global rank under `ORDER BY
    * value` reaches ceil(n * num / den). Computed from per-value
    * counts + a two-phase running sum over the DISTINCT-VALUE domain —
    * never ranks individual rows, so the sort is over |domain|, not n.
    * Returns a 1-row frame with column `out`.
    *
    * Replaces the serializing idiom
    * `row_number over (ORDER BY v) ... WHERE rn*den >= n*num → min(v)`:
    * rank r of the first row of value v is cum(v)-c(v)+1, so
    * min{v : cum(v)*den >= n*num} is the value at rank
    * ceil(n*num/den) (integer identity cum >= ceil(x/den) ⇔
    * cum*den >= x). */
  def quantileDisc(df: DataFrame, value: Column, num: Int, den: Int,
                   out: String, nParts: Int = 32): DataFrame = {
    val byV = df.groupBy(value.as("_sr_qv")).agg(count(lit(1)).as("_sr_qc"))
    val cum = withGlobalRunningSum(byV, Seq(col("_sr_qv")), col("_sr_qc"),
      "_sr_qcum", nParts)
    cum.crossJoin(broadcast(cum.agg(max("_sr_qcum").as("_sr_qn"))))
      .where(col("_sr_qcum") * den >= col("_sr_qn") * num)
      .agg(min("_sr_qv").as(out))
  }

  /** Exact global `ntile(k) OVER (ORDER BY order)` as column `out`,
    * via two-phase row_number + broadcast total + integer ntile math. */
  def withGlobalNtile(df: DataFrame, order: Seq[Column], k: Int, out: String,
                      nParts: Int = 32): DataFrame =
    withTotals(withGlobalRowNumber(df, order, "_sr_rn", nParts),
        Seq(count(lit(1)).as("_sr_n")))
      .withColumn(out, ntileFromRowNumber(col("_sr_rn"), col("_sr_n"), k))
      .drop("_sr_rn", "_sr_n")

  /** Broadcast global aggregates onto every row: `agg` + broadcast
    * crossJoin — replaces `X OVER ()` windows (which serialize) for
    * grand totals. Scans `df` twice; at scale that beats moving every
    * row to one task. */
  def withTotals(df: DataFrame, aggs: Seq[Column]): DataFrame =
    df.crossJoin(broadcast(df.agg(aggs.head, aggs.tail: _*)))
}
