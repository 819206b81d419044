package graft.queries

import graft.Tables.t
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 121 — experiment health and
  * forecast-evaluation hygiene:
  *
  *  - q501: sample-ratio-mismatch (SRM) guardrail — the odd/even user
  *    split should be 50/50 by construction; per day, the χ² statistic
  *    (n1−n0)²·10⁶ DIV (n1+n0) in exact integers, flagged against the
  *    3.84 (α=0.05, df=1) boundary. The first thing to check before
  *    trusting ANY of the q133/q239/q474 experiment readouts — a
  *    broken randomizer invalidates them all.
  *  - q502: rolling-origin (blocked time-series) cross-validation —
  *    three folds, each training strictly BEFORE its test week:
  *    seasonal-naive c(d−7) forecasts scored per fold (exact integer
  *    MAE in milli), with the train/test boundary carried in-output.
  *    The forecast-evaluation protocol q218 (single split) should have
  *    used — temporal leakage is impossible by construction.
  *
  * Reference analog: scrape-policy experiment health; harvest-volume
  * forecaster selection without temporal leakage.
  */
object QueriesDX extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q501
    QDef("q501_srm_check",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .selectExpr("user_id", s"($tsMs) DIV 86400000 AS d")
          .distinct()
          .groupBy("d").agg(
            sum(when(col("user_id") % 2 === 1, 1L).otherwise(0L))
              .cast("bigint").as("n1"),
            sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L))
              .cast("bigint").as("n0"))
        daily
          .selectExpr("d", "n1", "n0",
            "(n1 - n0) * (n1 - n0) * 1000000 DIV (n1 + n0) AS chi2_micro")
          .withColumn("srm_flag", col("chi2_micro") > 3841000L)
          .orderBy("d")
      },
      Some("""
        WITH daily AS (
          SELECT d,
                 sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS n1,
                 sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n0
          FROM (SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS d
                FROM events)
          GROUP BY 1)
        SELECT CAST(d AS BIGINT) AS d, CAST(n1 AS BIGINT) AS n1,
               CAST(n0 AS BIGINT) AS n0,
               CAST((n1 - n0) * (n1 - n0) * 1000000 // (n1 + n0) AS BIGINT)
                 AS chi2_micro,
               (n1 - n0) * (n1 - n0) * 1000000 // (n1 + n0) > 3841000
                 AS srm_flag
        FROM daily ORDER BY d""")),

    // --------------------------------------------------------------- q502
    QDef("q502_rolling_origin_cv",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .selectExpr("event_type", s"($tsMs) DIV 86400000 AS d")
          .groupBy("event_type", "d").agg(count(lit(1)).cast("long").as("c"))
        val bounds = daily.agg(min("d").as("lo"), max("d").as("hi"))
        val folds = bounds.select(
          explode(expr("array(CAST(1 AS BIGINT), CAST(2 AS BIGINT), CAST(3 AS BIGINT))")).as("fold"),
          col("lo"), col("hi"))
          .selectExpr("fold", "lo",
            "hi - 7 * (4 - fold) + 1 AS test_lo",
            "hi - 7 * (3 - fold) AS test_hi")
        val scored = daily.as("a")
          .join(daily.as("b"), col("a.event_type") === col("b.event_type") &&
            col("a.d") === col("b.d") + 7)
          .selectExpr("a.event_type AS event_type", "a.d AS d",
            "abs(a.c - b.c) AS abs_err")
          .crossJoin(broadcast(folds))
          .where(col("d") >= col("test_lo") && col("d") <= col("test_hi"))
        scored.groupBy("fold").agg(
          max("test_lo").as("test_lo"), max("test_hi").as("test_hi"),
          count(lit(1)).cast("long").as("n_cells"),
          sum("abs_err").cast("bigint").as("sae"))
          .selectExpr("fold", "test_lo", "test_hi", "n_cells", "sae",
            "sae * 1000 DIV n_cells AS mae_milli")
          .orderBy("fold")
      },
      Some("""
        WITH daily AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS d,
                 CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2),
        bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM daily),
        folds AS (
          SELECT f.fold, lo,
                 hi - 7 * (4 - f.fold) + 1 AS test_lo,
                 hi - 7 * (3 - f.fold) AS test_hi
          FROM bounds, (SELECT unnest([CAST(1 AS BIGINT),
            CAST(2 AS BIGINT), CAST(3 AS BIGINT)]) AS fold) f),
        scored AS (
          SELECT a.event_type, a.d, abs(a.c - b.c) AS abs_err
          FROM daily a JOIN daily b
            ON a.event_type = b.event_type AND a.d = b.d + 7),
        cells AS (
          SELECT fold, test_lo, test_hi, abs_err
          FROM scored, folds
          WHERE d >= test_lo AND d <= test_hi)
        SELECT fold, CAST(max(test_lo) AS BIGINT) AS test_lo,
               CAST(max(test_hi) AS BIGINT) AS test_hi,
               CAST(count(*) AS BIGINT) AS n_cells,
               CAST(sum(abs_err) AS BIGINT) AS sae,
               CAST(sum(abs_err) * 1000 // count(*) AS BIGINT) AS mae_milli
        FROM cells GROUP BY 1 ORDER BY fold"""))
  )
}
