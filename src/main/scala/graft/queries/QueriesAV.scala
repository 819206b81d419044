package graft.queries

import graft.Tables.t
import graft.functions.TextFunctions.{words, wordsSql}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 41 — centroid geometry, series
  * memory, tokenizer economics, risk accounting:
  *
  *  - q190: polygon centroid (ST_Centroid analog) over the q83/q89
  *    integer-vertex pentagons — exact shoelace centroid numerators
  *    Σ(x1+x2)·cross and signed 2·area on BIGINT, one sign-normalized
  *    integer division to micro units at the end. Zero FP anywhere.
  *  - q191: autocorrelation function (lags 1-3) of each event_type's
  *    daily-count series. Deviations are pre-scaled by n (d_t = n·y_t −
  *    Σy) so every numerator/denominator term is exact BIGINT; the only
  *    division is the final sign-normalized milli quantization. The
  *    O(n²)-free form: lags via 3 window leads over the BOUNDED daily
  *    aggregate (~31 rows/type), never the raw stream.
  *  - q192: tokenizer fertility/economics per language — whitespace
  *    words vs BPE-ish ceil(chars/4) subword estimate (q52's rule):
  *    subwords-per-word and chars-per-word in integer basis points.
  *    The "how expensive is this language to tokenize" gate used when
  *    budgeting a multilingual corpus (pairs with q102's mixing).
  *  - q193: maximum drawdown of the cumulative daily revenue curve per
  *    order priority — running-sum cumulative cents, running max, max
  *    (peak − current) in exact cents plus the day it bottoms
  *    (deterministic earliest-day tiebreak). The risk/monitoring shape
  *    for any cumulative KPI curve.
  *
  * Reference analog: centroid = AOI shape label-point reporting
  * (`AOIShape.geom_3857` ST_Centroid); ACF = harvest-volume periodicity
  * check beside q139's seasonal index; fertility = review-corpus
  * language cost accounting; drawdown = collection-throughput regression
  * monitoring on the cumulative curve.
  */
object QueriesAV extends QueryPack {
  import Q._

  /** The q83/q89 pentagon vertex offsets, in ring order. */
  private val Ring = Seq((-30, -40), (20, -35), (32, 10), (5, 45), (-25, 20))

  /** Sign-normalized integer division: truncation-toward-zero with both
    * operands made non-negative first, so Spark `DIV` and DuckDB `//`
    * agree on negative inputs. */
  private def signDiv(num: String, den: String): String =
    s"""CASE WHEN ($den) = 0 THEN NULL
        WHEN (($num) >= 0) = (($den) >= 0)
        THEN abs($num) DIV abs($den)
        ELSE -(abs($num) DIV abs($den)) END"""
  private def signDivSql(num: String, den: String): String =
    s"""CASE WHEN ($den) = 0 THEN NULL
        WHEN (($num) >= 0) = (($den) >= 0)
        THEN abs($num) // abs($den)
        ELSE -(abs($num) // abs($den)) END"""

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q190
    QDef("q190_polygon_centroid",
      (s, dir) => {
        val edges = Ring.zip(Ring.tail :+ Ring.head).map { case ((ax, ay), (bx, by)) =>
          (ax, ay, bx, by)
        }
        import s.implicits._
        val offsDf = edges.toDF("dx1", "dy1", "dx2", "dy2")
        t(s, dir, "region")
          .select(col("r_regionkey"), col("r_name"),
            (col("r_regionkey") * 72 - 144).cast("bigint").as("cx"))
          .crossJoin(broadcast(offsDf))
          .select(col("r_name"),
            (col("cx") + col("dx1")).as("x1"), col("dy1").cast("bigint").as("y1"),
            (col("cx") + col("dx2")).as("x2"), col("dy2").cast("bigint").as("y2"))
          .groupBy("r_name")
          .agg(
            sum(col("x1") * col("y2") - col("x2") * col("y1")).cast("bigint").as("a2"),
            sum((col("x1") + col("x2")) * (col("x1") * col("y2") - col("x2") * col("y1")))
              .cast("bigint").as("sx"),
            sum((col("y1") + col("y2")) * (col("x1") * col("y2") - col("x2") * col("y1")))
              .cast("bigint").as("sy"))
          .selectExpr("r_name", "a2",
            s"${signDiv("sx * 1000000", "3 * a2")} AS cx_micro",
            s"${signDiv("sy * 1000000", "3 * a2")} AS cy_micro")
          .orderBy("r_name")
      },
      Some {
        val edges = Ring.zip(Ring.tail :+ Ring.head)
          .map { case ((ax, ay), (bx, by)) => s"($ax, $ay, $bx, $by)" }.mkString(", ")
        s"""
        WITH offs(dx1, dy1, dx2, dy2) AS (VALUES $edges),
        e AS (
          SELECT r_name,
                 CAST(r_regionkey*72 - 144 + dx1 AS BIGINT) AS x1, CAST(dy1 AS BIGINT) AS y1,
                 CAST(r_regionkey*72 - 144 + dx2 AS BIGINT) AS x2, CAST(dy2 AS BIGINT) AS y2
          FROM region CROSS JOIN offs),
        a AS (
          SELECT r_name,
                 CAST(sum(x1*y2 - x2*y1) AS BIGINT) AS a2,
                 CAST(sum((x1 + x2) * (x1*y2 - x2*y1)) AS BIGINT) AS sx,
                 CAST(sum((y1 + y2) * (x1*y2 - x2*y1)) AS BIGINT) AS sy
          FROM e GROUP BY 1)
        SELECT r_name, a2,
               ${signDivSql("sx * 1000000", "3 * a2")} AS cx_micro,
               ${signDivSql("sy * 1000000", "3 * a2")} AS cy_micro
        FROM a ORDER BY r_name"""
      }),

    // --------------------------------------------------------------- q191
    QDef("q191_autocorr",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .selectExpr("event_type", s"($tsMs) DIV 86400000 AS d")
          .groupBy("event_type", "d").agg(count(lit(1)).as("y"))
        val wt = Window.partitionBy("event_type")
        val wd = wt.orderBy("d")
        val dev = daily
          .withColumn("n", count(lit(1)).over(wt))
          .withColumn("tot", sum("y").over(wt))
          .selectExpr("event_type", "d", "n", "n * y - tot AS dev")
        dev
          .withColumn("dev1", lead("dev", 1).over(wd))
          .withColumn("dev2", lead("dev", 2).over(wd))
          .withColumn("dev3", lead("dev", 3).over(wd))
          .groupBy("event_type")
          .agg(max("n").cast("bigint").as("n_days"),
            sum(expr("dev * dev")).cast("bigint").as("den"),
            sum(expr("dev * dev1")).cast("bigint").as("num1"),
            sum(expr("dev * dev2")).cast("bigint").as("num2"),
            sum(expr("dev * dev3")).cast("bigint").as("num3"))
          .selectExpr("event_type", "n_days",
            s"${signDiv("num1 * 1000", "den")} AS acf1_milli",
            s"${signDiv("num2 * 1000", "den")} AS acf2_milli",
            s"${signDiv("num3 * 1000", "den")} AS acf3_milli")
          .orderBy("event_type")
      },
      Some(s"""
        WITH daily AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS d, count(*) AS y
          FROM events GROUP BY 1, 2),
        dev AS (
          SELECT event_type, d,
                 CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
                 CAST(count(*) OVER (PARTITION BY event_type) * y
                      - sum(y) OVER (PARTITION BY event_type) AS BIGINT) AS dev
          FROM daily),
        l AS (
          SELECT event_type, n, dev,
                 lead(dev, 1) OVER (PARTITION BY event_type ORDER BY d) AS dev1,
                 lead(dev, 2) OVER (PARTITION BY event_type ORDER BY d) AS dev2,
                 lead(dev, 3) OVER (PARTITION BY event_type ORDER BY d) AS dev3
          FROM dev),
        a AS (
          SELECT event_type, CAST(max(n) AS BIGINT) AS n_days,
                 CAST(sum(dev * dev) AS BIGINT) AS den,
                 CAST(sum(dev * dev1) AS BIGINT) AS num1,
                 CAST(sum(dev * dev2) AS BIGINT) AS num2,
                 CAST(sum(dev * dev3) AS BIGINT) AS num3
          FROM l GROUP BY 1)
        SELECT event_type, n_days,
               ${signDivSql("num1 * 1000", "den")} AS acf1_milli,
               ${signDivSql("num2 * 1000", "den")} AS acf2_milli,
               ${signDivSql("num3 * 1000", "den")} AS acf3_milli
        FROM a ORDER BY event_type""")),

    // --------------------------------------------------------------- q192
    QDef("q192_fertility",
      (s, dir) => {
        t(s, dir, "documents")
          .withColumn("w", words(col("text")))
          .selectExpr("lang", "length(text) AS chars", "size(w) AS nw",
            "(length(text) + 3) DIV 4 AS est")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum("chars").cast("bigint").as("n_chars"),
            sum("nw").cast("bigint").as("n_words"),
            sum("est").cast("bigint").as("n_subwords"))
          .selectExpr("lang", "n_docs", "n_chars", "n_words", "n_subwords",
            "CASE WHEN n_words > 0 THEN n_subwords * 10000 DIV n_words END AS fertility_bp",
            "CASE WHEN n_words > 0 THEN n_chars * 10000 DIV n_words END AS chars_per_word_bp")
          .orderBy("lang")
      },
      Some(s"""
        WITH d AS (
          SELECT lang, length(text) AS chars,
                 len(${wordsSql("text")}) AS nw,
                 (length(text) + 3) // 4 AS est
          FROM documents),
        a AS (
          SELECT lang, count(*) AS n_docs,
                 CAST(sum(chars) AS BIGINT) AS n_chars,
                 CAST(sum(nw) AS BIGINT) AS n_words,
                 CAST(sum(est) AS BIGINT) AS n_subwords
          FROM d GROUP BY 1)
        SELECT lang, n_docs, n_chars, n_words, n_subwords,
               CASE WHEN n_words > 0 THEN n_subwords * 10000 // n_words END AS fertility_bp,
               CASE WHEN n_words > 0 THEN n_chars * 10000 // n_words END AS chars_per_word_bp
        FROM a ORDER BY lang""")),

    // --------------------------------------------------------------- q193
    QDef("q193_drawdown",
      (s, dir) => {
        val daily = t(s, dir, "orders")
          .selectExpr("o_orderpriority AS prio",
            "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS d",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
          .groupBy("prio", "d").agg(sum("cents").cast("bigint").as("rev"))
        val wd = Window.partitionBy("prio").orderBy("d")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val curve = daily
          .withColumn("cum", sum("rev").over(wd))
          .withColumn("peak", max(col("cum")).over(wd))
          .withColumn("dd", col("peak") - col("cum"))
          .withColumn("mdd", max("dd").over(Window.partitionBy("prio")))
        curve.groupBy("prio")
          .agg(count(lit(1)).as("n_days"),
            max("cum").cast("bigint").as("final_cents"),
            max("peak").cast("bigint").as("peak_cents"),
            max("dd").cast("bigint").as("max_drawdown_cents"),
            min(when(col("dd") === col("mdd"), col("d")))
              .cast("bigint").as("trough_day"))
          .orderBy("prio")
      },
      Some("""
        WITH daily AS (
          SELECT o_orderpriority AS prio, epoch_ms(o_orderdate) // 86400000 AS d,
                 CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
          FROM orders GROUP BY 1, 2),
        cumc AS (
          SELECT prio, d,
                 CAST(sum(rev) OVER (PARTITION BY prio ORDER BY d
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
          FROM daily),
        curve AS (
          SELECT prio, d, cum,
                 CAST(max(cum) OVER (PARTITION BY prio ORDER BY d
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS peak
          FROM cumc),
        dd AS (
          SELECT prio, d, cum, peak, peak - cum AS dd,
                 max(peak - cum) OVER (PARTITION BY prio) AS mdd
          FROM curve)
        SELECT prio, count(*) AS n_days,
               CAST(max(cum) AS BIGINT) AS final_cents,
               CAST(max(peak) AS BIGINT) AS peak_cents,
               CAST(max(dd) AS BIGINT) AS max_drawdown_cents,
               CAST(min(CASE WHEN dd = mdd THEN d END) AS BIGINT) AS trough_day
        FROM dd GROUP BY 1 ORDER BY prio"""))
  )
}
