package graft.queries

import graft.Tables.t
import graft.functions.PortableHash
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 7:
  *
  *  - q13b: time-RANGE window frames (RANGE BETWEEN n PRECEDING) — a
  *    distinct physical operator from q13's ROWS frames: the frame is
  *    defined by the ORDER-BY value, not the row count, so irregular
  *    event spacing gets a true sliding-hour aggregate.
  *  - q97: Bloom-filter join pruning — the runtime-filter pattern for
  *    100 TB joins: build a tiny deterministic bitmap over the dim-side
  *    keys, pre-filter the fact scan with bit tests, and only the
  *    survivors reach the real join. The whole filter is 17 BIGINT words
  *    (broadcast); false-positive accounting is part of the output.
  */
object QueriesN extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(
    // --------------------------------------------------------------- q13b
    QDef("q13b_range_window",
      (s, dir) => {
        val hourMs = 3600000L
        val ev = t(s, dir, "events")
          .filter(col("user_id") < 50)
          .selectExpr("user_id", s"$tsMs AS ts_ms", "value")
          .withColumn("v", dec(col("value")))
        val w = Window.partitionBy("user_id").orderBy("ts_ms")
          .rangeBetween(-hourMs, 0)
        ev.withColumn("win_sum", sum(col("v")).over(w))
          .withColumn("win_n", count(lit(1)).over(w))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            max(col("win_n")).cast("bigint").as("max_win_n"),
            dec38(max(col("win_sum"))).as("max_win_sum"))
          .orderBy("user_id")
      },
      Some(s"""
        WITH ev AS (
          SELECT user_id, epoch_ms(ts) AS ts_ms, CAST(value AS $decSql) AS v
          FROM events WHERE user_id < 50),
        win AS (
          SELECT user_id,
                 sum(v) OVER (PARTITION BY user_id ORDER BY ts_ms
                   RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) AS win_sum,
                 count(*) OVER (PARTITION BY user_id ORDER BY ts_ms
                   RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) AS win_n
          FROM ev)
        SELECT user_id, count(*) AS n_events,
               CAST(max(win_n) AS BIGINT) AS max_win_n,
               CAST(max(win_sum) AS $dec38Sql) AS max_win_sum
        FROM win
        GROUP BY user_id
        ORDER BY user_id""")),

    // ---------------------------------------------------------------- q97
    // Bloom filter: k=3 md5-derived bit positions in 17 words × 63 bits
    // (sign bit unused — DuckDB BIGINT << stays in range). Build side:
    // BUILDING-segment customers; probe side: every order tests its 3
    // bits against the broadcast bitmap. Exact semi-join alongside gives
    // the false-positive accounting — Bloom never misses (spec'd).
    QDef("q97_bloom_prune",
      (s, dir) => {
        def pos(r: Int, keyCol: String) =
          pmod(PortableHash.md5Long(col(keyCol).cast("string"), salt = s"bloom$r~"),
            lit(1071L)) // 17 words * 63 bits
        val dim = t(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey")).cache()
        dim.count() // eager: bitmap build + exact semi-join share the job
        val words = (0 until 3).map(r => dim.select(pos(r, "c_custkey").as("p")))
          .reduce(_ unionByName _)
          .select(expr("p DIV 63").as("word"),
            expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 63 AS INT))").as("m"))
          .groupBy("word").agg(expr("bit_or(m)").as("bits"))
        val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        // probe: one broadcast hash join per hash row, all-bits-set test
        val probed = (0 until 3).foldLeft(o) { (df, r) =>
          df.withColumn(s"p$r", pos(r, "o_custkey"))
            .withColumn(s"w$r", expr(s"p$r DIV 63"))
            .join(broadcast(words.select(col("word").as(s"w$r"), col("bits").as(s"b$r"))),
              Seq(s"w$r"), "left_outer")
            .withColumn(s"hit$r",
              coalesce(expr(s"(b$r & (CAST(1 AS BIGINT) << CAST(p$r % 63 AS INT))) != 0"),
                lit(false)))
        }
        val flagged = probed.withColumn("bloom_pass",
            col("hit0") && col("hit1") && col("hit2"))
          .join(dim.select(col("c_custkey").as("o_custkey")).withColumn("true_match", lit(true)),
            Seq("o_custkey"), "left_outer")
          .withColumn("true_match", coalesce(col("true_match"), lit(false)))
        flagged.agg(
            count(lit(1)).as("n_orders"),
            sum(when(col("bloom_pass"), 1L).otherwise(0L)).cast("bigint").as("n_pass"),
            sum(when(col("true_match"), 1L).otherwise(0L)).cast("bigint").as("n_true"),
            sum(when(col("bloom_pass") && !col("true_match"), 1L).otherwise(0L)).cast("bigint")
              .as("n_false_pos"),
            sum(when(!col("bloom_pass") && col("true_match"), 1L).otherwise(0L)).cast("bigint")
              .as("n_missed"))
          .withColumn("fp_bp", expr("n_false_pos * 10000 DIV (n_orders - n_true)"))
      },
      Some {
        def pSql(r: Int, key: String) =
          s"${PortableHash.md5LongSql(s"CAST($key AS VARCHAR)", salt = s"bloom$r~")} % 1071"
        val posSelects = (0 until 3).map(r => s"SELECT ${pSql(r, "c_custkey")} AS p FROM dim")
          .mkString(" UNION ALL ")
        s"""
        WITH dim AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        pos AS ($posSelects),
        words AS (
          SELECT p // 63 AS word, bit_or(CAST(1 AS BIGINT) << CAST(p % 63 AS INT)) AS bits
          FROM pos GROUP BY 1),
        probed AS (
          SELECT o.o_orderkey, o.o_custkey,
                 coalesce((w0.bits & (CAST(1 AS BIGINT) << CAST(${pSql(0, "o.o_custkey")} % 63 AS INT))) != 0, false) AS hit0,
                 coalesce((w1.bits & (CAST(1 AS BIGINT) << CAST(${pSql(1, "o.o_custkey")} % 63 AS INT))) != 0, false) AS hit1,
                 coalesce((w2.bits & (CAST(1 AS BIGINT) << CAST(${pSql(2, "o.o_custkey")} % 63 AS INT))) != 0, false) AS hit2
          FROM orders o
          LEFT JOIN words w0 ON ${pSql(0, "o.o_custkey")} // 63 = w0.word
          LEFT JOIN words w1 ON ${pSql(1, "o.o_custkey")} // 63 = w1.word
          LEFT JOIN words w2 ON ${pSql(2, "o.o_custkey")} // 63 = w2.word),
        flagged AS (
          SELECT p.*, (hit0 AND hit1 AND hit2) AS bloom_pass,
                 (d.c_custkey IS NOT NULL) AS true_match
          FROM probed p LEFT JOIN dim d ON p.o_custkey = d.c_custkey)
        SELECT count(*) AS n_orders,
               CAST(count(CASE WHEN bloom_pass THEN 1 END) AS BIGINT) AS n_pass,
               CAST(count(CASE WHEN true_match THEN 1 END) AS BIGINT) AS n_true,
               CAST(count(CASE WHEN bloom_pass AND NOT true_match THEN 1 END) AS BIGINT) AS n_false_pos,
               CAST(count(CASE WHEN NOT bloom_pass AND true_match THEN 1 END) AS BIGINT) AS n_missed,
               CAST(count(CASE WHEN bloom_pass AND NOT true_match THEN 1 END) * 10000
                 // (count(*) - count(CASE WHEN true_match THEN 1 END)) AS BIGINT) AS fp_bp
        FROM flagged"""
      })
  )
}
