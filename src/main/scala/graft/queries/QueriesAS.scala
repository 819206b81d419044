package graft.queries

import graft.Tables.t
import graft.functions.TextFunctions.{words, wordsSql}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 38 — smoothing + series-shape ops:
  *
  *  - q179: EWMA control chart — per-user exponentially weighted moving
  *    average of event cents with DYADIC alpha = 1/4: s_t = (3·s_{t-1} +
  *    v_t) DIV 4. All values non-negative, so floor division is identical
  *    in both engines and the whole recurrence is exact BIGINT. A spike
  *    is v_t > 2·s_{t-1} (checked before the update). Like q124 this is
  *    a non-linear recurrence no window frame expresses: Spark runs the
  *    secondary-sort mapPartitions scale path (hash-repartition by user,
  *    sortWithinPartitions, one streaming pass, O(1) state); the DuckDB
  *    oracle is an independent recursive CTE.
  *  - q180: SAX-lite symbolic series — each event_type's daily-count
  *    series quantized to quartile letters a–d by EXACT rank (`(rn-1)·4
  *    DIV m`, no z-normalization FP), concatenated in day order into a
  *    shape signature. The symbolic-aggregate-approximation step used to
  *    cluster/compare time series cheaply.
  *  - q181: Zipf rank-frequency slope — token frequencies ranked desc;
  *    both coordinates mapped to integer log2 via `length(bin(x)) - 1`
  *    (pure string-of-bits length — zero FP), then the OLS slope over
  *    (log2 rank, log2 tf) from exact BIGINT component sums in
  *    sign-normalized micro units. Zipf's law predicts ≈ −1e6; a corpus
  *    far off that is machine-generated or truncated — a corpus-health
  *    gate beside q54's vocabulary.
  *
  * Reference analog: EWMA = response-latency smoothing/alerting on the
  * UBDCTask stream; SAX = harvest-volume shape comparison across types;
  * Zipf = review-corpus naturalness audit.
  */
object QueriesAS extends QueryPack {
  import Q._

  // NOT private: Spark's generated (de)serializer code must access these.
  case class EwmaEv(user_id: Long, ts_ms: Long, event_id: Long, vc: Long)
  case class EwmaOut(user_id: Long, n_events: Long, ewma_cents: Long, n_spikes: Long)

  def defs: Seq[QDef] = Seq(

    QDef("q179_ewma",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events")
          .where(col("value").isNotNull)
          .selectExpr("user_id", s"$tsMs AS ts_ms", "event_id",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc")
          .as[EwmaEv]
        ev.repartition(col("user_id"))
          .sortWithinPartitions("user_id", "ts_ms", "event_id")
          .mapPartitions { it =>
            new Iterator[EwmaOut] {
              private var pending: Option[EwmaOut] = None
              private var cur = -1L
              private var sm = 0L
              private var n = 0L
              private var spikes = 0L
              private def roll(): Unit = {
                while (pending.isEmpty && it.hasNext) {
                  val e = it.next()
                  if (e.user_id != cur) {
                    if (cur != -1L) pending = Some(EwmaOut(cur, n, sm, spikes))
                    cur = e.user_id; sm = 0L; n = 0L; spikes = 0L
                  }
                  if (n == 0L) sm = e.vc
                  else {
                    if (e.vc > 2L * sm) spikes += 1L
                    sm = (3L * sm + e.vc) / 4L
                  }
                  n += 1L
                }
                if (pending.isEmpty && cur != -1L) {
                  pending = Some(EwmaOut(cur, n, sm, spikes)); cur = -1L
                }
              }
              def hasNext: Boolean = { roll(); pending.isDefined }
              def next(): EwmaOut = { roll(); val r = pending.get; pending = None; r }
            }
          }
          .toDF()
          .orderBy("user_id")
      },
      Some("""
        WITH RECURSIVE r AS (
          SELECT user_id,
                 row_number() OVER (PARTITION BY user_id
                   ORDER BY epoch_ms(ts), event_id) AS rn,
                 count(*) OVER (PARTITION BY user_id) AS cnt,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
          FROM events WHERE value IS NOT NULL),
        b AS (
          SELECT user_id, rn, cnt, vc AS sm, CAST(0 AS BIGINT) AS spikes
          FROM r WHERE rn = 1
          UNION ALL
          SELECT r.user_id, r.rn, r.cnt,
                 (3 * b.sm + r.vc) // 4,
                 b.spikes + CASE WHEN r.vc > 2 * b.sm THEN 1 ELSE 0 END
          FROM b JOIN r ON r.user_id = b.user_id AND r.rn = b.rn + 1)
        SELECT user_id, CAST(cnt AS BIGINT) AS n_events, sm AS ewma_cents,
               spikes AS n_spikes
        FROM b WHERE rn = cnt ORDER BY user_id""")),

    QDef("q180_sax",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .selectExpr("event_type", s"($tsMs) DIV 86400000 AS d")
          .groupBy("event_type", "d").agg(count(lit(1)).as("y"))
        daily
          .withColumn("rn", row_number().over(
            Window.partitionBy("event_type").orderBy("y", "d")))
          .withColumn("m", count(lit(1)).over(Window.partitionBy("event_type")))
          .selectExpr("event_type", "d",
            "substring('abcd', CAST((rn - 1) * 4 DIV m AS INT) + 1, 1) AS letter")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_days"),
            expr("array_join(transform(array_sort(collect_list(struct(d, letter))), x -> x.letter), '')")
              .as("sax"))
          .orderBy("event_type")
      },
      Some("""
        WITH daily AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS d, count(*) AS y
          FROM events GROUP BY 1, 2),
        r AS (
          SELECT event_type, d,
                 row_number() OVER (PARTITION BY event_type ORDER BY y, d) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS m
          FROM daily),
        l AS (
          SELECT event_type, d,
                 substring('abcd', CAST((rn - 1) * 4 // m AS INT) + 1, 1) AS letter
          FROM r)
        SELECT event_type, count(*) AS n_days,
               string_agg(letter, '' ORDER BY d) AS sax
        FROM l GROUP BY 1 ORDER BY event_type""")),

    QDef("q181_zipf",
      (s, dir) => {
        val tf = t(s, dir, "documents")
          .select(explode(words(col("text"))).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("tf"))
        graft.operators.ScaleRank.withGlobalRowNumber(tf,
            Seq(col("tf").desc, col("tok")), "rn")
          .selectExpr("CAST(length(bin(rn)) - 1 AS BIGINT) AS x",
            "CAST(length(bin(tf)) - 1 AS BIGINT) AS y")
          .agg(count(lit(1)).as("n"),
            sum("x").cast("bigint").as("sx"), sum("y").cast("bigint").as("sy"),
            sum(expr("x * x")).cast("bigint").as("sxx"),
            sum(expr("x * y")).cast("bigint").as("sxy"))
          .selectExpr("n", "n * sxy - sx * sy AS num", "n * sxx - sx * sx AS den")
          .selectExpr("n AS n_tokens",
            """CASE WHEN den = 0 THEN NULL
               ELSE (CASE WHEN num * den >= 0 THEN 1 ELSE -1 END)
                 * (abs(num) * 1000000 DIV abs(den)) END AS zipf_slope_micro""")
      },
      Some(s"""
        WITH toks AS (SELECT unnest(${wordsSql("text")}) AS tok FROM documents),
        tf AS (SELECT tok, count(*) AS tf FROM toks GROUP BY 1),
        r AS (
          SELECT CAST(length(bin(row_number() OVER (ORDER BY tf DESC, tok))) - 1
                   AS BIGINT) AS x,
                 CAST(length(bin(tf)) - 1 AS BIGINT) AS y
          FROM tf),
        c AS (
          SELECT count(*) AS n,
                 CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(x * y) AS BIGINT) AS sxy
          FROM r),
        nd AS (SELECT n, n * sxy - sx * sy AS num, n * sxx - sx * sx AS den FROM c)
        SELECT CAST(n AS BIGINT) AS n_tokens,
               CASE WHEN den = 0 THEN NULL
                 ELSE (CASE WHEN num * den >= 0 THEN 1 ELSE -1 END)
                   * (abs(num) * 1000000 // abs(den)) END AS zipf_slope_micro
        FROM nd"""))
  )
}
