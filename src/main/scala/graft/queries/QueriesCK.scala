package graft.queries

import graft.Tables.t
import graft.functions.TextFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 82 — attribution models, bitmap
  * indexes, dictionary encoding, time-weighted aggregation:
  *
  *  - q351: three-model marketing attribution — for each purchase, the
  *    prior 72 h of same-user touches credited under FIRST-touch,
  *    LAST-touch, and LINEAR models in one pass; linear credit is
  *    integer micro with the remainder pinned to the earliest touch so
  *    every conversion distributes exactly 1e6 (q137 is last-touch
  *    only; this is the model comparison).
  *  - q352: bitmap-index retention — daily active users packed into
  *    32-bit words (word = uid mod 2048 ÷ 32, bit = uid mod 32) with
  *    bit_or aggregation; day-over-day retained users via bit_count of
  *    word-wise AND. Set intersection without shuffling raw IDs — the
  *    roaring-bitmap shape at 100 TB.
  *  - q353: dictionary-encoding economics — global frequency-ranked
  *    word dictionary, docs re-encoded as varint ids (1/2/3 bytes by
  *    rank): bytes before/after per source; the string-column
  *    compression model beside q324's timestamp deltas.
  *  - q354: TWAP — TIME-weighted average value per event type (value
  *    held until the next observation), exact value·duration products;
  *    the irregular-sampling mean that event-weighted averaging (q01
  *    family) gets wrong.
  *
  * Reference analog: which discovery channel produced a booking;
  * fleet-wide daily user overlap at scale; review-text storage
  * planning; sensor-style monitoring means over sparse scrapes.
  */
object QueriesCK extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q351
    QDef("q351_attribution_models",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .selectExpr("user_id", "event_id", "event_type", s"($tsMs) AS ms")
        val conv = ev.where(col("event_type") === "purchase")
          .selectExpr("user_id AS cu", "event_id AS conv_id", "ms AS cms")
        val touches = ev.where(col("event_type") =!= "purchase")
        val joined = touches.join(conv, col("user_id") === col("cu"))
          .where(col("ms") < col("cms") &&
            col("ms") >= col("cms") - lit(72L * 3600000))
        val w = Window.partitionBy("conv_id").orderBy("ms", "event_id")
        val wN = Window.partitionBy("conv_id")
        joined
          .withColumn("pos", row_number().over(w).cast("long"))
          .withColumn("n", count(lit(1)).over(wN))
          .selectExpr("event_type", "pos", "n",
            "CASE WHEN pos = 1 THEN 1L ELSE 0L END AS ft",
            "CASE WHEN pos = n THEN 1L ELSE 0L END AS lt",
            "1000000 DIV n + (CASE WHEN pos = 1 THEN 1000000 % n ELSE 0L END) AS lin")
          .groupBy("event_type")
          .agg(sum("ft").cast("bigint").as("first_touch"),
            sum("lt").cast("bigint").as("last_touch"),
            sum("lin").cast("bigint").as("linear_micro"))
          .orderBy("event_type")
      },
      Some("""
        WITH ev AS (
          SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms
          FROM events),
        conv AS (
          SELECT user_id AS cu, event_id AS conv_id, ms AS cms
          FROM ev WHERE event_type = 'purchase'),
        j AS (
          SELECT t.event_type, c.conv_id, t.ms, t.event_id
          FROM ev t JOIN conv c ON t.user_id = c.cu
          WHERE t.event_type <> 'purchase'
            AND t.ms < c.cms AND t.ms >= c.cms - 72 * 3600000),
        pos AS (
          SELECT event_type,
                 CAST(row_number() OVER (PARTITION BY conv_id
                   ORDER BY ms, event_id) AS BIGINT) AS pos,
                 count(*) OVER (PARTITION BY conv_id) AS n
          FROM j)
        SELECT event_type,
               CAST(sum(CASE WHEN pos = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS first_touch,
               CAST(sum(CASE WHEN pos = n THEN 1 ELSE 0 END) AS BIGINT)
                 AS last_touch,
               CAST(sum(1000000 // n
                 + (CASE WHEN pos = 1 THEN 1000000 % n ELSE 0 END)) AS BIGINT)
                 AS linear_micro
        FROM pos GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q352
    QDef("q352_bitmap_retention",
      (s, dir) => {
        val bm = t(s, dir, "events")
          .selectExpr(s"($tsMs) DIV 86400000 AS d",
            "(user_id % 2048) DIV 32 AS word_idx",
            "CAST(user_id % 32 AS INT) AS bit")
          .distinct()
          .groupBy("d", "word_idx")
          .agg(expr("bit_or(shiftleft(1L, bit))").as("word"))
        val nxt = bm.selectExpr("d - 1 AS d", "word_idx", "word AS word_next")
        val dau = bm.groupBy("d")
          .agg(expr("CAST(sum(bit_count(word)) AS BIGINT)").as("dau"))
        val ret = bm.join(nxt, Seq("d", "word_idx"))
          .groupBy("d")
          .agg(expr("CAST(sum(bit_count(word & word_next)) AS BIGINT)")
            .as("retained"))
        dau.join(ret, Seq("d"), "left").na.fill(0L, Seq("retained"))
          .selectExpr("d", "dau", "retained",
            "retained * 10000 DIV dau AS retention_bp")
          .orderBy("d").limit(30)
      },
      Some("""
        WITH b AS (
          SELECT DISTINCT epoch_ms(ts) // 86400000 AS d,
                 (user_id % 2048) // 32 AS word_idx,
                 CAST(user_id % 32 AS INT) AS bit
          FROM events),
        bm AS (
          SELECT d, word_idx,
                 bit_or(CAST(1 AS BIGINT) << bit) AS word
          FROM b GROUP BY 1, 2),
        dau AS (
          SELECT d, CAST(sum(bit_count(word)) AS BIGINT) AS dau
          FROM bm GROUP BY 1),
        ret AS (
          SELECT a.d, CAST(sum(bit_count(a.word & n.word)) AS BIGINT)
                   AS retained
          FROM bm a JOIN bm n ON n.d = a.d + 1 AND n.word_idx = a.word_idx
          GROUP BY 1)
        SELECT d, dau, coalesce(retained, 0) AS retained,
               coalesce(retained, 0) * 10000 // dau AS retention_bp
        FROM dau LEFT JOIN ret USING (d)
        ORDER BY d LIMIT 30""")),

    // --------------------------------------------------------------- q353
    QDef("q353_dict_encoding",
      (s, dir) => {
        val toks = t(s, dir, "documents")
          // single-file scan = ONE partition; fan out before tokenize
          .repartition(col("doc_id"))
          .withColumn("w", TextFunctions.words(col("text")))
          .select(col("source"), explode(col("w")).as("word"))
        val dict = toks.groupBy("word").agg(count(lit(1)).as("f"))
        // dual-path rank (r11): the dictionary is vocabulary-bounded, so
        // collect it (capped), rank driver-side (ties broken in UTF-8
        // BINARY order — Java String order diverges around surrogates)
        // and broadcast the word→varint map into a map-side join + one
        // tiny source rollup. Above the cap the ScaleRank global-rank
        // machinery below is the web-vocabulary scale path.
        val CAP = 2000000
        val dictRows = dict.limit(CAP + 1).collect()
        val ranked: org.apache.spark.sql.DataFrame =
          if (dictRows.length <= CAP) {
            val sc2 = s
            import sc2.implicits._
            import org.apache.spark.unsafe.types.UTF8String
            broadcast(dictRows
              .map(r => (r.getString(0), r.getLong(1)))
              .sortWith { case ((wa, fa), (wb, fb)) =>
                fa > fb || (fa == fb && UTF8String.fromString(wa)
                  .compareTo(UTF8String.fromString(wb)) < 0)
              }
              .zipWithIndex.map { case ((wd, _), idx) =>
                val rank = idx + 1L
                (wd, if (rank <= 128) 1L else if (rank <= 16384) 2L else 3L)
              }.toSeq.toDF("word", "varint_bytes"))
          } else {
            graft.operators.ScaleRank.withGlobalRowNumber(
                dict, Seq(col("f").desc, col("word")), "rank")
              .selectExpr("word",
                "CASE WHEN rank <= 128 THEN 1L WHEN rank <= 16384 THEN 2L ELSE 3L END AS varint_bytes")
          }
        toks.join(ranked, "word")
          .groupBy("source")
          .agg(count(lit(1)).as("n_tokens"),
            expr("CAST(sum(length(word) + 1) AS BIGINT)").as("raw_bytes"),
            sum("varint_bytes").cast("bigint").as("encoded_bytes"))
          .selectExpr("source", "n_tokens", "raw_bytes", "encoded_bytes",
            "encoded_bytes * 10000 DIV raw_bytes AS ratio_bp")
          .orderBy("source")
      },
      Some(s"""
        WITH toks AS (
          SELECT source, unnest(${TextFunctions.wordsSql("text")}) AS word
          FROM documents),
        dict AS (
          SELECT word, count(*) AS f FROM toks GROUP BY 1),
        ranked AS (
          SELECT word,
                 CASE WHEN rank <= 128 THEN 1
                      WHEN rank <= 16384 THEN 2 ELSE 3 END AS varint_bytes
          FROM (SELECT word,
                  CAST(row_number() OVER (ORDER BY f DESC, word) AS BIGINT)
                    AS rank
                FROM dict))
        SELECT source, count(*) AS n_tokens,
               CAST(sum(length(word) + 1) AS BIGINT) AS raw_bytes,
               CAST(sum(varint_bytes) AS BIGINT) AS encoded_bytes,
               CAST(sum(varint_bytes) AS BIGINT) * 10000
                 // CAST(sum(length(word) + 1) AS BIGINT) AS ratio_bp
        FROM toks JOIN ranked USING (word)
        GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q354
    QDef("q354_twap",
      (s, dir) => {
        val w = Window.partitionBy("event_type").orderBy("ms", "event_id")
        t(s, dir, "events")
          .where(col("value").isNotNull)
          .selectExpr("event_type", "event_id", s"($tsMs) AS ms",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc")
          .withColumn("dur", lead("ms", 1).over(w) - col("ms"))
          .where(col("dur").isNotNull)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_holds"),
            expr("CAST(sum(vc * dur) AS BIGINT)").as("vdur"),
            sum("dur").cast("bigint").as("total_ms"),
            sum("vc").cast("bigint").as("sum_vc"))
          .selectExpr("event_type", "n_holds",
            """CAST(floor(CAST(vdur AS DOUBLE) / CAST(total_ms AS DOUBLE)
               * 10000) AS BIGINT) AS twap_hcents""",
            """CAST(floor(CAST(sum_vc AS DOUBLE) / CAST(n_holds AS DOUBLE)
               * 10000) AS BIGINT) AS event_mean_hcents""")
          .orderBy("event_type")
      },
      Some("""
        WITH e AS (
          SELECT event_type, event_id, epoch_ms(ts) AS ms,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
          FROM events WHERE value IS NOT NULL),
        held AS (
          SELECT event_type, vc,
                 lead(ms, 1) OVER (PARTITION BY event_type
                   ORDER BY ms, event_id) - ms AS dur
          FROM e)
        SELECT event_type, count(*) AS n_holds,
               CAST(floor(CAST(sum(vc * dur) AS DOUBLE)
                 / CAST(sum(dur) AS DOUBLE) * 10000) AS BIGINT) AS twap_hcents,
               CAST(floor(CAST(sum(vc) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) * 10000) AS BIGINT)
                 AS event_mean_hcents
        FROM held WHERE dur IS NOT NULL
        GROUP BY 1 ORDER BY 1"""))
  )
}
