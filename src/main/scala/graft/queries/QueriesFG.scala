package graft.queries

import graft.Tables.t
import graft.functions.TextFunctions
import graft.multimodal.MediaPipeline
import graft.operators.Relational
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

/** §2F multimodal-column pipeline. The Spark side REALLY runs the typed
  * mapPartitions batch-decode plumbing (MediaPipeline); only the codec is
  * a deterministic stub, so the DuckDB oracle can mirror it in SQL. */
object QueriesF extends QueryPack {
  def defs: Seq[QDef] = Seq(
    // ---------------------------------------------------------------- q60
    QDef("q60_multimodal_meta",
      (s, dir) => {
        val rows = t(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("text").cast("binary").as("media"))
          .as(Encoders.product[MediaPipeline.MediaRow])
        MediaPipeline.extractFeatures(rows).toDF()
          .orderBy("doc_id")
      },
      Some(s"""
        SELECT doc_id, source,
               CAST(octet_length(CAST(text AS BLOB)) AS INT) AS byte_len,
               hex(CAST(substr(text, 1, 4) AS BLOB)) AS magic_hex,
               CAST(16 + (doc_id * 37) % 1008 AS INT) AS width,
               CAST(16 + (doc_id * 53) % 752 AS INT) AS height,
               CAST(1 + doc_id % 24 AS INT) AS n_frames,
               ${TextFunctions.rollingFingerprintSql("text")} AS checksum
        FROM documents
        WHERE text IS NOT NULL
        ORDER BY doc_id""")),

    // ---------------------------------------------------------------- q63
    // Feature extraction through the REAL mapPartitions batch path: each
    // payload → 16-bin byte histogram (the deterministic stand-in for an
    // embedding/classifier head), aggregated per source. The oracle
    // recomputes the same bins from the ASCII codepoints in SQL.
    QDef("q63_feature_extract",
      (s, dir) => {
        val rows = t(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("text").cast("binary").as("media"))
          .as(Encoders.product[MediaPipeline.MediaRow])
        MediaPipeline.byteHistogram(rows, nBins = 16).toDF()
          .select(col("source"), posexplode(col("bins")).as(Seq("bin", "cnt")))
          .groupBy("source", "bin")
          .agg(sum("cnt").cast("bigint").as("n_bytes"))
          .filter(col("n_bytes") > 0)
          .orderBy("source", "bin")
      },
      Some("""
        WITH chars AS (
          SELECT source,
                 unnest(list_transform(range(1, length(text) + 1),
                   i -> ascii(substr(text, i, 1)) % 16)) AS bin
          FROM documents WHERE text IS NOT NULL)
        SELECT source, CAST(bin AS INT) AS bin, count(*) AS n_bytes
        FROM chars GROUP BY 1, 2
        ORDER BY source, bin"""))
  )
}

/** §2G streaming — q70 is the deterministic batch equivalent of
  * streaming.StreamOps.sessionize (same gap rule, same aggregates); the
  * true streaming path is exercised by StreamOpsSpec over MemoryStream. */
object QueriesG extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(
    // ---------------------------------------------------------------- q70
    QDef("q70_stream_sessions",
      (s, dir) => {
        Relational.sessionize(
            t(s, dir, "events").withColumn("ts_ms", expr(tsMs)),
            col("user_id"), col("ts_ms"), col("event_id"), gapMs = 1800 * 1000L)
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_ev"),
            (max(col("ts_ms")) - min(col("ts_ms"))).as("dur_ms"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_sessions"),
            sum(col("n_ev")).cast("bigint").as("n_events"),
            max(col("dur_ms")).as("max_dur_ms"),
            expr("sum(n_ev) * 10000 DIV count(1)").as("ev_per_sess_bp"))
          .orderBy("user_id")
      },
      Some("""
        WITH flagged AS (
          SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
            CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
                   OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
                 THEN 1 ELSE 0 END AS new_sess
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)),
        sess AS (
          SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM flagged),
        per_sess AS (
          SELECT user_id, session_id, count(*) AS n_ev,
                 max(ts_ms) - min(ts_ms) AS dur_ms
          FROM sess GROUP BY user_id, session_id)
        SELECT user_id, count(*) AS n_sessions,
               CAST(sum(n_ev) AS BIGINT) AS n_events,
               max(dur_ms) AS max_dur_ms,
               CAST(sum(n_ev) * 10000 // count(*) AS BIGINT) AS ev_per_sess_bp
        FROM per_sess
        GROUP BY user_id
        ORDER BY user_id""")),

    // ---------------------------------------------------------------- q71
    // Deterministic batch equivalent of streaming.StreamOps.windowedCounts
    // (tumbling 1h event-time windows + per-window distinct actors): the
    // true watermark/streaming path runs in StreamOpsSpec over
    // MemoryStream; this proves the window aggregates themselves against
    // the oracle. Integer window arithmetic — exact in both engines.
    QDef("q71_stream_windowed",
      (s, dir) => {
        t(s, dir, "events").withColumn("ts_ms", expr(tsMs))
          .withColumn("w_start", expr("ts_ms DIV 3600000 * 3600000"))
          .groupBy("event_type", "w_start")
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("users"))
          .orderBy("event_type", "w_start")
      },
      Some("""
        SELECT event_type, epoch_ms(ts) // 3600000 * 3600000 AS w_start,
               count(*) AS n, count(DISTINCT user_id) AS users
        FROM events
        GROUP BY 1, 2
        ORDER BY event_type, w_start""")),
  )
}
