package graft.queries

import graft.Tables.t
import graft.functions.TextFunctions
import graft.multimodal.MediaPipeline
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-4 coverage additions, part 3:
  *
  *  - §2F multimodal: frame-sampling fan-out through the REAL
  *    mapPartitions batch-decode path (q61) and aspect-preserving resize
  *    dimension math (q62) — §2F moves from one query to three.
  *  - §2D similarity: int8 scalar quantization of embeddings with exact
  *    reconstruction-error accounting (q46) — the compression step before
  *    a 100 TB ANN index ships.
  *  - §2G streaming: stream-stream interval join, batch-equivalent (q74)
  *    — click→purchase attribution within a horizon, implemented the
  *    scale way (bucket equi-join + exact refilter, no inequality-only
  *    join), mirroring StreamOps.intervalJoin.
  */
object QueriesJ extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(
    // ---------------------------------------------------------------- q61
    // Frame sampling through MediaPipeline.sampleFrames: 1 payload row in,
    // ceil(n_frames/5) frame rows out, decoder opened once per payload
    // inside a partition batch (the mapInPandas batching shape). The
    // oracle mirrors the stub codec arithmetically: rotation-slice
    // checksums over the ASCII payload.
    QDef("q61_frame_sample",
      (s, dir) => {
        val rows = t(s, dir, "documents")
          .filter(col("doc_id") < 40)
          .select(col("doc_id"), col("source"), col("text").cast("binary").as("media"))
          .as(Encoders.product[MediaPipeline.MediaRow])
        MediaPipeline.sampleFrames(rows, everyN = 5).toDF()
          .orderBy("doc_id", "frame_idx")
      },
      Some(s"""
        WITH base AS (
          SELECT doc_id, text,
                 CAST(16 + (doc_id * 37) % 1008 AS INT) AS width,
                 CAST(16 + (doc_id * 53) % 752 AS INT) AS height,
                 1 + doc_id % 24 AS n_frames
          FROM documents WHERE doc_id < 40 AND text IS NOT NULL),
        frames AS (
          SELECT doc_id, width, height, CAST(i AS INT) AS frame_idx,
                 CASE WHEN length(text) = 0 THEN ''
                      ELSE substr(text, (i % length(text)) + 1)
                           || substr(text, 1, i % length(text)) END AS rot
          FROM base, unnest(range(0, n_frames, 5)) AS tt(i))
        SELECT doc_id, frame_idx, width, height,
               ${TextFunctions.rollingFingerprintSql("rot")} AS frame_checksum
        FROM frames
        ORDER BY doc_id, frame_idx""")),

    // ---------------------------------------------------------------- q62
    // Resize-dimension planning (thumbnailing stage): aspect-preserving
    // fit into 256px, round-half-up, floor 1px — all integer math, exact
    // in both engines. Runs through MediaPipeline.resizeDims per row.
    QDef("q62_resize_dims",
      (s, dir) => {
        val s2 = s
        import s2.implicits._
        val feats = t(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("text").cast("binary").as("media"))
          .as(Encoders.product[MediaPipeline.MediaRow])
        MediaPipeline.extractFeatures(feats)
          .map { f =>
            val (w2, h2) = MediaPipeline.resizeDims(f.width, f.height, 256)
            (f.doc_id, f.width, f.height, w2, h2,
              w2 != f.width || h2 != f.height)
          }
          .toDF("doc_id", "width", "height", "w2", "h2", "resized")
          .orderBy("doc_id")
      },
      Some("""
        WITH dims AS (
          SELECT doc_id,
                 CAST(16 + (doc_id * 37) % 1008 AS INT) AS width,
                 CAST(16 + (doc_id * 53) % 752 AS INT) AS height
          FROM documents WHERE text IS NOT NULL),
        r AS (
          SELECT doc_id, width, height, greatest(width, height) AS ls
          FROM dims)
        SELECT doc_id, width, height,
               CAST(CASE WHEN ls <= 256 THEN width
                    ELSE greatest(1, (width * 256 + ls // 2) // ls) END AS INT) AS w2,
               CAST(CASE WHEN ls <= 256 THEN height
                    ELSE greatest(1, (height * 256 + ls // 2) // ls) END AS INT) AS h2,
               (ls > 256) AS resized
        FROM r
        ORDER BY doc_id""")),

    // ---------------------------------------------------------------- q46
    // Int8 scalar quantization of embeddings: per-vector scale 127/max|x|,
    // quantize-dequantize, exact per-label reconstruction-error rollup
    // (sequential fold per vector — same order both engines; decimal sum
    // across vectors — order-independent). At 100 TB: row-local math, one
    // tiny shuffle on label.
    QDef("q46_quantize_int8",
      (s, dir) => {
        val maxabs = expr(
          "aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> greatest(a, abs(CAST(x AS DOUBLE))))")
        val sse = expr(
          """aggregate(embedding, CAST(0.0 AS DOUBLE),
             (a, x) -> a + (CAST(x AS DOUBLE) - round(CAST(x AS DOUBLE) * scale) / scale)
                         * (CAST(x AS DOUBLE) - round(CAST(x AS DOUBLE) * scale) / scale))""")
        t(s, dir, "embeddings")
          .withColumn("maxabs", maxabs)
          .filter(col("maxabs") > 0)
          .withColumn("scale", lit(127.0) / col("maxabs"))
          .withColumn("sse", sse)
          .groupBy(col("label").cast("bigint").as("label"))
          .agg(count(lit(1)).as("n_vecs"),
            sum(col("sse").cast(DecimalType(30, 15))).cast("double").as("sse_sum"))
          .select(col("label"), col("n_vecs"),
            round(col("sse_sum") / col("n_vecs"), 9).as("mse9"))
          .orderBy("label")
      },
      Some("""
        WITH q AS (
          SELECT label,
                 127.0 / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                     list_transform(embedding, x -> CAST(x AS DOUBLE))),
                     (a, x) -> greatest(a, abs(x))) AS scale,
                 embedding
          FROM embeddings
          WHERE list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(embedding, x -> CAST(x AS DOUBLE))),
                  (a, x) -> greatest(a, abs(x))) > 0),
        e AS (
          SELECT label,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(embedding, x -> CAST(x AS DOUBLE))),
                   (a, x) -> a + (x - round(x * scale) / scale)
                               * (x - round(x * scale) / scale)) AS sse
          FROM q)
        SELECT CAST(label AS BIGINT) AS label, count(*) AS n_vecs,
               round(CAST(sum(CAST(sse AS DECIMAL(30,15))) AS DOUBLE) / count(*), 9) AS mse9
        FROM e
        GROUP BY 1
        ORDER BY label""")),

    // ---------------------------------------------------------------- q74
    // Stream-stream interval join, batch-equivalent: purchases attribute
    // to clicks by the same user within 10 minutes. Scale path: clicks
    // key on their 10-min bucket; purchases replicate to (bucket-1,
    // bucket) → EQUI-join + exact interval refilter. Each true pair
    // matches exactly one bucket key — no dedup pass needed. The
    // streaming form (watermarked time-range join) is
    // StreamOps.intervalJoin, exercised in StreamOpsSpec.
    QDef("q74_stream_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .selectExpr("user_id", "event_type", s"$tsMs AS ts_ms")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts_ms").as("tc"))
          .withColumn("bk", expr("tc DIV 600000"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_ms").as("tp"))
          .withColumn("bk", explode(array(expr("tp DIV 600000 - 1"), expr("tp DIV 600000"))))
        clicks.join(purchases, Seq("user_id", "bk"))
          .filter(col("tp") >= col("tc") && col("tp") - col("tc") <= 600000)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_pairs"),
            min(col("tp") - col("tc")).as("min_lag_ms"),
            max(col("tp") - col("tc")).as("max_lag_ms"))
          .orderBy("user_id")
      },
      Some("""
        WITH c AS (SELECT user_id, epoch_ms(ts) AS tc FROM events WHERE event_type = 'click'),
             p AS (SELECT user_id, epoch_ms(ts) AS tp FROM events WHERE event_type = 'purchase')
        SELECT c.user_id AS user_id, count(*) AS n_pairs,
               min(tp - tc) AS min_lag_ms, max(tp - tc) AS max_lag_ms
        FROM c JOIN p ON c.user_id = p.user_id
                     AND p.tp >= c.tc AND p.tp - c.tc <= 600000
        GROUP BY 1
        ORDER BY user_id"""))
  )
}
