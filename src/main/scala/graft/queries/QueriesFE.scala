package graft.queries

import graft.Tables.t
import graft.dedup.{Components, Dedup}
import graft.functions.TextFunctions
import graft.multimodal.MediaPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 §2F multimodal widening — the curation bookkeeping every
  * large media+caption corpus needs before training (reference analog:
  * the media-reference side of listings, `picture_url` et al.,
  * /root/reference/src/ubdc_airbnb/ubdc_airbnb/models.py:504). All four
  * run the REAL typed mapPartitions batch-decode plumbing
  * (multimodal/MediaPipeline.scala); only the codec is the deterministic
  * stub, so every byte-level number is reproducible in the DuckDB oracle.
  *
  *  - q629: caption↔media pair-integrity audit (LAION-style orphan
  *    accounting) — media-only rows waste payload bytes, caption-only
  *    rows are untrainable text; a full outer join keyed on doc_id with
  *    per-source pairing shares. At 100 TB both sides shuffle once on
  *    doc_id; the per-source rollup is bounded by the source domain.
  *  - q630: per-shard manifest — item count, byte total and an
  *    order-insensitive XOR digest of payload checksums (q99's
  *    XOR-Merkle shape on binary payloads): shard manifests are mergeable
  *    (xor is associative/commutative), so 1000 executors each digest
  *    their shards independently and a coordinator folds manifests.
  *  - q631: resolution/aspect profile filter — the decode-metadata gate
  *    (min side, aspect band) that screens payloads before the expensive
  *    training transforms; per-(source, band) histogram with trainable
  *    share. Linear, one shuffle to the bounded (source × band) grid.
  *  - q632: near-dup-cluster keeper selection — q31/q35's MinHash-LSH
  *    candidate edges over caption shingles (band-bucketed, so the
  *    candidate set stays ~linear in corpus size; a distributional
  *    payload aHash was tried first and REJECTED — on this templated
  *    corpus 16/32/64-bit histogram hashes all percolate into one giant
  *    component by sf0.1) feed Components.connectedComponents (round-8
  *    dual path: one-task union-find under the bounded edge census,
  *    label propagation above), then each cluster keeps its LARGEST
  *    PAYLOAD (tie → lowest doc_id) and reports reclaimable bytes —
  *    q35 asked "what are the clusters", this answers "what do we
  *    delete and how much storage comes back".
  */
object QueriesFE extends QueryPack {

  /** documents → typed media rows (payload = text bytes, the q60 shape). */
  private def mediaRows(s: SparkSession, dir: String,
                        filter: String = "true") =
    t(s, dir, "documents")
      .where(col("text").isNotNull).where(expr(filter))
      .select(col("doc_id"), col("source"),
        col("text").cast("binary").as("media"))
      .as(Encoders.product[MediaPipeline.MediaRow])

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q629
    // Pair-integrity audit. Deterministic orphan model: payloads exist
    // unless doc_id % 7 = 0 (dead media fetch), captions exist unless
    // doc_id % 5 = 3 (scrape gap) — disjoint-ish moduli so all three
    // pairing states occur at every SF.
    QDef("q629_pair_integrity",
      (s, dir) => {
        // presence markers, NOT source-nullness: a row whose source is
        // NULL is still a present media/caption row (the oracle tests
        // m.doc_id IS NOT NULL; deriving presence from source dropped
        // null-source rows from every count and zeroed the share
        // denominator — NullInputSpec regression, round 8)
        val media = MediaPipeline
          .extractFeatures(mediaRows(s, dir, "doc_id % 7 != 0")).toDF()
          .select(col("doc_id"), col("source").as("m_source"),
            col("byte_len").cast("long").as("byte_len"),
            lit(true).as("m_present"))
        val caps = t(s, dir, "documents")
          .where(col("text").isNotNull).where(expr("doc_id % 5 != 3"))
          .select(col("doc_id"), col("source").as("c_source"),
            lit(true).as("c_present"))
        media.join(caps, Seq("doc_id"), "full_outer")
          .select(coalesce(col("m_source"), col("c_source")).as("source"),
            coalesce(col("m_present"), lit(false)).as("has_media"),
            coalesce(col("c_present"), lit(false)).as("has_caption"),
            coalesce(col("byte_len"), lit(0L)).as("byte_len"))
          .groupBy("source")
          .agg(
            sum(when(col("has_media") && col("has_caption"), 1L)
              .otherwise(0L)).cast("long").as("n_paired"),
            sum(when(col("has_media") && !col("has_caption"), 1L)
              .otherwise(0L)).cast("long").as("n_media_only"),
            sum(when(!col("has_media") && col("has_caption"), 1L)
              .otherwise(0L)).cast("long").as("n_caption_only"),
            sum(when(col("has_media") && !col("has_caption"), col("byte_len"))
              .otherwise(0L)).cast("long").as("orphan_media_bytes"))
          .withColumn("paired_share_bp", expr(
            "n_paired * 10000 DIV (n_paired + n_media_only + n_caption_only)"))
          .orderBy("source")
      },
      Some("""
        WITH media AS (
          SELECT doc_id, source,
                 CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len
          FROM documents WHERE text IS NOT NULL AND doc_id % 7 != 0),
        caps AS (
          SELECT doc_id, source FROM documents
          WHERE text IS NOT NULL AND doc_id % 5 != 3),
        j AS (
          SELECT coalesce(m.source, c.source) AS source,
                 m.doc_id IS NOT NULL AS has_media,
                 c.doc_id IS NOT NULL AS has_caption,
                 coalesce(m.byte_len, 0) AS byte_len
          FROM media m FULL OUTER JOIN caps c USING (doc_id))
        SELECT source,
               CAST(sum(CASE WHEN has_media AND has_caption THEN 1 ELSE 0 END) AS BIGINT) AS n_paired,
               CAST(sum(CASE WHEN has_media AND NOT has_caption THEN 1 ELSE 0 END) AS BIGINT) AS n_media_only,
               CAST(sum(CASE WHEN NOT has_media AND has_caption THEN 1 ELSE 0 END) AS BIGINT) AS n_caption_only,
               CAST(sum(CASE WHEN has_media AND NOT has_caption THEN byte_len ELSE 0 END) AS BIGINT) AS orphan_media_bytes,
               CAST(sum(CASE WHEN has_media AND has_caption THEN 1 ELSE 0 END) * 10000
                 // count(*) AS BIGINT) AS paired_share_bp
        FROM j GROUP BY source ORDER BY source""")),

    // --------------------------------------------------------------- q630
    // Shard manifests: hash-sharded (doc_id % 32 — co-locates nothing,
    // balances everything), each manifest independently computable and
    // XOR-mergeable. bit_xor is the q99 idiom; the payload checksum is
    // MediaPipeline.checksum == the rolling text fingerprint for ASCII.
    QDef("q630_shard_manifest",
      (s, dir) => {
        MediaPipeline.extractFeatures(mediaRows(s, dir)).toDF()
          .groupBy(expr("doc_id % 32").as("shard"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("byte_len").cast("long")).cast("long").as("total_bytes"),
            expr("bit_xor(checksum)").as("xor_digest"),
            min("doc_id").as("min_doc_id"),
            max("doc_id").as("max_doc_id"))
          .orderBy("shard")
      },
      Some(s"""
        WITH f AS (
          SELECT doc_id % 32 AS shard, doc_id,
                 CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
                 ${TextFunctions.rollingFingerprintSql("text")} AS checksum
          FROM documents WHERE text IS NOT NULL)
        SELECT shard, count(*) AS n_items,
               CAST(sum(byte_len) AS BIGINT) AS total_bytes,
               bit_xor(checksum) AS xor_digest,
               min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
        FROM f GROUP BY shard ORDER BY shard""")),

    // --------------------------------------------------------------- q631
    // Decode-metadata gate: aspect bands from the stub dims in exact
    // integer bp (w*10000 DIV h), trainable = both sides >= 64 and a
    // non-extreme aspect. The profile is what a curation dashboard reads
    // before spending GPU-decode on the payloads themselves.
    QDef("q631_aspect_profile",
      (s, dir) => {
        MediaPipeline.extractFeatures(mediaRows(s, dir)).toDF()
          .withColumn("aspect_bp", expr(
            "CAST(width AS BIGINT) * 10000 DIV height"))
          .withColumn("band", expr(
            """CASE WHEN aspect_bp < 5000 THEN 'tall'
                    WHEN aspect_bp < 10000 THEN 'portrait'
                    WHEN aspect_bp < 20000 THEN 'landscape'
                    ELSE 'wide' END"""))
          .withColumn("trainable", expr(
            "least(width, height) >= 64 AND aspect_bp >= 5000 AND aspect_bp < 20000"))
          .groupBy("source", "band")
          .agg(count(lit(1)).as("n"),
            sum(when(col("trainable"), 1L).otherwise(0L)).cast("long")
              .as("n_trainable"))
          .withColumn("trainable_bp", expr("n_trainable * 10000 DIV n"))
          .orderBy("source", "band")
      },
      Some("""
        WITH dims AS (
          SELECT source,
                 CAST(16 + (doc_id * 37) % 1008 AS BIGINT) AS width,
                 CAST(16 + (doc_id * 53) % 752 AS BIGINT) AS height
          FROM documents WHERE text IS NOT NULL),
        g AS (
          SELECT source, width, height, width * 10000 // height AS aspect_bp
          FROM dims)
        SELECT source,
               CASE WHEN aspect_bp < 5000 THEN 'tall'
                    WHEN aspect_bp < 10000 THEN 'portrait'
                    WHEN aspect_bp < 20000 THEN 'landscape'
                    ELSE 'wide' END AS band,
               count(*) AS n,
               CAST(sum(CASE WHEN least(width, height) >= 64
                             AND aspect_bp >= 5000 AND aspect_bp < 20000
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_trainable,
               CAST(sum(CASE WHEN least(width, height) >= 64
                             AND aspect_bp >= 5000 AND aspect_bp < 20000
                        THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT)
                 AS trainable_bp
        FROM g GROUP BY 1, 2 ORDER BY source, band""")),

    // --------------------------------------------------------------- q632
    // Near-dup cluster keeper selection. Edges = the q35 LSH candidate
    // set (6 minhashes, 3 bands of 2 — candidate volume stays linear at
    // any corpus size, measured 328 clusters / max 15 members at sf0.1);
    // clusters = dual-path connected components; keeper = largest
    // payload (tie: lowest doc_id) via a deterministic window —
    // max_by/arg_max tie behavior is engine-defined, a row_number over
    // (bytes DESC, id ASC) is not.
    QDef("q632_phash_keeper",
      (s, dir) => {
        val feats = MediaPipeline.extractFeatures(mediaRows(s, dir)).toDF()
        val docs = QueriesC.shingled(s, dir)
        val edges = Dedup.lshCandidates(docs.select("doc_id", "sig"),
          "doc_id", "sig", nHashes = 6, bandSize = 2)
        val cc = Components.connectedComponents(edges, "id_a", "id_b")
        val members = cc.join(feats.select(col("doc_id").as("id"),
          col("byte_len").cast("long").as("bytes")), "id")
        val w = Window.partitionBy("lbl")
          .orderBy(col("bytes").desc, col("id").asc)
        members
          .withColumn("rk", row_number().over(w))
          .groupBy("lbl")
          .agg(count(lit(1)).as("n_members"),
            sum("bytes").cast("long").as("bytes_total"),
            max(when(col("rk") === 1, col("id"))).as("keeper_id"),
            max(when(col("rk") === 1, col("bytes"))).as("keeper_bytes"))
          .withColumn("bytes_reclaimed", expr("bytes_total - keeper_bytes"))
          .select(col("lbl").as("cluster"), col("n_members"),
            col("keeper_id"), col("bytes_total"), col("bytes_reclaimed"))
          .orderBy("cluster")
      },
      Some {
        val edgesSql = s"SELECT id_a, id_b FROM " +
          s"(${QueriesC.candidatePairsSql} SELECT id_a, id_b FROM pairs)"
        s"""
        WITH cc AS MATERIALIZED (${Components.labelPropagationSql(edgesSql)}),
        members AS (
          SELECT cc.lbl, cc.id,
                 CAST(octet_length(CAST(d.text AS BLOB)) AS BIGINT) AS bytes
          FROM cc JOIN documents d ON cc.id = d.doc_id),
        ranked AS (
          SELECT lbl, id, bytes,
                 row_number() OVER (PARTITION BY lbl
                   ORDER BY bytes DESC, id ASC) AS rk
          FROM members)
        SELECT lbl AS cluster, count(*) AS n_members,
               CAST(max(CASE WHEN rk = 1 THEN id END) AS BIGINT) AS keeper_id,
               CAST(sum(bytes) AS BIGINT) AS bytes_total,
               CAST(sum(bytes) - max(CASE WHEN rk = 1 THEN bytes END)
                 AS BIGINT) AS bytes_reclaimed
        FROM ranked GROUP BY lbl ORDER BY cluster"""
      })
  )
}
