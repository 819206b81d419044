package graft.queries

import graft.Tables.t
import graft.dedup.Dedup
import graft.multimodal.MediaPipeline
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 28:
  *
  *  - q154: perceptual-hash media dedup — the multimodal counterpart of
  *    q32's SimHash: each payload's 16-bin byte histogram (through the
  *    REAL mapPartitions decode path, stubbed codec) → 16-bit aHash
  *    (bit b set iff bins[b] > mean, exact integer compare bins[b]·16 >
  *    total) → nibble-band blocking (hamming ≤ 3 pairs always share an
  *    untouched nibble by pigeonhole) → hamming rollup. Near-duplicate
  *    image/audio detection at 100 TB: linear in payloads, pairwise work
  *    bucket-scoped.
  */
object QueriesAI extends QueryPack {

  def defs: Seq[QDef] = Seq(

    QDef("q154_phash_dedup",
      (s, dir) => {
        val rows = t(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("text").cast("binary").as("media"))
          .as(Encoders.product[MediaPipeline.MediaRow])
        val hashed = MediaPipeline.byteHistogram(rows, nBins = 16).toDF()
          .withColumn("tot", expr("aggregate(bins, 0L, (acc, x) -> acc + x)"))
          .withColumn("ph", expr(
            """aggregate(sequence(0, 15), 0L, (acc, b) ->
               acc + IF(element_at(bins, b + 1) * 16 > tot,
                        shiftleft(CAST(1 AS BIGINT), b), 0L))"""))
          .select("doc_id", "ph")
          .cache()
        hashed.count() // eager: band self-join reads it twice
        val bands = hashed.select(col("doc_id"), col("ph"),
          posexplode(array((0 until 4).map(k =>
            shiftright(col("ph"), 4 * k).bitwiseAND(lit(15L))): _*))
            .as(Seq("band", "bval")))
        bands.as("a").join(bands.as("b"),
            col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
            col("a.ph").as("ph_a"), col("b.ph").as("ph_b"))
          .distinct()
          .withColumn("hamming", Dedup.hamming(col("ph_a"), col("ph_b")))
          .groupBy("hamming")
          .agg(count(lit(1)).as("n_pairs"), min(col("id_a")).as("min_id_a"))
          .orderBy("hamming")
      },
      Some {
        val bandSelects = (0 until 4).map { k =>
          s"SELECT doc_id, ph, $k AS band, (ph >> ${4 * k}) & 15 AS bval FROM hash"
        }.mkString(" UNION ALL ")
        s"""
        WITH chars AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, length(text) + 1),
                   i -> ascii(substr(text, i, 1)) % 16)) AS bin
          FROM documents WHERE text IS NOT NULL),
        tot AS (SELECT doc_id, count(*) AS tot FROM chars GROUP BY 1),
        bins AS (SELECT doc_id, bin, count(*) AS c FROM chars GROUP BY 1, 2),
        hash AS (
          SELECT t.doc_id,
                 CAST(coalesce(sum(CASE WHEN b.c * 16 > t.tot
                   THEN (CAST(1 AS BIGINT) << b.bin) END), 0) AS BIGINT) AS ph
          FROM tot t LEFT JOIN bins b ON t.doc_id = b.doc_id
          GROUP BY t.doc_id),
        bands AS ($bandSelects),
        pairs AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                 a.ph AS ph_a, b.ph AS ph_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id)
        SELECT ${Dedup.hammingSql("ph_a", "ph_b")} AS hamming,
               count(*) AS n_pairs, min(id_a) AS min_id_a
        FROM pairs GROUP BY 1 ORDER BY 1"""
      })
  )
}
