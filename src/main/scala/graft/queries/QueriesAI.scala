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
  *
  *    Round-8 restructure (sf1 sweep finding): the pair join runs over
  *    DISTINCT phash values with multiplicities + per-hash min-id (the
  *    q473 dictionary-encoded pattern), not over docs. Templated corpora
  *    collapse to few hashes (sf1: 50k docs → 1,970 distinct, largest
  *    group 2,482), so doc-level (band,nibble) blocks grow linearly with
  *    the corpus and pairs quadratically (~10⁹ at sf1, one 810 s+
  *    shuffle task). Group-level: same-hash pairs contribute n·(n−1)/2
  *    at hamming 0 with the group's min id; cross-hash blocks are
  *    bounded by the 2¹⁶ hash DOMAIN, so pairwise work is O(1) in the
  *    corpus size. Bit-identical output: cross-pair count nA·nB, and
  *    min(id_a) = least(minA, minB) because the global min id pairs
  *    with every member of the other group as the smaller element.
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
        // dictionary-encode: one row per DISTINCT phash (≤2¹⁶ by domain),
        // carrying multiplicity + min doc_id. The heavy linear scan runs
        // once (cache + eager count on the ≤65536-row census, not on docs).
        val groups = hashed.groupBy("ph")
          .agg(count(lit(1)).as("n"), min(col("doc_id")).as("mid"))
          .cache()
        groups.count()
        val bands = groups.select(col("ph"), col("n"), col("mid"),
          posexplode(array((0 until 4).map(k =>
            shiftright(col("ph"), 4 * k).bitwiseAND(lit(15L))): _*))
            .as(Seq("band", "bval")))
        val cross = bands.as("a").join(bands.as("b"),
            col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
              col("a.ph") < col("b.ph"))
          .select(col("a.ph").as("ph_a"), col("b.ph").as("ph_b"),
            col("a.n").as("n_a"), col("b.n").as("n_b"),
            col("a.mid").as("mid_a"), col("b.mid").as("mid_b"))
          .distinct() // multi-band collisions count once; n/mid are ph-functional
          .select(Dedup.hamming(col("ph_a"), col("ph_b")).as("hamming"),
            (col("n_a") * col("n_b")).as("pairs"),
            least(col("mid_a"), col("mid_b")).as("min_id"))
        val same = groups.filter(col("n") >= 2)
          .select(lit(0).cast("int").as("hamming"),
            expr("n * (n - 1) DIV 2").as("pairs"), // integer DIV: n·(n−1) even, no FP
            col("mid").as("min_id"))
        cross.unionByName(same)
          .groupBy("hamming")
          .agg(sum(col("pairs")).as("n_pairs"), min(col("min_id")).as("min_id_a"))
          .orderBy("hamming")
      },
      Some {
        val bandSelects = (0 until 4).map { k =>
          s"SELECT ph, n, mid, $k AS band, (ph >> ${4 * k}) & 15 AS bval FROM grp"
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
        grp AS (
          SELECT ph, count(*) AS n, min(doc_id) AS mid FROM hash GROUP BY 1),
        bands AS ($bandSelects),
        crossg AS (
          SELECT DISTINCT a.ph AS ph_a, b.ph AS ph_b, a.n AS n_a, b.n AS n_b,
                 a.mid AS mid_a, b.mid AS mid_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bval = b.bval AND a.ph < b.ph),
        contrib AS (
          SELECT ${Dedup.hammingSql("ph_a", "ph_b")} AS hamming,
                 n_a * n_b AS pairs, least(mid_a, mid_b) AS min_id
          FROM crossg
          UNION ALL
          SELECT 0 AS hamming, n * (n - 1) // 2 AS pairs, mid AS min_id
          FROM grp WHERE n >= 2)
        SELECT hamming, CAST(sum(pairs) AS BIGINT) AS n_pairs,
               min(min_id) AS min_id_a
        FROM contrib GROUP BY 1 ORDER BY 1"""
      })
  )
}
