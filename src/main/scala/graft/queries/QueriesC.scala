package graft.queries

import graft.Tables.t
import graft.dedup.{Components, Dedup}
import graft.functions.{PortableHash, TextFunctions, VectorOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2C LLM-pipeline deduplication over `documents`/`embeddings`
  * (SURVEY.md §2C). The corpus has no planted near-dups, so every query
  * reports the TOP-K most-similar candidates (deterministic order) rather
  * than a threshold filter — non-vacuous on any corpus. All pairwise work
  * is bucket-scoped (LSH band / byte-band / block key): linear at 100 TB. */
object QueriesC extends QueryPack {

  private val wSql = TextFunctions.wordsSql("text")

  /** documents → exploded shingle POSITIONS (cheap generator child —
    * Spark inlines the generator child into GenerateExec and re-evaluates
    * it per OUTPUT row, so exploding the built ngram array would redo the
    * whole array build ~n times per doc) → per-row 3-gram concat + md5
    * inside codegen → ONE hash-aggregate building BOTH the shingle set
    * (collect_set dedups) and the 6 minhash mins. Cached: referenced by
    * the band pipeline and both jaccard sides — at 100 TB this is the
    * persisted signature table. */
  private[queries] def shingled(s: SparkSession, dir: String): DataFrame = {
    // native one-pass word-shingle-set + minhash-from-set (r10): the
    // composed explode/concat_ws/md5-per-position/collect_set form
    // shuffled every position row and ran one md5 per position; this is
    // a pure map over documents (sorted sets: the pairwise verify uses
    // the native merge-walk count). repartition restores the parallelism
    // the single-file parquet scan would otherwise pin to one task.
    val sigTable = t(s, dir, "documents")
      .withColumn("w", TextFunctions.words(col("text")))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), Dedup.wordShingleSetHash(col("w"), 3).as("sh"))
      .withColumn("sig", Dedup.minhashFromSet(col("sh"), 6))
      .repartition(col("doc_id"))
      .cache()
    // eager materialization: the final plan references this table from
    // three subtrees of ONE job — without it, concurrent tasks race the
    // unpopulated cache and recompute the md5 pipeline up to 3x
    sigTable.count()
    sigTable
  }

  private[queries] val shingledSql =
    s"""SELECT doc_id, list_distinct(${Dedup.shingleHashesSql("sh0")}) AS sh FROM (
          SELECT doc_id, list_distinct(${TextFunctions.wordNgramsSql("w", 3)}) AS sh0
          FROM (SELECT doc_id, $wSql AS w FROM documents))
        WHERE len(sh0) > 0"""

  /** q31's band/bucket candidate-pair chain as standalone WITH-SQL
    * (shared by q31 and the q35 clustering oracle). */
  private[queries] val candidatePairsSql: String = {
    val sig = Dedup.minhashSigSql("sh", 6)
    val bandSelects = (0 until 3).map { j =>
      val key = s"concat_ws('|', CAST(sig[${2 * j + 1}] AS VARCHAR), CAST(sig[${2 * j + 2}] AS VARCHAR))"
      val bucket = PortableHash.md5LongSql(key, salt = s"band$j~")
      s"SELECT doc_id, $j AS band, $bucket AS bucket FROM sigs"
    }.mkString(" UNION ALL ")
    s"""WITH docs AS ($shingledSql),
        sigs AS (SELECT doc_id, $sig AS sig FROM docs),
        bands AS ($bandSelects),
        pairs AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id)"""
  }

  def defs: Seq[QDef] = Seq(
    // ---------------------------------------------------------------- q30
    // Exact dedup by canonical bag-of-words signature: one hash groupBy —
    // the 100 TB path is a single shuffle on the signature.
    QDef("q30_dedup_exact",
      (s, dir) => {
        t(s, dir, "documents")
          .withColumn("w", TextFunctions.words(col("text")))
          .withColumn("sig", Dedup.canonicalKey(col("w")))
          .groupBy("sig")
          .agg(count(lit(1)).as("n_docs"),
            min(col("doc_id")).as("keep_doc"), max(col("doc_id")).as("last_doc"))
          .filter(col("n_docs") > 1)
          .orderBy(col("n_docs").desc, col("sig"))
      },
      Some(s"""
        WITH d AS (SELECT doc_id, ${Dedup.canonicalKeySql("w")} AS sig
                   FROM (SELECT doc_id, $wSql AS w FROM documents))
        SELECT sig, count(*) AS n_docs, min(doc_id) AS keep_doc, max(doc_id) AS last_doc
        FROM d GROUP BY sig HAVING count(*) > 1
        ORDER BY n_docs DESC, sig""")),

    // ---------------------------------------------------------------- q31
    // MinHash + LSH banding: hashed shingles → 6 minhash permutations
    // (one md5 per shingle + integer mixing) → 3 bands of 2 → bucket-join
    // candidates → exact jaccard verify → top 20. Band size 2 keeps the
    // candidate set ~O(n·j²): the pairwise verify never explodes.
    QDef("q31_dedup_minhash",
      (s, dir) => {
        val docs = shingled(s, dir)
        val sigs = docs.select("doc_id", "sig")
        val pairs = Dedup.lshCandidates(sigs, "doc_id", "sig", nHashes = 6, bandSize = 2)
        val a = docs.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
        val b = docs.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
        pairs.join(a, "id_a").join(b, "id_b")
          .withColumn("inter", Dedup.sortedIntersectCount("sh_a", "sh_b"))
          .withColumn("jac_bp", Dedup.jaccardBpFromInter(col("inter"), "sh_a", "sh_b"))
          .select("id_a", "id_b", "jac_bp")
          .orderBy(col("jac_bp").desc, col("id_a"), col("id_b"))
          .limit(20)
      },
      Some(s"""
        $candidatePairsSql
        SELECT p.id_a, p.id_b, ${Dedup.jaccardBpSql("da.sh", "db.sh")} AS jac_bp
        FROM pairs p
        JOIN docs da ON da.doc_id = p.id_a
        JOIN docs db ON db.doc_id = p.id_b
        ORDER BY jac_bp DESC, id_a, id_b
        LIMIT 20""")),

    // ---------------------------------------------------------------- q35
    // Connected components over the LSH candidate pairs: min-label
    // propagation turns pairwise near-dup matches into dedup clusters
    // ("keep smallest doc_id per cluster"). Oracle: recursive-CTE
    // transitive closure over the identical edge list.
    QDef("q35_dedup_cluster",
      (s, dir) => {
        val docs = shingled(s, dir)
        val pairs = Dedup.lshCandidates(docs.select("doc_id", "sig"),
          "doc_id", "sig", nHashes = 6, bandSize = 2)
        Components.connectedComponents(pairs, "id_a", "id_b")
          .groupBy(col("lbl").as("cluster"))
          .agg(count(lit(1)).as("n_docs"),
            min(col("id")).as("keep_doc"), max(col("id")).as("last_doc"))
          .orderBy("cluster")
      },
      Some {
        val edgesSql =
          s"SELECT id_a, id_b FROM ($candidatePairsSql SELECT id_a, id_b FROM pairs)"
        s"""
        SELECT lbl AS cluster, count(*) AS n_docs,
               min(id) AS keep_doc, max(id) AS last_doc
        FROM (${Components.labelPropagationSql(edgesSql)})
        GROUP BY lbl
        ORDER BY cluster"""
      }),

    // ---------------------------------------------------------------- q32
    // 32-bit SimHash: per-word portable hashes → majority-vote bits →
    // byte-band candidates (pigeonhole: hamming<=3 pairs always share a
    // byte) → hamming rollup + identical-simhash clusters.
    QDef("q32_dedup_simhash",
      (s, dir) => {
        // explode + ONE hash-aggregate (codegen'd, partial agg) — the
        // 100 TB shape; the array-lambda Dedup.simhash32 form is kept for
        // library users and asserted equal in DedupSpec.
        val exploded = t(s, dir, "documents")
          .withColumn("w", TextFunctions.words(col("text")))
          .filter(size(col("w")) > 0)
          .select(col("doc_id"), explode(col("w")).as("word"))
        val docs = Dedup.simhashAgg(exploded, "doc_id", "word").cache()
        docs.count() // eager: band self-join reads it twice
        val bands = docs.select(col("doc_id"), col("sh"),
          posexplode(array((0 until 4).map(b =>
            shiftright(col("sh"), 8 * b).bitwiseAND(lit(255L))): _*)).as(Seq("band", "bval")))
        val pairs = bands.as("a").join(bands.as("b"),
            col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
            col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
          .distinct()
          .withColumn("hamming", Dedup.hamming(col("sh_a"), col("sh_b")))
        pairs.groupBy("hamming").agg(count(lit(1)).as("n_pairs"),
            min(col("id_a")).as("min_id_a"))
          .orderBy("hamming")
      },
      Some {
        val hwSql = s"list_transform(w, x -> ${PortableHash.md5LongSql("x")})"
        val bandSelects = (0 until 4).map { b =>
          s"SELECT doc_id, sh, $b AS band, (sh >> ${8 * b}) & 255 AS bval FROM docs"
        }.mkString(" UNION ALL ")
        s"""
        WITH d AS (SELECT doc_id, $wSql AS w FROM documents),
        d2 AS (SELECT doc_id, $hwSql AS hw FROM d WHERE len(w) > 0),
        docs AS (SELECT doc_id, ${Dedup.simhash32Sql("hw")} AS sh FROM d2),
        bands AS ($bandSelects),
        pairs AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sh AS sh_a, b.sh AS sh_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id)
        SELECT ${Dedup.hammingSql("sh_a", "sh_b")} AS hamming, count(*) AS n_pairs,
               min(id_a) AS min_id_a
        FROM pairs
        GROUP BY 1
        ORDER BY hamming"""
      }),

    // ---------------------------------------------------------------- q33
    // Blocked n-gram Jaccard: (lang, length-band) blocking → char-3-gram
    // set similarity within block → top 20. EXACT adaptive-threshold
    // PPJoin: the naive within-block all-pairs join is O(Σ block²) — at a
    // 100× corpus each (lang, band) block grows 100×, so pairs grow
    // 10,000× (measured: 660 s at the 100× perturbed mirror). Instead,
    // descend a threshold ladder t ∈ {9/10, 4/5, 3/5, 2/5, 1/5}: at each
    // rung run a prefix-filtered candidate join (q288's pigeonhole +
    // size + positional filters) and verify exactly; stop as soon as ≥20
    // pairs pass. Exactness: every pair NOT generated at rung p/q has
    // jac < p/q, hence jac_bp ≤ p·10000/q − 1 < the 20th found value —
    // the found set provably contains the global top-20 including ties.
    QDef("q33_dedup_ngram_jaccard",
      (s, dir) => {
        // native one-pass shingle-set build (Dedup.shingleSetHash): the r9
        // explode+substr+md5-per-position+collect_set form was O(len²) in
        // byte scans, one md5 per position, and shuffled 14.8M rows to
        // rebuild per-doc sets — 30s of the 36s sf1 wall. Now a pure map
        // over documents; per-pair set intersection still runs on
        // fixed-width longs downstream.
        val docs = t(s, dir, "documents")
          .filter(length(col("text")) >= 3)
          .select(col("lang"), expr("n_chars DIV 50").as("blk"), col("doc_id"),
            Dedup.shingleSetHash(col("text"), 3).as("g"))
          .withColumn("sz", size(col("g")).cast("bigint"))
          // restore parallelism lost to the map-only build's single
          // parquet-scan partition (see q198)
          .repartition(col("doc_id"))
          .cache()
        docs.count() // eager: rungs, fallback, and both verify sides
        // ascending-df shingle order via the (df, h) pair (q288's trick —
        // no materialized global rank). The char-3-gram domain is bounded
        // by charset³, so the df table broadcasts at any corpus size.
        val rk = docs
          .select(explode(col("g")).as("h"))
          .groupBy("h").agg(count(lit(1)).as("df"))
        val ranked = docs
          .select(col("lang"), col("blk"), col("doc_id"), col("sz"),
            explode(col("g")).as("h"))
          .join(broadcast(rk), "h")
          .withColumn("rn", row_number().over(
            Window.partitionBy("doc_id").orderBy("df", "h")))
          .select("lang", "blk", "doc_id", "sz", "h", "rn")
          .cache()
        ranked.count() // eager: both candidate sides, every rung
        def rung(p: Long, q: Long): org.apache.spark.sql.DataFrame = {
          val pre = ranked.where(
            col("rn") <= col("sz") - expr(s"($p*sz + ${q - 1}) DIV $q") + 1)
          val cand = pre.as("a").join(pre.as("b"),
              col("a.lang") === col("b.lang") && col("a.blk") === col("b.blk") &&
                col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
                col("b.sz") * q >= col("a.sz") * p &&
                col("a.sz") * q >= col("b.sz") * p &&
                (lit(1L) + least(col("a.sz") - col("a.rn"),
                  col("b.sz") - col("b.rn"))) * (p + q) >=
                  (col("a.sz") + col("b.sz")) * p)
            .select(col("a.lang").as("lang"), col("a.doc_id").as("id_a"),
              col("b.doc_id").as("id_b"))
            .distinct()
          cand
            .join(docs.select(col("doc_id").as("id_a"), col("g").as("g_a"),
              col("sz").as("sz_a")), Seq("id_a"))
            .join(docs.select(col("doc_id").as("id_b"), col("g").as("g_b"),
              col("sz").as("sz_b")), Seq("id_b"))
            .withColumn("inter", Dedup.sortedIntersectCount("g_a", "g_b"))
            .where(col("inter") * (p + q) >= (col("sz_a") + col("sz_b")) * p)
            .withColumn("jac_bp",
              Dedup.jaccardBpFromInter(col("inter"), "g_a", "g_b"))
            .select("lang", "id_a", "id_b", "jac_bp")
        }
        val rungs = Seq((9L, 10L), (4L, 5L), (3L, 5L), (2L, 5L), (1L, 5L))
        var result: Option[org.apache.spark.sql.DataFrame] = None
        for (r <- rungs if result.isEmpty) {
          val cur = rung(r._1, r._2).cache()
          if (cur.count() >= 20) result = Some(cur) else cur.unpersist()
        }
        val top = result.getOrElse {
          // exhaustive fallback — reachable only when the whole corpus has
          // <20 pairs at jac ≥ 0.2 (tiny SFs / degenerate data)
          val a = docs.select(col("lang"), col("blk"),
            col("doc_id").as("id_a"), col("g").as("g_a"))
          val b = docs.select(col("lang"), col("blk"),
            col("doc_id").as("id_b"), col("g").as("g_b"))
          a.join(b, Seq("lang", "blk")).filter(col("id_a") < col("id_b"))
            .withColumn("inter", Dedup.sortedIntersectCount("g_a", "g_b"))
            .withColumn("jac_bp",
              Dedup.jaccardBpFromInter(col("inter"), "g_a", "g_b"))
            .select("lang", "id_a", "id_b", "jac_bp")
        }
        top.orderBy(col("jac_bp").desc, col("id_a"), col("id_b")).limit(20)
      },
      Some(s"""
        WITH docs0 AS (
          SELECT lang, doc_id, n_chars // 50 AS blk,
                 list_distinct(${TextFunctions.charNgramsSql("text", 3)}) AS g0
          FROM documents),
        d AS (SELECT lang, doc_id, blk,
                     list_distinct(${Dedup.shingleHashesSql("g0")}) AS g
              FROM docs0 WHERE len(g0) > 0)
        SELECT a.lang AS lang, a.doc_id AS id_a, b.doc_id AS id_b,
               ${Dedup.jaccardBpSql("a.g", "b.g")} AS jac_bp
        FROM d a JOIN d b ON a.lang = b.lang AND a.blk = b.blk AND a.doc_id < b.doc_id
        ORDER BY jac_bp DESC, id_a, id_b
        LIMIT 20""")),

    // ---------------------------------------------------------------- q34
    // Embedding near-dup: 8-hyperplane LSH bucket → in-bucket cosine →
    // top 20 most-similar pairs.
    QDef("q34_dedup_embedding",
      (s, dir) => {
        // norms projected once per side: each candidate pair costs one dot
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"),
            VectorOps.lshBucket("embedding", nPlanes = 8, dim = 64).as("bucket"),
            VectorOps.norm("embedding").as("nrm"))
          // repartition: single-file scan = ONE partition (see q198)
          .repartition(col("vec_id"))
          .cache()
        e.count() // eager: read by both join sides in one job
        val a = e.select(col("bucket"), col("vec_id").as("id_a"),
          col("embedding").as("v_a"), col("nrm").as("n_a"))
        val b = e.select(col("bucket"), col("vec_id").as("id_b"),
          col("embedding").as("v_b"), col("nrm").as("n_b"))
        a.join(b, "bucket").filter(col("id_a") < col("id_b"))
          .withColumn("cos6", VectorOps.cosine6Out("v_a", "v_b", "n_a", "n_b"))
          .select("bucket", "id_a", "id_b", "cos6")
          .orderBy(col("cos6").desc, col("id_a"), col("id_b"))
          .limit(20)
      },
      Some(s"""
        WITH e AS (
          SELECT vec_id, embedding,
                 ${VectorOps.lshBucketSql("embedding", nPlanes = 8, dim = 64)} AS bucket,
                 ${VectorOps.normSql("embedding")} AS nrm
          FROM embeddings)
        SELECT a.bucket AS bucket, a.vec_id AS id_a, b.vec_id AS id_b,
               ${VectorOps.cosine6OutSql("a.embedding", "b.embedding", "a.nrm", "b.nrm")} AS cos6
        FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        ORDER BY cos6 DESC, id_a, id_b
        LIMIT 20""")),
  )
}
