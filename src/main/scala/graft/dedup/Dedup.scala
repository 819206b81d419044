package graft.dedup

import graft.functions.{PortableHash, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for the LLM training-data pipeline
  * (SURVEY.md §2C). Reference analog: response-payload dedup by checksum
  * (/root/reference/src/ubdc_airbnb/ubdc_airbnb/models.py WorldShape
  * .md5_checksum); the near-dup family is brief-mandated.
  *
  * Scale design: NO O(n²) stage anywhere — every pairwise step is
  * bucket-scoped (LSH band, simhash byte-band, or block key), so the
  * shuffles are linear in docs + candidates. Hashes are portable
  * (PortableHash.md5Long) so every operator stays oracle-checkable;
  * production swaps in xxhash64 via PortableHash.fast.
  */
object Dedup {

  /** Canonical bag-of-words signature: docs whose DISTINCT word sets are
    * equal collide (whitespace/ordering/duplication-insensitive exact
    * dedup). */
  def canonicalKey(w: Column): Column =
    PortableHash.md5Long(concat_ws(" ", array_sort(array_distinct(w))))
  def canonicalKeySql(w: String): String =
    PortableHash.md5LongSql(s"array_to_string(list_sort(list_distinct($w)), ' ')")

  /** MinHash permutation constants: h_j(x) = (x*A_j + B_j) mod M over a
    * 31-bit base hash — one md5 per shingle total, then cheap integer
    * mixing per permutation (the classic a*x+b universal family). All
    * intermediate products stay < 2^53: exact in both engines. */
  private val M31 = 2147483647L
  private def mixA(j: Int): Long = 1000003L + j * 7919L
  private def mixB(j: Int): Long = 12345L + j * 104729L

  /** 31-bit base hashes of a distinct string-array column (one md5 each). */
  def shingleHashes(shingles: String): Column =
    transform(col(shingles), s => PortableHash.md5Long(s) % M31)
  def shingleHashesSql(shingles: String): String =
    s"list_transform($shingles, s -> ${PortableHash.md5LongSql("s")} % $M31)"

  /** Scalar 31-bit base hash — apply to an EXPLODED shingle column so the
    * md5 runs inside whole-stage codegen instead of an interpreted array
    * lambda (the hot-path form; same values as [[shingleHashes]]). */
  def shingleHash(c: Column): Column = PortableHash.md5Long(c) % M31

  /** Sorted distinct char-n-gram base hashes of a TEXT column, in one
    * native O(len) pass with a gram→hash memo — value-identical to
    * `sort_array(collect_set(shingleHash(substr(text, i, n))))` over the
    * exploded positions, which re-scanned the string per position
    * (O(len²)) and ran one md5 per POSITION (30s of q33's 36s sf1 wall).
    * Builds the per-doc set WITHOUT a groupBy shuffle. */
  def shingleSetHash(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.ShingleSet(
        org.apache.spark.sql.GraftColumnBridge.expression(text),
        n, M31, PortableHash.profile == "fast"))

  /** Sorted distinct space-joined word-n-gram base hashes of a WORDS
    * array column — the word-shingle sibling of [[shingleSetHash]]
    * (same memo, same O(positions) one-pass build). */
  def wordShingleSetHash(w: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.WordShingleSet(
        org.apache.spark.sql.GraftColumnBridge.expression(w),
        n, M31, PortableHash.profile == "fast"))

  /** Minhash signature straight from a distinct base-hash SET column —
    * value-identical to [[minhashAggs]] over the exploded multiset, one
    * tight native loop per doc. */
  def minhashFromSet(sh: Column, nHashes: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.MinhashFromSet(
        org.apache.spark.sql.GraftColumnBridge.expression(sh), nHashes))

  /** MinHash minimum aggregates over an exploded base-hash column: use in
    * ONE groupBy together with collect_set to build signature + shingle
    * set in a single codegen'd pass. Min over the multiset equals min
    * over the set — same signature as [[minhashSig]]. */
  def minhashAggs(h: Column, nHashes: Int): Seq[Column] =
    (0 until nHashes).map(j => min((h * mixA(j) + mixB(j)) % M31).as(s"_mh$j"))

  /** SQL scalar-aggregate form of [[minhashAggs]] (one min() per hash
    * function, same mix constants) for oracle parity over a GROUP BY —
    * no list materialization on the SQL side. */
  def minhashAggSqls(h: String, nHashes: Int): Seq[String] =
    (0 until nHashes).map(j =>
      s"min(($h * ${mixA(j)} + ${mixB(j)}) % $M31)")

  /** MinHash signature (array of nHashes mins) over the base-hash array
    * column `hs` produced by [[shingleHashes]]. */
  def minhashSig(hs: String, nHashes: Int): Column = {
    val mins = (0 until nHashes).map { j =>
      array_min(transform(col(hs), h => (h * mixA(j) + mixB(j)) % M31))
    }
    array(mins: _*)
  }
  def minhashSigSql(hs: String, nHashes: Int): String = {
    val mins = (0 until nHashes).map { j =>
      s"list_min(list_transform($hs, h -> (h * ${mixA(j)} + ${mixB(j)}) % $M31))"
    }
    s"[${mins.mkString(", ")}]"
  }

  /** Candidate pairs (a < b) sharing at least one LSH band. Bands of r
    * signature positions are hashed to a bucket; the self-join is
    * band+bucket-scoped. sig arrays are 0-indexed positions [0, n). */
  def lshCandidates(sigs: DataFrame, idCol: String, sigCol: String,
                    nHashes: Int, bandSize: Int): DataFrame = {
    require(nHashes % bandSize == 0)
    val nBands = nHashes / bandSize
    val bandKey = (b: Int) =>
      PortableHash.md5Long(
        concat_ws("|", (0 until bandSize).map(k => col(sigCol).getItem(b * bandSize + k)): _*),
        salt = s"band$b~")
    val bands = sigs.select(
        col(idCol), posexplode(array((0 until nBands).map(bandKey): _*)).as(Seq("band", "bucket")))
      .cache() // both sides of the self-join read it
    bands.count() // eager: avoid concurrent double-compute of the pipeline
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** 32-bit SimHash of the word-hash array column `hw` (each element a
    * portable 60-bit hash): bit i set iff more than half the words have
    * bit i set. Array-lambda form (interpreted): fine for small batches;
    * use [[simhashAgg]] on the hot path. */
  def simhash32(hw: String): Column =
    (0 until 32).map { i =>
      when(expr(s"aggregate($hw, 0, (acc, h) -> acc + CAST((h >> $i) & 1 AS INT)) * 2 > size($hw)"),
        lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  def simhash32Sql(hw: String): String =
    (0 until 32).map { i =>
      s"(CASE WHEN list_sum(list_transform($hw, h -> (h >> $i) & 1)) * 2 > len($hw) THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Scale-path SimHash: explode words → 32 conditional sums in ONE
    * hash aggregation (whole-stage codegen, partial aggregation) instead
    * of 32 interpreted array folds per row. Input: (idCol, word string
    * col); output: (idCol, sh). Same result as [[simhash32]] over the
    * per-id word multiset. */
  def simhashAgg(df: DataFrame, idCol: String, wordCol: String): DataFrame = {
    val h = PortableHash.md5Long(col(wordCol))
    val sums = (0 until 32).map(i =>
      sum(shiftright(h, i).bitwiseAND(lit(1L))).as(s"_b$i"))
    df.groupBy(col(idCol))
      .agg(count(lit(1)).as("_n"), sums: _*)
      .select(col(idCol),
        (0 until 32).map(i =>
          when(col(s"_b$i") * 2 > col("_n"), lit(1L << i)).otherwise(lit(0L)))
          .reduce(_ + _).as("sh"))
  }

  /** Jaccard similarity of two distinct-element array columns, in exact
    * integer basis points. |∪| = |a|+|b|-|∩|: one hash-set build per pair
    * instead of two (inputs must already be element-distinct). */
  def jaccardBp(a: String, b: String): Column =
    expr(s"size(array_intersect($a, $b)) * 10000 DIV (size($a) + size($b) - size(array_intersect($a, $b)))")
  def jaccardBpSql(a: String, b: String): String =
    s"CAST(len(list_intersect($a, $b)) * 10000 // (len($a) + len($b) - len(list_intersect($a, $b))) AS BIGINT)"

  /** Same, from a precomputed |∩| column (avoids computing the intersect
    * twice when the optimizer can't CSE it). */
  def jaccardBpFromInter(inter: Column, a: String, b: String): Column =
    inter * 10000 / (size(col(a)) + size(col(b)) - inter) cast org.apache.spark.sql.types.LongType

  /** Native |∩| over SORTED distinct long-array columns (merge walk in
    * codegen, no per-pair hash set — the verify-stage hot path; pair it
    * with sort_array(collect_set(...)) on the cached signature table). */
  def sortedIntersectCount(a: String, b: String): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.SortedIntersectCount(
        org.apache.spark.sql.GraftColumnBridge.expression(col(a)),
        org.apache.spark.sql.GraftColumnBridge.expression(col(b))))

  /** Hamming distance between two small-int-bitset columns. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
  def hammingSql(a: String, b: String): String = s"bit_count(xor($a, $b))"
}
