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

  /** MinHash signature column (array of nHashes mins over shingles).
    * `shingles` must be a distinct string-array column name. */
  def minhashSig(shingles: String, nHashes: Int): Column = {
    val mins = (0 until nHashes).map { j =>
      array_min(transform(col(shingles),
        s => PortableHash.md5Long(s, salt = s"mh$j~")))
    }
    array(mins: _*)
  }
  def minhashSigSql(shingles: String, nHashes: Int): String = {
    val mins = (0 until nHashes).map { j =>
      s"list_min(list_transform($shingles, s -> ${PortableHash.md5LongSql("s", salt = s"mh$j~")}))"
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
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** 32-bit SimHash of the word-hash array column `hw` (each element a
    * portable 60-bit hash): bit i set iff more than half the words have
    * bit i set. */
  def simhash32(hw: String): Column =
    (0 until 32).map { i =>
      when(expr(s"aggregate($hw, 0, (acc, h) -> acc + CAST((h >> $i) & 1 AS INT)) * 2 > size($hw)"),
        lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  def simhash32Sql(hw: String): String =
    (0 until 32).map { i =>
      s"(CASE WHEN list_sum(list_transform($hw, h -> (h >> $i) & 1)) * 2 > len($hw) THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Jaccard similarity of two distinct-element array columns, in exact
    * integer basis points. */
  def jaccardBp(a: String, b: String): Column =
    expr(s"size(array_intersect($a, $b)) * 10000 DIV size(array_distinct(concat($a, $b)))")
  def jaccardBpSql(a: String, b: String): String =
    s"CAST(len(list_intersect($a, $b)) * 10000 // len(list_distinct($a || $b)) AS BIGINT)"

  /** Hamming distance between two small-int-bitset columns. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
  def hammingSql(a: String, b: String): String = s"bit_count(xor($a, $b))"
}
