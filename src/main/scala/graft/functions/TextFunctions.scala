package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-pipeline operators (SURVEY.md §2E)
  * — language-ID markers, quality metrics, token estimates, rolling-hash
  * fingerprints — as codegen-friendly Column expressions with exact DuckDB
  * SQL mirrors (reference analog: `AirBnBReview.language` + review-text
  * handling, /root/reference/src/ubdc_airbnb/ubdc_airbnb/models.py:536).
  *
  * Convention: every helper has a `...Sql` twin producing the DuckDB
  * fragment with identical arithmetic; Spark arrays are 0-indexed, DuckDB
  * lists 1-indexed — the twins encode the offset, callers never index.
  * Helpers built on lambda expressions take a COLUMN NAME (the expression
  * is parsed by each engine's SQL parser), not a Column.
  */
object TextFunctions {

  /** Whitespace tokenization after trim; empty string → empty array. */
  def words(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))
  def wordsSql(e: String): String =
    s"CASE WHEN length(trim($e)) = 0 THEN [] ELSE string_split_regex(trim($e), '\\s+') END"

  /** Count of exact whole-word occurrences of `word`. */
  def wordHits(w: Column, word: String): Column =
    size(filter(w, x => x === lit(word)))
  def wordHitsSql(w: String, word: String): String =
    s"len(list_filter($w, x -> x = '$word'))"

  /** Word n-grams (space-joined) of array column `w`; empty when fewer
    * than n words. */
  def wordNgrams(w: String, n: Int): Column = {
    val parts = (0 until n).map(j => s"$w[i + $j]").mkString(", ")
    when(size(col(w)) < n, array().cast("array<string>")).otherwise(
      expr(s"transform(sequence(0, size($w) - $n), i -> concat_ws(' ', $parts))"))
  }
  def wordNgramsSql(w: String, n: Int): String = {
    val parts = (0 until n).map(j => s"$w[i + $j]").mkString(" || ' ' || ")
    s"CASE WHEN len($w) < $n THEN [] ELSE list_transform(range(1, len($w) - ${n - 2}), i -> $parts) END"
  }

  /** Sorted distinct space-joined word n-grams, one native pass — the
    * un-hashed sibling of Dedup.wordShingleSetHash for queries whose
    * oracle works on raw gram strings. */
  def wordNgramSet(w: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.WordNgramSet(
        org.apache.spark.sql.GraftColumnBridge.expression(w), n))

  /** Sorted per-row n-gram histogram (array<struct<g, c>>) — the
    * counting sibling of [[wordNgramSet]] for model-scoring passes that
    * need per-doc gram multiplicities without per-position explosion. */
  def wordNgramCounts(w: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.WordNgramCounts(
        org.apache.spark.sql.GraftColumnBridge.expression(w), n))

  /** Character n-grams of string column `c`. */
  def charNgrams(c: String, n: Int): Column =
    when(length(col(c)) < n, array().cast("array<string>")).otherwise(
      expr(s"transform(sequence(1, length($c) - ${n - 1}), i -> substr($c, i, $n))"))
  def charNgramsSql(e: String, n: Int): String =
    s"CASE WHEN length($e) < $n THEN [] ELSE list_transform(range(1, length($e) - ${n - 2}), i -> substr($e, i, $n)) END"

  /** Polynomial rolling hash over character codes of column `c` — the
    * document fingerprint (reference analog: payload md5 checksum,
    * models.py WorldShape.md5_checksum) but streamable/incremental:
    * fp = fold(codes, 0, (acc, ch) -> (acc*131 + ch) % 1_000_000_007). */
  def rollingFingerprint(c: String): Column =
    expr(s"aggregate(transform(sequence(1, length($c)), i -> ascii(substr($c, i, 1))), " +
      "0L, (acc, ch) -> (acc * 131 + ch) % 1000000007)")
  def rollingFingerprintSql(e: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length($e) + 1), " +
      s"i -> CAST(ord(substr($e, i, 1)) AS BIGINT))), (acc, ch) -> (acc * 131 + ch) % 1000000007)"

  /** Sorted distinct winnowing fingerprints (window-min of the rolling
    * n-gram fingerprint over `win` positions) in one native pass —
    * value-identical to posexplode([[charNgrams]]) →
    * [[rollingFingerprint]] → min OVER (ROWS 0..win-1) → distinct, which
    * ran ~2·len interpreted lambdas per gram plus a per-corpus window
    * shuffle (q494's 17.8s sf1 wall). */
  def winnowFps(c: Column, n: Int, win: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.WinnowFingerprints(
        org.apache.spark.sql.GraftColumnBridge.expression(c), n, win))

  /** Language-marker stopword sets (whole-word hits, scored per language).
    * Honest marker heuristic; deterministic tie-break en > de > es > fr. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "und", "das"),
    "es" -> Seq("el", "la", "de", "que"),
    "fr" -> Seq("le", "la", "et", "les"))

  def langScore(w: Column, markers: Seq[String]): Column =
    markers.map(wordHits(w, _)).reduce(_ + _)
  def langScoreSql(w: String, markers: Seq[String]): String =
    markers.map(wordHitsSql(w, _)).mkString("(", " + ", ")")

  /** Index of the winning language under >=-first tie-break, as a CASE
    * over score columns named s_<lang>. */
  def predictedLang: Column = {
    val langs = langMarkers.map(_._1)
    val cases = langs.init.zipWithIndex.map { case (l, i) =>
      val rest = langs.drop(i + 1)
      (rest.map(r => col(s"s_$l") >= col(s"s_$r")).reduce(_ && _), l)
    }
    cases.foldRight(lit(langs.last): Column) { case ((cond, l), e) => when(cond, l).otherwise(e) }
  }
  def predictedLangSql: String = {
    val langs = langMarkers.map(_._1)
    val whens = langs.init.zipWithIndex.map { case (l, i) =>
      val rest = langs.drop(i + 1)
      s"WHEN ${rest.map(r => s"s_$l >= s_$r").mkString(" AND ")} THEN '$l'"
    }
    s"CASE ${whens.mkString(" ")} ELSE '${langs.last}' END"
  }
}
