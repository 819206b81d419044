package graft.expressions

import graft.SparkSpec
import graft.dedup.Dedup
import graft.functions.PortableHash
import org.apache.spark.sql.functions._

/** The native one-pass distinct-shingle-set builder must be value-identical
  * to the composed explode/substr/md5/collect_set pipeline it replaced
  * (q33's oracle keeps the composed form in DuckDB, so this equivalence is
  * what keeps the oracle honest). */
class ShingleSetSpec extends SparkSpec {

  /** The original composed form (r4 q33): per-position substr + scalar
    * shingle hash, set-collected per row — kept here as the executable
    * spec of the semantics. */
  private def composed(df: org.apache.spark.sql.DataFrame, n: Int) = df
    .withColumn("rid", monotonically_increasing_id())
    .select(col("rid"), col("text"),
      explode(sequence(lit(1), length(col("text")) - (n - 1))).as("i"))
    .withColumn("h", Dedup.shingleHash(expr(s"substr(text, i, $n)")))
    .groupBy("rid")
    .agg(sort_array(collect_set(col("h"))).as("expected"))

  private def check(df0: org.apache.spark.sql.DataFrame, n: Int): Unit = {
    // the composed form's sequence() runs DESCENDING when len < n — its
    // callers always pre-filter, so the spec compares on that domain too
    // (shorter inputs are covered by the degenerate test)
    val df = df0.filter(length(col("text")) >= n)
    val actual = df
      .withColumn("rid", monotonically_increasing_id())
      .select(col("rid"), Dedup.shingleSetHash(col("text"), n).as("actual"))
    val diff = composed(df, n).join(actual, "rid")
      .where(expr("NOT (actual <=> expected)"))
    assert(diff.count() == 0)
  }

  test("native shingle set == composed form on every real document") {
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select("text").filter(length(col("text")) >= 3)
    check(docs, 3)
  }

  test("native shingle set == composed form on multi-byte + adversarial text") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val alphabet = "ab @é中" // whole chars only: a lone surrogate is not UTF-8
    val emoji = new String(Character.toChars(0x1F600))
    val cases = Seq(
      "aaa", "aaaaaaaaaaaaaaaa", "@@@@@@@@", "abcabcabcabc",
      emoji * 6 + "abc" + emoji * 3,
      "héllo wörld " * 20, "中文字符中文字符abcd中文") ++
      (1 to 60).map(_ => (0 until (3 + rnd.nextInt(90)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    check(cases.toDF("text"), 3)
    check(cases.toDF("text"), 5)
  }

  test("degenerate + fast-profile parity") {
    import spark.implicits._
    // shorter than n: empty set (callers filter length >= n, but the
    // expression itself must not crash)
    val tiny = Seq("", "a", "ab").toDF("text")
      .select(Dedup.shingleSetHash(col("text"), 3).as("g")).collect()
    assert(tiny.forall(_.getSeq[Long](0).isEmpty))
    // fast profile: same set as the composed xxhash64 form (profile is
    // baked at plan CONSTRUCTION — single-threaded test contract)
    PortableHash.profileOverride = Some("fast")
    try {
      val df = Seq("the quick brown fox", "aaaabbbb").toDF("text")
      check(df, 3)
    } finally PortableHash.profileOverride = None
  }
}
