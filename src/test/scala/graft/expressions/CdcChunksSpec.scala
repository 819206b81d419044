package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._

/** The native one-pass CDC chunker must be value-identical to the composed
  * transform/filter/substring pipeline it replaced (q558's oracle keeps the
  * composed form, so this equivalence is what keeps the oracle honest). */
class CdcChunksSpec extends SparkSpec {

  /** The original O(len²) composed form (r5 q558), kept here as the
    * executable spec of the boundary rule. */
  private def composed(df: org.apache.spark.sql.DataFrame) = df
    .where(col("text").isNotNull && length(col("text")) >= 4)
    .withColumn("len", length(col("text")))
    .withColumn("bpos", expr(
      """concat(
           filter(transform(sequence(4, len), i ->
             CASE WHEN (ascii(substring(text, i - 3, 1)) * 29791
                 + ascii(substring(text, i - 2, 1)) * 961
                 + ascii(substring(text, i - 1, 1)) * 31
                 + ascii(substring(text, i, 1))) % 64 = 0
               AND i < len THEN i ELSE NULL END), x -> x IS NOT NULL),
           array(len))"""))
    .withColumn("expected", expr(
      """transform(sequence(1, size(bpos)), j ->
           substring(text,
             CASE WHEN j = 1 THEN 1 ELSE bpos[j - 2] + 1 END,
             bpos[j - 1] -
               CASE WHEN j = 1 THEN 0 ELSE bpos[j - 2] END))"""))

  private def native(df: org.apache.spark.sql.DataFrame) =
    GraftColumnBridge.column(CdcChunks(
      GraftColumnBridge.expression(col("text"))))

  test("native chunker == composed form on every real document") {
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select("text")
    val diff = composed(docs)
      .withColumn("actual", native(docs))
      .where(expr("NOT (actual <=> expected)"))
    assert(diff.count() == 0)
  }

  test("native chunker == composed form on multi-byte + adversarial text") {
    import spark.implicits._
    // NOTE: supplementary-plane codepoints are excluded here — the
    // composed form ANSI-crashes on cp ≥ 72090 (cp*29791 > 2³¹); the
    // native form defines them via 64-bit arithmetic instead (covered by
    // the reassembly test below)
    val rnd = new scala.util.Random(42)
    val alphabet = "ab @é中"
    val cases = Seq(
      "aaaa", "aaaaaaaaaaaaaaaa", "@@@@@@@@",
      "héllo wörld " * 20, "中文字符中文字符abcd中文",
      (0 until 300).map(i => (i % 96 + 32).toChar).mkString) ++
      (1 to 50).map(_ => (0 until (4 + rnd.nextInt(80)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val df = cases.toDF("text")
    val diff = composed(df)
      .withColumn("actual", native(df))
      .where(expr("NOT (actual <=> expected)"))
    assert(diff.count() == 0)
  }

  test("chunks concatenate back to the input and SQL registration works") {
    import spark.implicits._
    val emoji = new String(Character.toChars(0x1F600))
    val df = Seq("the quick brown fox jumps over the lazy dog " * 10,
        emoji * 8 + "abcd" + emoji * 8)
      .toDF("text")
    val back = df.select(
        concat_ws("", expr("graft_cdc_chunks(text)")).as("r"),
        col("text"))
      .where(expr("r <> text"))
    assert(back.count() == 0)
    // degenerate inputs: no boundaries possible, whole text = one chunk
    val tiny = Seq("", "a", "abc").toDF("text")
      .select(expr("graft_cdc_chunks(text)").as("c")).collect()
    assert(tiny(0).getSeq[String](0) == Seq())
    assert(tiny(1).getSeq[String](0) == Seq("a"))
    assert(tiny(2).getSeq[String](0) == Seq("abc"))
  }
}
