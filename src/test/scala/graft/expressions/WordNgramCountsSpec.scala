package graft.expressions

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** The native per-row n-gram histogram must be value-identical to the
  * composed explode-positions + groupBy count it replaced (q478's oracle
  * keeps the per-position form in DuckDB). */
class WordNgramCountsSpec extends SparkSpec {

  private def frames(df0: org.apache.spark.sql.DataFrame, n: Int) = {
    val df = df0
      .withColumn("w", TextFunctions.words(col("text")))
      .filter(size(col("w")) >= n)
      .withColumn("rid", monotonically_increasing_id())
    val parts = (0 until n).map(j => s"w[i + $j]").mkString(", ")
    val composed = df
      .select(col("rid"),
        explode(expr(s"transform(sequence(0, size(w) - $n), " +
          s"i -> concat_ws(' ', $parts))")).as("g"))
      .groupBy("rid", "g").agg(count(lit(1)).as("c"))
      .groupBy("rid")
      .agg(sort_array(collect_list(struct(col("g"), col("c")))).as("exp_gc"))
    val actual = df.select(col("rid"),
      TextFunctions.wordNgramCounts(col("w"), n).as("act_gc"))
    composed.join(actual, "rid")
  }

  test("native bigram histogram == composed form on every real document") {
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select("text")
    val j = frames(docs, 2)
    assert(j.where(expr("NOT (act_gc <=> exp_gc)")).count() == 0)
  }

  test("native histogram == composed form on adversarial text, n=2 and 3") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val vocab = Seq("a", "bb", "ccc", "éé", "中文", "the", "of")
    val cases = Seq("a a a a", "the the", "  padded   words  here ",
      "a bb a bb a bb", "a bb ccc éé 中文 the of a bb ccc") ++
      (1 to 50).map(_ => (0 until (2 + rnd.nextInt(40)))
        .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    for (n <- Seq(2, 3)) {
      val j = frames(cases.toDF("text"), n)
      assert(j.where(expr("NOT (act_gc <=> exp_gc)")).count() == 0)
    }
    // fewer than n words: empty histogram, no crash (callers keep the
    // size(w) >= n pre-filter; explode then drops the row either way)
    val tiny = Seq("one").toDF("text")
      .select(TextFunctions.wordNgramCounts(
        TextFunctions.words(col("text")), 2).as("gc"))
      .collect()
    assert(tiny(0).getSeq[Any](0).isEmpty)
  }
}
