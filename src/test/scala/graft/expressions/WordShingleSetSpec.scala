package graft.expressions

import graft.SparkSpec
import graft.dedup.Dedup
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** The native word-shingle-set and minhash-from-set must be value-identical
  * to the composed explode/concat_ws/md5/collect_set + minhashAggs
  * pipeline they replaced (QueriesC.shingled's oracle keeps the composed
  * form in DuckDB). */
class WordShingleSetSpec extends SparkSpec {

  private def frames(df0: org.apache.spark.sql.DataFrame) = {
    val df = df0
      .withColumn("w", TextFunctions.words(col("text")))
      .filter(size(col("w")) >= 3)
      .withColumn("rid", monotonically_increasing_id())
    val exploded = df
      .select(col("rid"), col("w"),
        explode(sequence(lit(0), size(col("w")) - 3)).as("i"))
      .withColumn("h", Dedup.shingleHash(expr("concat_ws(' ', w[i], w[i+1], w[i+2])")))
    val aggs = sort_array(collect_set(col("h"))).as("exp_sh") +:
      Dedup.minhashAggs(col("h"), 6)
    val composed = exploded.groupBy("rid")
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("exp_sig", array((0 until 6).map(j => col(s"_mh$j")): _*))
      .select("rid", "exp_sh", "exp_sig")
    val actual = df.select(col("rid"),
      Dedup.wordShingleSetHash(col("w"), 3).as("act_sh"))
      .withColumn("act_sig", Dedup.minhashFromSet(col("act_sh"), 6))
    composed.join(actual, "rid")
  }

  test("native word shingles + sig == composed form on every real document") {
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select("text")
    val j = frames(docs)
    assert(j.where(expr("NOT (act_sh <=> exp_sh)")).count() == 0)
    assert(j.where(expr("NOT (act_sig <=> exp_sig)")).count() == 0)
  }

  test("native word shingles == composed form on adversarial text") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Seq("a", "bb", "ccc", "éé", "中文", "the", "of")
    val cases = Seq("a a a", "the the the the", "  padded   words  here ",
      "a bb ccc éé 中文 the of a bb ccc") ++
      (1 to 50).map(_ => (0 until (3 + rnd.nextInt(40)))
        .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    val j = frames(cases.toDF("text"))
    assert(j.where(expr("NOT (act_sh <=> exp_sh)")).count() == 0)
    assert(j.where(expr("NOT (act_sig <=> exp_sig)")).count() == 0)
    // fewer than n words: empty set, empty-set sig is the family's B_j
    // constants? No — the composed form emits NO row; the native form
    // yields an empty sh and callers keep the size(w)>=3 filter, so the
    // only contract is: empty array in, sentinel mins out, no crash.
    val tiny = Seq("one two").toDF("text")
      .select(Dedup.wordShingleSetHash(TextFunctions.words(col("text")), 3).as("sh"))
      .collect()
    assert(tiny(0).getSeq[Long](0).isEmpty)
  }
}
