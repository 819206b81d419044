package graft.expressions

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The native one-pass winnower must be value-identical to the composed
  * posexplode/rollingFingerprint/window-min/distinct pipeline it replaced
  * (q494's oracle keeps the composed form in DuckDB). */
class WinnowFpsSpec extends SparkSpec {

  private def check(df0: org.apache.spark.sql.DataFrame, n: Int, win: Int): Unit = {
    val df = df0.withColumn("rid", monotonically_increasing_id()).cache()
    val w = Window.partitionBy("rid").orderBy("pos").rowsBetween(0, win - 1)
    val composed = df
      .select(col("rid"),
        posexplode(TextFunctions.charNgrams("text", n)).as(Seq("pos", "g")))
      .withColumn("h", TextFunctions.rollingFingerprint("g"))
      .withColumn("fp", min("h").over(w))
      .select(col("rid"), col("fp")).distinct()
      .groupBy("rid").agg(sort_array(collect_list("fp")).as("expected"))
    val actual = df.select(col("rid"),
      TextFunctions.winnowFps(col("text"), n, win).as("actual"))
    // rows shorter than n: composed emits nothing, native an empty array
    val diff = composed.join(actual, "rid")
      .where(expr("NOT (actual <=> expected)"))
    assert(diff.count() == 0)
    val empt = actual.join(composed, Seq("rid"), "left_anti")
      .where(size(col("actual")) =!= 0)
    assert(empt.count() == 0)
    df.unpersist()
  }

  test("native winnow == composed form on every real document") {
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select("text")
    check(docs, 5, 4)
  }

  test("native winnow == composed form on adversarial text") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val alphabet = "ab @é中"
    val emoji = new String(Character.toChars(0x1F600))
    val cases = Seq("", "abc", "abcde", "aaaaaaaaaaaaaaa",
      emoji * 7 + "abcd", "héllo wörld " * 15, "中文字符中文字符abcd中文") ++
      (1 to 60).map(_ => (0 until rnd.nextInt(80))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    check(cases.toDF("text"), 5, 4)
    check(cases.toDF("text"), 3, 2)
  }
}
