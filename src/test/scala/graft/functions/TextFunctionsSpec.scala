package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("words tokenizes on whitespace, empty-safe") {
    val df = Seq("  the quick  fox ", "", "one").toDF("text")
      .select(TextFunctions.words(col("text")).as("w"))
    assert(df.as[Seq[String]].collect().toSeq ==
      Seq(Seq("the", "quick", "fox"), Seq(), Seq("one")))
  }

  test("wordNgrams produces n-grams, short docs empty") {
    val df = Seq("a b c d", "a b").toDF("text")
      .select(TextFunctions.words(col("text")).as("w"))
      .select(TextFunctions.wordNgrams("w", 3).as("g"))
    assert(df.as[Seq[String]].collect().toSeq ==
      Seq(Seq("a b c", "b c d"), Seq()))
  }

  test("charNgrams slides over characters") {
    val df = Seq("abcd", "ab").toDF("t")
      .select(TextFunctions.charNgrams("t", 3).as("g"))
    assert(df.as[Seq[String]].collect().toSeq == Seq(Seq("abc", "bcd"), Seq()))
  }

  test("rollingFingerprint matches a hand-rolled fold") {
    val s = "spark"
    val expected = s.foldLeft(0L)((acc, ch) => (acc * 131 + ch) % 1000000007L)
    val got = Seq(s).toDF("t")
      .select(TextFunctions.rollingFingerprint("t")).as[Long].head()
    assert(got == expected)
  }

  test("null and whitespace-only text are safe through the text pipeline") {
    val df = Seq(Some("a b c"), None, Some("   "), Some("")).toDF("text")
    val out = df
      .select(TextFunctions.words(col("text")).as("w"))
      .select(col("w"), TextFunctions.wordNgrams("w", 3).as("g"))
      .as[(Option[Seq[String]], Option[Seq[String]])].collect()
    assert(out(0) == ((Some(Seq("a", "b", "c")), Some(Seq("a b c")))))
    assert(out(1) == ((None, None)))         // null text → null arrays, no crash
    assert(out(2) == ((Some(Seq()), Some(Seq()))))
    assert(out(3) == ((Some(Seq()), Some(Seq()))))
    // fingerprint of null is null; of empty is the fold seed (0)
    val fp = df.select(TextFunctions.rollingFingerprint("text"))
      .as[Option[Long]].collect()
    assert(fp(1).isEmpty && fp(3).contains(0L))
  }

  test("predictedLang breaks ties en > de > es > fr") {
    val df = Seq(
      (2, 1, 0, 0),   // en wins
      (1, 1, 1, 1),   // all tied → en
      (0, 2, 2, 0),   // de ties es → de
      (0, 0, 0, 1)    // fr wins
    ).toDF("s_en", "s_de", "s_es", "s_fr")
    assert(df.select(TextFunctions.predictedLang).as[String].collect().toSeq ==
      Seq("en", "en", "de", "fr"))
  }
}
