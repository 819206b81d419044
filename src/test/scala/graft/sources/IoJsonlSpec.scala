package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class IoJsonlSpec extends SparkSpec {

  test("JSONL round-trip preserves rows; corrupt lines quarantine instead of failing") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    val docs = Seq(
      (1L, "hello world", "en"),
      (2L, "schöne grüße ☃", "de"),
      (3L, "", "en"))
      .toDF("doc_id", "text", "lang")
    Io.writeJsonl(docs, s"$dir/out", nParts = 2)

    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType)))
    val back = Io.readJsonl(spark, s"$dir/out", schema).cache()
    assert(back.filter(col("_corrupt").isNotNull).count() == 0)
    val a = docs.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = back.select("doc_id", "text", "lang").orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    assert(a == b)

    // corrupt line: quarantined into _corrupt, valid rows still parse
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/bad.jsonl"),
      """{"doc_id": 9, "text": "ok", "lang": "en"}
        |{not json at all
        |""".stripMargin)
    val mixed = Io.readJsonl(spark, s"$dir/bad.jsonl", schema).cache()
    assert(mixed.filter(col("_corrupt").isNotNull).count() == 1)
    assert(mixed.filter(col("_corrupt").isNull && col("doc_id") === 9).count() == 1)
  }
}
