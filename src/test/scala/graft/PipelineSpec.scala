package graft

import org.apache.spark.sql.functions._

/** End-to-end curation pipeline: stage accounting + determinism. */
class PipelineSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("curate: stages are monotonically narrowing, split covers everything") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val out = Pipeline.curate(docs, qualityMinBp = 5000L)
    val report = out.report.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(report("0_raw") == docs.count())
    assert(report("1_exact_dedup") <= report("0_raw"))
    assert(report("2_near_dedup") <= report("1_exact_dedup"))
    assert(report("3_quality_floor") <= report("2_near_dedup"))
    assert(report("4_split") == report("3_quality_floor"))
    assert(report("4_split") > 0, "a real corpus must survive curation")

    val bydSplit = out.docs.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDefault(bydSplit, "train") + byDefault(bydSplit, "val") +
      byDefault(bydSplit, "test") == report("4_split"))
    assert(byDefault(bydSplit, "train") > byDefault(bydSplit, "test"),
      "train split must dominate at 90/5/5")
  }

  private def byDefault(m: Map[String, Long], k: String): Long = m.getOrElse(k, 0L)

  test("curate: deterministic across runs") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val a = Pipeline.curate(docs).docs.select("doc_id", "split")
      .collect().map(_.toString).sorted.toSeq
    val b = Pipeline.curate(docs).docs.select("doc_id", "split")
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("curate: planted exact duplicate is removed, keeper is the smallest id") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val dup = docs.filter(col("doc_id") === 7).withColumn("doc_id", lit(100007L))
    val out = Pipeline.curate(docs.unionByName(dup))
    val ids = out.docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(100007L), "the planted copy must be deduped away")
  }
}
