package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants for the round-8 multimodal pack (q629-q632). Oracle parity
  * runs in the driver gate; these check the internal accounting the
  * oracle can't see (conservation, mergeability, keeper membership). */
class QueriesFESpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("q629 pair audit conserves the document census per source") {
    val out = SparkEntry.queries("q629_pair_integrity")(spark, dir).collect()
    assert(out.nonEmpty)
    // a doc appears in the audit unless BOTH sides are missing
    // (doc_id % 7 = 0 AND doc_id % 5 = 3)
    val expected = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("text").isNotNull)
      .where(expr("NOT (doc_id % 7 = 0 AND doc_id % 5 = 3)"))
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("n")).toMap
    out.foreach { r =>
      val total = r.getAs[Long]("n_paired") + r.getAs[Long]("n_media_only") +
        r.getAs[Long]("n_caption_only")
      assert(total == expected(r.getAs[String]("source")))
      val bp = r.getAs[Long]("paired_share_bp")
      assert(bp >= 0 && bp <= 10000)
    }
  }

  test("q630 shard manifests are XOR-mergeable to the global digest") {
    val out = SparkEntry.queries("q630_shard_manifest")(spark, dir).collect()
    assert(out.nonEmpty)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("text").isNotNull)
    assert(out.map(_.getAs[Long]("n_items")).sum == docs.count())
    // the shard digests fold into the same global digest a single
    // pass computes — the property that makes manifests mergeable
    val folded = out.map(_.getAs[Long]("xor_digest")).reduce(_ ^ _)
    val global = docs
      .select(graft.functions.TextFunctions.rollingFingerprint("text").as("h"))
      .agg(expr("bit_xor(h)")).head.getLong(0)
    assert(folded == global)
  }

  test("q631 aspect profile partitions the corpus and bands are honest") {
    val out = SparkEntry.queries("q631_aspect_profile")(spark, dir).collect()
    assert(out.nonEmpty)
    val n = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("text").isNotNull).count()
    assert(out.map(_.getAs[Long]("n")).sum == n)
    out.foreach { r =>
      assert(r.getAs[Long]("n_trainable") <= r.getAs[Long]("n"))
      // 'tall'/'wide' bands are untrainable by construction
      if (r.getAs[String]("band") == "tall" || r.getAs[String]("band") == "wide")
        assert(r.getAs[Long]("n_trainable") == 0L)
    }
  }

  test("q632 keeper is a largest-payload member; reclaim is consistent") {
    val out = SparkEntry.queries("q632_phash_keeper")(spark, dir).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("n_members") >= 2L) // clusters come from edges
      val reclaimed = r.getAs[Long]("bytes_reclaimed")
      assert(reclaimed >= 0 && reclaimed < r.getAs[Long]("bytes_total"))
      assert(r.getAs[Long]("keeper_id") >= r.getAs[Long]("cluster"))
    }
  }
}
