package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesX pack. */
class QueriesXSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q101 BPE merge: winner verified against an independent Scala recount") {
    val words = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("text").collect()
      .flatMap(_.getAs[String]("text").trim.split("\\s+")).filter(_.nonEmpty)
    val pairFreq = scala.collection.mutable.Map.empty[String, Long]
    words.foreach { w =>
      (0 until w.length - 1).foreach { i =>
        val p = w.substring(i, i + 2)
        pairFreq(p) = pairFreq.getOrElse(p, 0L) + 1
      }
    }
    val (expPair, expN) = pairFreq.toSeq.minBy { case (p, n) => (-n, p) }

    val r = SparkEntry.queries("q101_bpe_merge")(spark, dir).collect().head
    assert(r.getAs[String]("top_pair") == expPair)
    assert(r.getAs[Long]("top_n") == expN)
    assert(r.getAs[Long]("pairs_before") == pairFreq.values.sum)
    assert(r.getAs[Long]("pairs_after") < r.getAs[Long]("pairs_before"),
      "the merge must destroy at least the winning pair's occurrences")
    // each APPLIED merge lowers the total pair count by exactly one; the
    // number of applied merges is at most the occurrence count (overlapping
    // occurrences of the same pair can't all merge)
    assert(r.getAs[Long]("n_affected") >= 1 && r.getAs[Long]("n_affected") <= expN)
  }

  test("q102 token budget: greedy fill takes exactly half the corpus tokens") {
    val rows = SparkEntry.queries("q102_token_budget")(spark, dir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("bin_tokens")).sum
    val taken = rows.map(_.getAs[Long]("take_tokens")).sum
    assert(taken == total / 2, s"allocated $taken of budget ${total / 2}")
    rows.foreach { r =>
      val bp = r.getAs[Long]("sample_bp")
      assert(bp >= 0 && bp <= 10000)
      assert(r.getAs[Long]("take_tokens") <= r.getAs[Long]("bin_tokens"))
    }
    // greedy: at most one bin is fractional (0 < bp < 10000)
    assert(rows.count(r => {
      val bp = r.getAs[Long]("sample_bp"); bp > 0 && bp < 10000
    }) <= 1)
  }

  test("q103 DQ audit: clean source passes; planted violations are counted") {
    val r = SparkEntry.queries("q103_dq_audit")(spark, dir).collect().head
    assert(r.getAs[Boolean]("pass"), s"driver testdata must audit clean: $r")
    // plant violations in a copy: one dup key, one null custkey, one bad price
    val tmp = java.nio.file.Files.createTempDirectory("graft-dq").toString
    import org.apache.spark.sql.functions._
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val bad = o.limit(1).withColumn("o_custkey", lit(null).cast("bigint"))
      .withColumn("o_totalprice", lit(-5.0))
    o.unionByName(bad).write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val r2 = SparkEntry.queries("q103_dq_audit")(spark, tmp).collect().head
    assert(!r2.getAs[Boolean]("pass"))
    assert(r2.getAs[Long]("null_custkey") == 1)
    assert(r2.getAs[Long]("nonpositive_price") == 1)
    assert(r2.getAs[Long]("duplicate_key_rows") == 2, "both copies of the dup key count")
  }

  test("q104 skew report: gini matches an independent computation, bounds hold") {
    val counts = graft.Tables.t(spark, dir, "events")
      .selectExpr("event_type", "user_id").collect()
      .groupBy(r => (r.getString(0), r.getLong(1))).view.mapValues(_.length.toLong)
      .toSeq.groupBy(_._1._1)
    val rows = SparkEntry.queries("q104_skew_report")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cs = counts(r.getAs[String]("event_type")).map(_._2).sorted
      val n = cs.length.toLong
      val total = cs.sum
      val rc = cs.zipWithIndex.map { case (c, i) => (i + 1) * c }.sum
      val gini = (2 * rc - (n + 1) * total) * 10000 / (n * total)
      assert(r.getAs[Long]("gini_bp") == gini, s"gini for ${r.getString(0)}")
      assert(gini >= 0 && gini < 10000)
      assert(r.getAs[Long]("top_share_bp") >= 10000 / r.getAs[Long]("n_keys"))
    }
  }
}
