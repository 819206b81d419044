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
}
