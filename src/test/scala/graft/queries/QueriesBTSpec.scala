package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesBT pack (corpus stats + PPJoin), including
  * the PPJoin COMPLETENESS proof vs an in-memory brute force. */
class QueriesBTSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q285 word-length histogram: per-lang shares sum to ~10000") {
    val rows = SparkEntry.queries("q285_word_len_hist")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, g) =>
      val s = g.map(_.getAs[Long]("share_bp")).sum
      assert(s >= 9990L && s <= 10000L)
    }
  }

  test("q286 TTR buckets: min/max inside the bucket's milli range") {
    val rows = SparkEntry.queries("q286_doc_ttr")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(r.getAs[Long]("min_ttr") >= b * 200)
      assert(r.getAs[Long]("max_ttr") <= b * 200 + 199)
      assert(r.getAs[Long]("min_ttr") <= r.getAs[Long]("max_ttr"))
    }
  }

  test("q287 hapax: vocab share >= token share, both in range") {
    val rows = SparkEntry.queries("q287_hapax")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("hapax_vocab_bp") >= r.getAs[Long]("hapax_token_bp"))
      assert(r.getAs[Long]("hapax_vocab_bp") <= 10000L)
      assert(r.getAs[Long]("hapax_words") <= r.getAs[Long]("vocab"))
    }
  }

  test("q288 PPJoin completeness: verified count equals brute-force J>=0.8 pairs") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("lang", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getString(2).trim.split("\\s+").filter(_.nonEmpty).toSet))
      .filter(_._3.nonEmpty)
    val brute = docs.groupBy(_._1).map { case (lang, ds) =>
      val pairs = for {
        (_, ia, sa) <- ds; (_, ib, sb) <- ds if ia < ib
        i = (sa & sb).size
        if i * 5 >= (sa.size + sb.size - i) * 4
      } yield 1
      lang -> pairs.size.toLong
    }
    val got = SparkEntry.queries("q288_prefix_filter_join")(spark, dir).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("n_verified")).toMap
    brute.foreach { case (lang, n) =>
      assert(got.getOrElse(lang, 0L) == n,
        s"prefix+size+positional filters lose no qualifying pair ($lang)")
    }
  }
}
