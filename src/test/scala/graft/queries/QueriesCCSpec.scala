package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesCC pack (cross-split dedup, mixture
  * weights, sequence packing, OOV rate). */
class QueriesCCSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q319 cross dedup: pairs cross the split, jaccard in [0, 10000]") {
    val rows = SparkEntry.queries("q319_cross_dedup")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 15)
    def isEval(id: Long): Boolean = {
      val src = spark.read.parquet(s"$dir/documents.parquet")
        .where(org.apache.spark.sql.functions.col("doc_id") === id)
        .select("source").collect()(0).getString(0)
      src.drop(3).toInt % 5 == 0
    }
    rows.take(3).foreach { r =>
      assert(isEval(r.getAs[Long]("eval_doc")))
      assert(!isEval(r.getAs[Long]("train_doc")))
      val j = r.getAs[Long]("jac_bp")
      assert(j >= 0 && j <= 10000)
    }
  }

  test("q320 mixture: allocation conserves the 1M budget, √ dampens skew") {
    val rows = SparkEntry.queries("q320_mixture_weights")(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("alloc")).sum == 1000000L)
    // α=0.5 flattens: the max/min allocation ratio must be at most the
    // max/min token ratio
    val tokens = rows.map(_.getAs[Long]("tokens"))
    val allocs = rows.map(_.getAs[Long]("alloc"))
    assert(allocs.max.toDouble / allocs.min <=
      tokens.max.toDouble / tokens.min + 1e-9)
  }

  test("q321 packing: bins ≥ ceil(tokens/cap), util ≤ 1") {
    val rows = SparkEntry.queries("q321_seq_packing")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bins = r.getAs[Long]("n_bins"); val tok = r.getAs[Long]("tok_total")
      assert(bins >= (tok + 1999) / 2000, "can't beat the volume bound")
      assert(bins <= r.getAs[Long]("n_docs"), "next-fit never splits a doc")
      assert(r.getAs[Long]("util_micro") <= 1000000)
    }
  }

  test("q322 OOV: bp within [0, 10000] and eval tokens positive") {
    val rows = SparkEntry.queries("q322_oov_rate")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_eval_tokens") > 0)
      assert(r.getAs[Long]("n_oov") <= r.getAs[Long]("n_eval_tokens"))
      val bp = r.getAs[Long]("oov_bp")
      assert(bp >= 0 && bp <= 10000)
    }
  }
}
