package graft.queries

import graft.{SparkEntry, SparkSpec}
import graft.functions.PortableHash
import org.apache.spark.sql.functions._

/** Invariants for the QueriesAJ pack. */
class QueriesAJSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q155 incremental dedup: every reported doc is in the batch split, matches in corpus") {
    val rows = SparkEntry.queries("q155_incremental_dedup")(spark, dir).collect()
    assert(rows.nonEmpty)
    val split = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        pmod(PortableHash.md5Long(col("doc_id"), salt = "inc~"), lit(5L)).as("h"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1) == 0L)).toMap
    rows.foreach { r =>
      assert(split(r.getAs[Long]("bid")), "bid must be a batch doc")
      assert(!split(r.getAs[Long]("best_match")), "best_match must be a corpus doc")
      assert(r.getAs[Long]("n_strong") <= r.getAs[Long]("n_cand"))
      assert(r.getAs[Long]("best_jac_bp") <= 10000L)
    }
  }

  test("q156 z-order layout beats (or ties) naive key order on at least one dimension") {
    val r = SparkEntry.queries("q156_zorder_layout")(spark, dir).collect().head
    assert(r.getAs[Long]("z_files") > 1 && r.getAs[Long]("naive_files") > 1)
    // z-ordering must reduce combined spread vs naive layout
    val zTotal = r.getAs[Long]("z_price_spread") + r.getAs[Long]("z_qty_spread")
    val nTotal = r.getAs[Long]("naive_price_spread") + r.getAs[Long]("naive_qty_spread")
    assert(zTotal < nTotal,
      s"z-order should cluster better: z=$zTotal naive=$nTotal")
  }

  test("q157 lateness: shares sum to ~10000 bp; delayed rows produce non-zero bands") {
    val rows = SparkEntry.queries("q157_lateness_profile")(spark, dir).collect()
    assert(rows.length >= 2, "simulated disorder must yield several bands")
    val tot = rows.map(_.getAs[Number]("share_bp").longValue).sum
    assert(tot >= 10000 - rows.length && tot <= 10000)
    assert(rows.map(_.getAs[Number]("band").longValue).contains(0L))
  }

  test("q158 robust z-score: outlier rate is small and bounds hold") {
    val rows = SparkEntry.queries("q158_robust_zscore")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_outliers") <= r.getAs[Long]("n"))
      assert(r.getAs[Long]("outlier_bp") <= 10000L)
    }
    // global: with MAD-based 3.5-sigma rule, outliers must be a minority
    val n = rows.map(_.getAs[Long]("n")).sum
    val o = rows.map(_.getAs[Long]("n_outliers")).sum
    assert(o * 4 < n, s"outliers=$o of $n")
  }
}
