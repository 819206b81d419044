package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Partition-invariance: the engine's results must not depend on the
  * physical partitioning — THE portability claim behind "tested on
  * local[32], deployed on 1000 executors". The FP-heavy queries are the
  * ones at risk (double addition is not associative): they survive
  * because every cross-partition aggregate goes through exact decimal
  * sums and every within-row fold is sequential. This spec runs them
  * under different shuffle-partition counts and asserts bit-identical
  * outputs. */
class DeterminismSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // the queries whose arithmetic would break first under reordering:
  // decimal aggregation (q01), per-dim centroid sums (q44, q45),
  // HOF quantization folds (q46), cosine pipelines (q34), window
  // decimal sums (q13b), portable sketches (q17, q96), component-sum
  // statistics (q84), subspace distance folds (q47)
  private val risky = Seq("q01_pricing_summary", "q44_centroid", "q45_kmeans_iter",
    "q46_quantize_int8", "q34_dedup_embedding", "q13b_range_window",
    "q17_approx_distinct", "q96_cms_heavy_hitters", "q84_stats_corr",
    "q47_pq_quantize", "q100_nearest_aoi", "q99_table_checksum",
    // round-4 late additions with IEEE-double formulas or sequential
    // mapPartitions passes: chi2 (q133), lift (q140), seasonal index
    // (q139), quantized matvec (q144), capped recurrences (q124, q149)
    "q133_chi2_ab", "q139_seasonal_index", "q140_cooccurrence",
    "q144_power_iteration", "q124_capped_balance", "q149_capped_sessions",
    // session-3 additions: EWMA is a sequential mapPartitions recurrence,
    // assortativity ends in a fixed-order IEEE division chain
    "q179_ewma", "q184_assortativity")

  test("FP-sensitive queries are bit-identical under different partitioning") {
    val mismatches = risky.flatMap { name =>
      def runWith(parts: Int): Seq[String] = {
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try SparkEntry.queries(name)(spark, dir).collect().map(_.toString).toSeq
        finally spark.conf.set("spark.sql.shuffle.partitions", 32)
      }
      val a = runWith(32)
      val b = runWith(5)
      val c = runWith(1)
      if (a == b && b == c) None
      else Some(s"$name diverges across partition counts " +
        s"(32: ${a.length} rows, 5: ${b.length}, 1: ${c.length})")
    }
    assert(mismatches.isEmpty, mismatches.mkString("\n"))
  }
}
