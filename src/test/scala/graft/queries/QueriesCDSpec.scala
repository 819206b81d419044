package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesCD pack (Wilcoxon, delta bits,
  * Wasserstein, distributed top-k). */
class QueriesCDSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q323 Wilcoxon: W+ + W- = n(n+1)/2 (rank conservation)") {
    val rows = SparkEntry.queries("q323_wilcoxon")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_pairs")
      assert(r.getAs[Long]("w_plus") + r.getAs[Long]("w_minus")
        == n * (n + 1) / 2)
      val e = r.getAs[Long]("effect_micro")
      assert(e >= -1000000 && e <= 1000000)
    }
  }

  test("q324 delta bits: 1 ≤ avg bits ≤ 64, ratio consistent") {
    val rows = SparkEntry.queries("q324_delta_bits")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val avg = r.getAs[Long]("avg_bits_micro")
      assert(avg >= 1000000 && avg <= 64000000)
      assert(r.getAs[Long]("ratio_bp") <= 10000)
    }
  }

  test("q325 Wasserstein: zero iff source matches global; all ≥ 0") {
    val rows = SparkEntry.queries("q325_wasserstein")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("emd_num") >= 0)
      assert(r.getAs[Long]("emd_milli") >= 0)
    }
    // real per-source distributions differ from pooled: at least one > 0
    assert(rows.exists(_.getAs[Long]("emd_num") > 0))
  }

  test("q326 two-phase top-k equals the direct top-k") {
    val twoPhase = SparkEntry.queries("q326_partition_topk")(spark, dir).collect()
    assert(twoPhase.length == 5)
    import org.apache.spark.sql.functions._
    val direct = spark.read.parquet(s"$dir/lineitem.parquet")
      .selectExpr("l_partkey",
        "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents")
      .groupBy("l_partkey").agg(sum("cents").as("rev"))
      .orderBy(col("rev").desc, col("l_partkey")).limit(5).collect()
    assert(twoPhase.map(r => (r.getAs[Long]("l_partkey"), r.getAs[Long]("rev"))).toSeq
      == direct.map(r => (r.getAs[Long]("l_partkey"), r.getAs[Long]("rev"))).toSeq)
  }
}
