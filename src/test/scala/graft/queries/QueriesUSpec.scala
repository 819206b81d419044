package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesU pack. */
class QueriesUSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q99 checksum: detects a single-row mutation, invariant to row order") {
    val base = SparkEntry.queries("q99_table_checksum")(spark, dir).collect()
      .map(r => r.getAs[Long]("bucket") -> (r.getAs[Long]("n_rows"), r.getAs[Long]("xor60")))
      .toMap
    assert(base.nonEmpty)
    // row order must not matter: rerun with different partitioning
    spark.conf.set("spark.sql.shuffle.partitions", 3)
    val again = try SparkEntry.queries("q99_table_checksum")(spark, dir).collect()
      .map(r => r.getAs[Long]("bucket") -> (r.getAs[Long]("n_rows"), r.getAs[Long]("xor60")))
      .toMap
    finally spark.conf.set("spark.sql.shuffle.partitions", 32)
    assert(base == again, "checksum must be order/partitioning independent")
    // mutate one row in a copy → exactly that bucket's checksum changes
    val tmp = java.nio.file.Files.createTempDirectory("graft-ck").toString
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    import org.apache.spark.sql.functions._
    orders.withColumn("o_totalprice",
        when(col("o_orderkey") === 32, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")))
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val mutated = SparkEntry.queries("q99_table_checksum")(spark, tmp).collect()
      .map(r => r.getAs[Long]("bucket") -> (r.getAs[Long]("n_rows"), r.getAs[Long]("xor60")))
      .toMap
    val diff = base.keySet.filter(b => base(b) != mutated(b))
    assert(diff == Set(32L % 16), s"exactly the mutated bucket must differ, got $diff")
  }

  test("q80b grouping sets: slice totals reconcile") {
    val rows = SparkEntry.queries("q80b_grouping_sets")(spark, dir).collect()
    assert(rows.nonEmpty)
    val fine = rows.filter(r => r.getAs[Int]("g_status") == 0 && r.getAs[Int]("g_priority") == 0)
    val byStatus = rows.filter(r => r.getAs[Int]("g_status") == 0 && r.getAs[Int]("g_priority") == 1)
    val byPrio = rows.filter(r => r.getAs[Int]("g_status") == 1 && r.getAs[Int]("g_priority") == 0)
    assert(fine.nonEmpty && byStatus.nonEmpty && byPrio.nonEmpty)
    assert(fine.map(_.getAs[Long]("n")).sum == byStatus.map(_.getAs[Long]("n")).sum)
    assert(fine.map(_.getAs[Long]("n")).sum == byPrio.map(_.getAs[Long]("n")).sum)
    // per-status subtotal equals the sum of its fine rows
    byStatus.foreach { st =>
      val k = st.getAs[String]("status")
      assert(fine.filter(_.getAs[String]("status") == k).map(_.getAs[Long]("n")).sum ==
        st.getAs[Long]("n"))
    }
  }
}
