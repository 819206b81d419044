package graft.operators

import graft.SparkSpec
import graft.sources.Io
import org.apache.spark.sql.functions._

class ScaleToolsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals plain join on skewed data") {
    val left = (1 to 500).map(i => (if (i <= 450) 1L else i.toLong, i)).toDF("k", "v")
    val right = Seq((1L, "hot"), (5L, "cold"), (451L, "x")).toDF("k", "name")
    val expected = left.join(right, "k").select("k", "v", "name")
      .as[(Long, Int, String)].collect().toSet
    val got = SkewTools.saltedJoin(left, right, "k", nSalts = 8)
      .select("k", "v", "name").as[(Long, Int, String)].collect().toSet
    assert(got == expected && got.size == 451) // 450 hot + 1 cold match
  }

  test("saltedCount equals plain count") {
    val df = (1 to 300).map(i => Tuple1(if (i <= 290) "hot" else s"k$i")).toDF("k")
    val expected = df.groupBy("k").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toSet
    val got = SkewTools.saltedCount(df, "k", nSalts = 4).as[(String, Long)].collect().toSet
    assert(got == expected)
  }

  test("quadkey-partitioned write prunes partitions on prefix read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_io").toString
    val df = Seq((-120.0, 40.0, 1L), (30.0, -20.0, 2L), (150.0, 60.0, 3L)).toDF("lng", "lat", "id")
    Io.writeByQuadkey(df, dir, "lng", "lat", z = 2)
    val all = spark.read.parquet(dir)
    val prefixes = all.select("qk_prefix").distinct().as[String].collect().toSet
    assert(prefixes.size == 3) // three distinct z2 tiles
    val one = Io.readQuadkeyPrefix(spark, dir, prefixes.head)
    assert(one.count() == 1)
    // pruning happens at the partition level (PartitionFilters), not as a
    // row filter after the scan
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("StartsWith"))
    assert(plan.contains("PushedFilters: []"))
  }

  test("approx_count_distinct within rsd bounds at moderate cardinality") {
    val df = (1 to 2000).map(i => Tuple1(i % 500)).toDF("k")
    val approx = df.agg(approx_count_distinct(col("k"), 0.05)).as[Long].head()
    assert(math.abs(approx - 500) <= 500 * 0.15, s"approx=$approx")
  }
}
