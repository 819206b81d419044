package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Asserts that the quadkey layout Io encodes actually PRUNES: an
  * AOI-scoped read touches a small fraction of the partition
  * directories, measured from the scan node's selected partitions — not
  * just from the plan string mentioning PartitionFilters. */
class IoPruningSpec extends SparkSpec {
  import spark.implicits._

  test("AOI-scoped read scans a small fraction of quadkey partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_prune").toString
    // points spread across the globe → many z3 tiles (8×8 grid)
    val pts = (1 to 2000).map { i =>
      val lng = ((i * 47) % 3600) / 10.0 - 180.0 + 0.005
      val lat = ((i * 31) % 1700) / 10.0 - 85.0 + 0.005
      (lng, lat, i.toLong)
    }.toDF("lng", "lat", "id")
    Io.writeByQuadkey(pts, dir, "lng", "lat", z = 3)

    val total = spark.read.parquet(dir)
      .select("qk_prefix").distinct().count()
    assert(total >= 20, s"want a multi-partition layout, got $total dirs")

    // AOI-scoped query: one z3 tile prefix
    val prefix = spark.read.parquet(dir).select("qk_prefix")
      .distinct().orderBy("qk_prefix").as[String].head()
    val aoi = Io.readQuadkeyPrefix(spark, dir, prefix)
      .groupBy("qk_prefix").agg(count(lit(1)).as("n"))
    aoi.collect()

    // walk through AQE wrappers to the materialized scan node
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: QueryStageExec => walk(s.plan)
      case _ => p.children.flatMap(walk)
    })
    val scans = walk(aoi.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "no FileSourceScanExec in plan")
    val scanned = scans.map(_.selectedPartitions.partitionCount).sum
    info(s"scanned $scanned of $total partition dirs " +
      f"(${scanned * 100.0 / total}%.1f%%)")
    assert(scanned == 1,
      s"partition pruning failed: scanned $scanned of $total dirs")
  }
}
