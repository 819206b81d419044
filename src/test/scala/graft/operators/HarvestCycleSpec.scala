package graft.operators

import graft.SparkSpec
import graft.geo.SyntheticGeo
import org.apache.spark.sql.functions._

/** End-to-end harvest-cycle composition invariants on real testdata. */
class HarvestCycleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val plan: HarvestCycle.Plan = {
    val pts = graft.Tables.t(spark, "/root/testdata/sf0.001", "events")
      .select(SyntheticGeo.lng.as("lng"), SyntheticGeo.lat.as("lat"),
        expr("ts DIV 1000000").as("ts_ms"))
    // two in-flight tiles: the first two leaves by id
    val leaves = GridOps.subdivide(pts, col("lng"), col("lat"), 3, 7, 200L)
      .withColumn("tile_id",
        HarvestCycle.tileId(col("z"), col("x"), col("y")))
    val inflight = leaves.select("tile_id").orderBy("tile_id").limit(2)
    val nowMs = pts.agg(max("ts_ms")).head.getLong(0) + 1000L
    HarvestCycle.plan(pts, col("lng"), col("lat"), col("ts_ms"),
      inflight, nowMs, staleAfterMs = 0L, batchSize = 7, limit = 40)
  }

  test("every selected task is a current leaf tile and not in-flight") {
    val leafIds = plan.grids.select("tile_id").as[Long].collect().toSet
    val taskIds = plan.tasks.select("tile_id").as[Long].collect()
    assert(taskIds.nonEmpty && taskIds.forall(leafIds.contains))
    val inflightIds = plan.grids.select("tile_id").orderBy("tile_id")
      .limit(2).as[Long].collect().toSet
    assert(taskIds.forall(id => !inflightIds.contains(id)))
  }

  test("batches are full except possibly the last; shared expiry") {
    val batches = plan.tasks.groupBy("batch_id")
      .agg(count(lit(1)).as("n"), countDistinct("expires_ms").as("ne"))
      .collect()
    assert(batches.forall(_.getAs[Long]("ne") == 1L))
    val sizes = batches.map(r => r.getAs[Long]("batch_id") -> r.getAs[Long]("n"))
      .sortBy(_._1)
    sizes.dropRight(1).foreach { case (_, n) => assert(n == 7L) }
    assert(sizes.last._2 <= 7L)
  }

  test("selection respects the limit and staleness ordering") {
    val tasks = plan.tasks.orderBy("batch_id", "tile_id").collect()
    assert(tasks.length <= 40)
    val report = plan.report.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(report("stale_selected") == tasks.length.toLong)
    assert(report("leaf_tiles") > 0 && report("points") > 0)
  }
}
