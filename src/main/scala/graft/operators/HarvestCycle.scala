package graft.operators

import graft.geo.QuadKey
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's end-to-end periodic collection cycle as ONE library
  * composition — the scraping-side counterpart of [[graft.Pipeline]]:
  *
  *   observed points → quadtree grid maintenance (subdivide hot tiles,
  *   `op_estimate_listings_or_divide_*`, operations/grids.py:20)
  *   → per-leaf last-scan bookkeeping (UBDCTask history)
  *   → stale-scan selection excluding in-flight tiles
  *     (operations/grids.py:80 periodical)
  *   → fixed-size task batches with a shared expiry
  *     (chunked group submission, calendars.py:84).
  *
  * Every stage is a shuffle-bounded DataFrame transform (no driver
  * loops); the composition is exactly what a scheduler would run per
  * beat over the accumulated 100 TB history.
  */
object HarvestCycle {

  final case class Plan(grids: DataFrame, tasks: DataFrame, report: DataFrame)

  /** Stable 64-bit tile id: zoom in the top bits, then x, then y. */
  def tileId(z: Column, x: Column, y: Column): Column =
    shiftleft(z.cast("long"), 48) + shiftleft(x, 24) + y

  /** @param points    observed listings: lngCol, latCol, tsMsCol
    * @param inflight  tiles with an unexpired submitted task: column `tile_id`
    * @param nowMs     cycle timestamp (drives staleness + expiry)
    * @return grids = current leaf tiles (z,x,y,c,tile_id,last_ts);
    *         tasks = batched work selection (tile_id, last_ts, batch_id,
    *                 expires_ms); report = one row per stage with counts. */
  def plan(points: DataFrame, lngCol: Column, latCol: Column, tsMsCol: Column,
           inflight: DataFrame, nowMs: Long,
           z0: Int = 3, zMax: Int = 7, threshold: Long = 200L,
           staleAfterMs: Long = 86400000L, batchSize: Int = 10,
           limit: Int = 100, taskTtlMs: Long = 3600000L): Plan = {

    // 1. grid maintenance: current leaves of the quadtree
    val leaves = GridOps.subdivide(points, lngCol, latCol, z0, zMax, threshold)
      .withColumn("tile_id", tileId(col("z"), col("x"), col("y")))

    // 2. last-scan per leaf: each point lands in exactly ONE leaf —
    // compute its tile at every level (bounded explode: zMax-z0+1 rows
    // per point) and equi-join the leaf set on (z, x, y).
    val ptTiles = points
      .select(QuadKey.tileX(lngCol, zMax).as("px"),
        QuadKey.tileY(latCol, zMax).as("py"), tsMsCol.as("ts_ms"))
      .select(col("ts_ms"), explode(sequence(lit(z0), lit(zMax))).as("z"),
        col("px"), col("py"))
      .select(col("ts_ms"), col("z"),
        expr(s"shiftright(px, $zMax - z)").as("x"),
        expr(s"shiftright(py, $zMax - z)").as("y"))
    val lastScan = ptTiles
      .join(leaves.select("z", "x", "y"), Seq("z", "x", "y"))
      .groupBy("z", "x", "y").agg(max("ts_ms").as("last_ts"))
    val grids = leaves.join(lastScan, Seq("z", "x", "y"), "left")

    // 3. stale selection, excluding in-flight tiles
    val stale = Relational.staleScan(
      grids.select("tile_id", "last_ts"), "tile_id", "last_ts",
      inflight.select("tile_id"), cutoffMs = nowMs - staleAfterMs,
      limit = limit)

    // 4. fixed-size batches, shared expiry per cycle (the window runs
    // over the already-limited selection — ≤ `limit` rows)
    val tasks = stale
      .withColumn("batch_id", expr(s"(row_number() OVER (ORDER BY " +
        s"last_ts ASC NULLS FIRST, tile_id) - 1) DIV $batchSize"))
      .withColumn("expires_ms", lit(nowMs + taskTtlMs))

    val spark = points.sparkSession
    import spark.implicits._
    val report = Seq(
      ("points", points.count()),
      ("leaf_tiles", grids.count()),
      ("stale_selected", tasks.count()),
      ("batches", tasks.select("batch_id").distinct().count()))
      .toDF("stage", "n")
    Plan(grids, tasks, report)
  }
}
