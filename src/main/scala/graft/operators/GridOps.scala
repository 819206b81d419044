package graft.operators

import graft.geo.QuadKey
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quadtree grid refinement, the Spark-first re-expression of the
  * reference's recursive estimate-or-divide flow
  * (/root/reference/src/ubdc_airbnb/ubdc_airbnb/operations/grids.py:20
  * `op_estimate_listings_or_divide_at_grid`, utils/grids.py:22 dedup).
  *
  * The reference recurses tile-by-tile with one count per HTTP call; here
  * the whole refinement is ONE aggregation of the points at the deepest
  * zoom plus (zMax - z0) tiny roll-ups — at 100 TB the single shuffle on
  * the point set dominates and the per-level roll-ups operate on tile
  * counts (≤ #distinct tiles), not points.
  *
  * Output semantics (deterministic, oracle-checkable): a tile (z, x, y)
  * with point-count c is a leaf iff
  *   - z == z0 and c <= threshold, or
  *   - z0 < z <= zMax, parent count > threshold, and (c <= threshold or
  *     z == zMax).
  * Count monotonicity (child ⊆ parent) makes the local parent condition
  * equivalent to "every ancestor was split".
  */
object GridOps {

  /** @return DataFrame(z: int, x: long, y: long, c: long) of leaf tiles. */
  def subdivide(points: DataFrame, lngCol: Column, latCol: Column,
                z0: Int, zMax: Int, threshold: Long): DataFrame = {
    require(z0 >= 0 && zMax >= z0)
    // one pass over the points: counts at the deepest zoom
    val deepest = points
      .select(QuadKey.tileX(lngCol, zMax).as("x"), QuadKey.tileY(latCol, zMax).as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("c"))
    // every level in ONE reaggregation of the deepest-zoom counts:
    // floor-halving composes, so truncating a zMax tile by (zMax - z)
    // bits IS the z-level tile of the same point. Explodes only the
    // constant level array (cheap generator child), then re-groups —
    // the exploded set is #tiles × #levels rows (tile counts, not
    // points), tiny at any data scale next to the point shuffle above.
    val tiles = deepest
      .select(explode(sequence(lit(z0), lit(zMax))).as("z"),
        col("x"), col("y"), col("c"))
      .select(col("z"), expr(s"shiftright(x, $zMax - z)").as("x"),
        expr(s"shiftright(y, $zMax - z)").as("y"), col("c"))
      .groupBy("z", "x", "y").agg(sum("c").as("c"))
    // the parent's count is exactly the sum of its present children's
    // counts (every point of the parent lands in one child tile), so the
    // parent lookup is a sibling-sum WINDOW over the tile table — one
    // extra shuffle of tile counts, no self-join, no cached intermediate.
    val siblings = Window.partitionBy(col("z"),
      expr("shiftright(x, 1)"), expr("shiftright(y, 1)"))
    tiles
      .withColumn("pc", sum(col("c")).over(siblings))
      .filter(
        (col("z") === z0 && col("c") <= threshold) ||
          (col("z") > z0 && col("pc") > threshold &&
            (col("c") <= threshold || col("z") === zMax)))
      .select(col("z").cast("int").as("z"), col("x"), col("y"), col("c"))
  }

  /** Oracle SQL mirror: per-level tile counts straight from the points
    * (floor composition makes this equal to the rolled-up form). */
  def subdivideSql(pointsSql: String, lngE: String, latE: String,
                   z0: Int, zMax: Int, threshold: Long): String = {
    val perLevel = (z0 to zMax).map { z =>
      s"SELECT $z AS z, ${QuadKey.tileXSql(lngE, z)} AS x, ${QuadKey.tileYSql(latE, z)} AS y FROM pts"
    }.mkString(" UNION ALL ")
    s"""WITH pts AS ($pointsSql),
        tiles AS (SELECT z, x, y, count(*) AS c FROM ($perLevel) GROUP BY 1, 2, 3)
        SELECT CAST(t.z AS INT) AS z, t.x AS x, t.y AS y, t.c AS c
        FROM tiles t LEFT JOIN tiles p
          ON p.z = t.z - 1 AND p.x = (t.x >> 1) AND p.y = (t.y >> 1)
        WHERE (t.z = $z0 AND t.c <= $threshold)
           OR (t.z > $z0 AND p.c > $threshold AND (t.c <= $threshold OR t.z = $zMax))"""
  }
}
