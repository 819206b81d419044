package graft.geo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Polygon union / dissolve on integer-vertex rectilinear geometry —
  * the ST_Union analog of the reference's AOI dissolve
  * (ubdc-airbnb managers.py:221 `aggregate(union=ST_Union("geom_3857"))`
  * unions AOI multipolygons before area/intersect reporting).
  *
  * Representation: every polygon arrives DECOMPOSED into axis-aligned
  * integer rectangles `(x0, x1, y0, y1)` (x0 < x1, y0 < y1, half-open
  * on both axes). Any rectilinear polygon — the AOI class the
  * reference's 3857 grid bookkeeping produces — decomposes exactly;
  * overlapping rectangles are precisely what union semantics must
  * collapse, so callers can hand over raw overlapping parts.
  *
  * Algorithm (exact, integer-only — no epsilon): vertical slab sweep.
  *   1. slab boundaries = distinct x edges per group;
  *   2. every rectangle spans whole slabs by construction (its own
  *      edges are slab boundaries), so cover = equi-ish range join
  *      rect × slab with `x0 <= xl AND x1 >= xr`;
  *   3. per (group, slab): 1-D interval union of the [y0, y1) spans —
  *      the q28 running-max idiom: contribution
  *      `max(0, y1 - max(y0, prevMax))`;
  *   4. area = Σ slab_width · union_len.
  *
  * Scale shape: AOI sets are dimension-sized (the reference stores them
  * in a Django table), so the slab domain is bounded by 2·|AOI| per
  * group; every window below is partitioned by (group, slab) or runs
  * over the bounded slab-boundary aggregate. The rect×slab join
  * broadcasts the slab side (bounded). Facts never enter this operator
  * — dissolve the dims, then join facts against the dissolved output.
  */
object PolyUnion {

  /** Dissolved union area per group.
    *
    * @param rects columns: groupCols ++ (x0, x1, y0, y1) integer rects
    * @return DataFrame(groupCols..., n_parts BIGINT, sum_part_area
    *         BIGINT, union_area BIGINT) — sum_part_area double-counts
    *         overlap, union_area does not; equal iff parts disjoint.
    */
  def dissolveArea(rects: DataFrame, groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    val parts = rects.groupBy(g: _*)
      .agg(count(lit(1)).as("n_parts"),
        sum((col("x1") - col("x0")) * (col("y1") - col("y0")))
          .cast("bigint").as("sum_part_area"))
    val xs = rects.select(g :+ col("x0").as("x"): _*)
      .unionByName(rects.select(g :+ col("x1").as("x"): _*))
      .distinct()
    val slabs = xs
      .withColumn("xr", lead("x", 1).over(
        Window.partitionBy(g: _*).orderBy("x")))
      .where(col("xr").isNotNull)
      .select(g ++ Seq(col("x").as("xl"), col("xr")): _*)
    val cover = rects.join(broadcast(slabs), groupCols)
      .where(col("x0") <= col("xl") && col("x1") >= col("xr"))
    val wSpan = Window.partitionBy(g ++ Seq(col("xl")): _*)
      .orderBy("y0", "y1")
    val contrib = cover
      .withColumn("prevMax", max("y1").over(
        wSpan.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("seg", greatest(
        col("y1") - greatest(col("y0"), coalesce(col("prevMax"), col("y0"))),
        lit(0L)))
    val area = contrib
      .groupBy(g ++ Seq(col("xl"), col("xr")): _*)
      .agg(sum("seg").as("ylen"))
      .groupBy(g: _*)
      .agg(sum((col("xr") - col("xl")) * col("ylen"))
        .cast("bigint").as("union_area"))
    parts.join(area, groupCols)
  }

  /** Single global union area over all rects (1-row frame). */
  def unionArea(rects: DataFrame): DataFrame =
    dissolveArea(rects.withColumn("_pu_g", lit(1)), Seq("_pu_g"))
      .drop("_pu_g")

  /** ST_Intersection with GEOMETRY output: the clipped rectangle parts
    * of A∩B per group. Rect∩rect is a rect, so the clipped parts ARE
    * the intersection's decomposition — feed them back through
    * [[dissolveArea]] for the exact intersection area (overlapping
    * clip parts collapse there; neither input needs pre-dissolving).
    * Reference analog: managers.py:308's grid∩AOI — the predicate form
    * (q20/q25) kept only the boolean; this emits the clipped shapes. */
  def clipParts(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    val bR = b.select(g ++ Seq(col("x0").as("_pu_bx0"), col("x1").as("_pu_bx1"),
      col("y0").as("_pu_by0"), col("y1").as("_pu_by1")): _*)
    a.join(bR, groupCols)
      .select(g ++ Seq(
        greatest(col("x0"), col("_pu_bx0")).as("x0"),
        least(col("x1"), col("_pu_bx1")).as("x1"),
        greatest(col("y0"), col("_pu_by0")).as("y0"),
        least(col("y1"), col("_pu_by1")).as("y1")): _*)
      .where(col("x0") < col("x1") && col("y0") < col("y1"))
  }

  /** Exact intersection area per group: dissolve of [[clipParts]]. */
  def intersectionArea(a: DataFrame, b: DataFrame,
                       groupCols: Seq[String]): DataFrame =
    dissolveArea(clipParts(a, b, groupCols), groupCols)
      .select((groupCols.map(col) :+
        col("union_area").as("intersection_area")): _*)

  /** The same slab sweep as ANSI SQL over a `rects` relation with
    * columns (grp, x0, x1, y0, y1) — the DuckDB oracle form. */
  def dissolveAreaSql(rectsRel: String): String = s"""
    WITH r AS (SELECT * FROM $rectsRel),
    parts AS (
      SELECT grp, count(*) AS n_parts,
             CAST(sum((x1 - x0) * (y1 - y0)) AS BIGINT) AS sum_part_area
      FROM r GROUP BY 1),
    xs AS (
      SELECT DISTINCT grp, x FROM (
        SELECT grp, x0 AS x FROM r UNION SELECT grp, x1 FROM r)),
    slabs AS (
      SELECT grp, x AS xl,
             lead(x) OVER (PARTITION BY grp ORDER BY x) AS xr
      FROM xs),
    cover AS (
      SELECT r.grp, s.xl, s.xr, r.y0, r.y1
      FROM r JOIN slabs s ON r.grp = s.grp
      WHERE s.xr IS NOT NULL AND r.x0 <= s.xl AND r.x1 >= s.xr),
    seg AS (
      SELECT grp, xl, xr,
             greatest(y1 - greatest(y0, coalesce(max(y1) OVER (
               PARTITION BY grp, xl ORDER BY y0, y1
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), y0)), 0)
               AS seg
      FROM cover),
    slab_len AS (
      SELECT grp, xl, xr, sum(seg) AS ylen FROM seg GROUP BY 1, 2, 3),
    area AS (
      SELECT grp, CAST(sum((xr - xl) * ylen) AS BIGINT) AS union_area
      FROM slab_len GROUP BY 1)
    SELECT p.grp, p.n_parts, p.sum_part_area, a.union_area
    FROM parts p JOIN area a ON p.grp = a.grp"""
}
