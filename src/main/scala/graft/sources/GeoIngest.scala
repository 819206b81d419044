package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WKT / GeoJSON polygon ingestion → the engine's edge-table geometry
  * representation, with a corrupt-geometry quarantine mirroring
  * [[Io.readJsonl]]'s PERMISSIVE path.
  *
  * Reference analog: add-aoi.py loads AOI geometry from a GeoJSON file
  * (GEOSGeometry) and list-aoi.py emits it back; this is the ingest
  * half re-expressed Spark-first. Parsing is pure `functions._`
  * column work (regexp/split/transform/from_json) — no UDFs, fully
  * codegen'd, distributes over any number of AOI files.
  *
  * Validity rules (either format): at least one ring; every ring has
  * ≥ 4 points; every coordinate parses numeric; every ring is closed
  * (first point == last point). Invalid rows land in the quarantine
  * frame with the raw payload intact — count them, alert, keep going.
  */
object GeoIngest {

  /** vertices schema: (id, ring, idx, x, y) — closing vertex retained,
    * so consecutive (idx, idx+1) pairs enumerate every edge. */
  private val ringsCol = "_gi_rings" // array<array<array<double>>>

  private def finishParse(df: DataFrame, idCol: String, rawCol: String)
      : (DataFrame, DataFrame) = {
    val ringOk = "r -> size(r) >= 4 AND " +
      "size(filter(r, p -> p[0] IS NULL OR p[1] IS NULL)) = 0 AND " +
      "element_at(r, 1)[0] = element_at(r, -1)[0] AND " +
      "element_at(r, 1)[1] = element_at(r, -1)[1]"
    val valid = col(ringsCol).isNotNull &&
      expr(s"size($ringsCol) >= 1") &&
      expr(s"size(filter($ringsCol, $ringOk)) = size($ringsCol)")
    val ok = df.where(valid)
    val vertices = ok
      .select(col(idCol), posexplode(col(ringsCol)).as(Seq("ring", "_pts")))
      .select(col(idCol), col("ring"), posexplode(col("_pts")).as(Seq("idx", "_p")))
      .select(col(idCol), col("ring").cast("int").as("ring"),
        col("idx").cast("int").as("idx"),
        col("_p").getItem(0).as("x"), col("_p").getItem(1).as("y"))
    val corrupt = df.where(!valid || col(ringsCol).isNull)
      .select(col(idCol), col(rawCol).as("raw"))
    (vertices, corrupt)
  }

  /** Parse a WKT `POLYGON ((x y, ...), (hole ...))` column.
    * @return (vertices(id, ring, idx, x, y), corrupt(id, raw)) */
  def parseWktPolygons(df: DataFrame, idCol: String, wktCol: String)
      : (DataFrame, DataFrame) = {
    val inner = regexp_extract(col(wktCol),
      "^\\s*POLYGON\\s*\\(\\s*(\\(.*\\))\\s*\\)\\s*$", 1)
    val withInner = df.withColumn("__gi_inner", inner)
      .withColumn(ringsCol,
        // "(a),(b)" → rings → points → [x, y] doubles (null on junk)
        when(col("__gi_inner") === "", lit(null)).otherwise(expr(
          """transform(
               split(regexp_replace(__gi_inner, '^\\(|\\)$', ''),
                     '\\)\\s*,\\s*\\('),
               ring -> transform(split(ring, '\\s*,\\s*'),
                 p -> transform(split(trim(p), '\\s+'),
                   c -> TRY_CAST(c AS DOUBLE))))""")))
      .drop("__gi_inner")
    finishParse(withInner, idCol, wktCol)
  }

  /** Parse a GeoJSON `{"type":"Polygon","coordinates":[[[x,y],...]]}`
    * column. @return (vertices(id, ring, idx, x, y), corrupt(id, raw)) */
  def parseGeoJsonPolygons(df: DataFrame, idCol: String, jsonCol: String)
      : (DataFrame, DataFrame) = {
    val schema = StructType(Seq(
      StructField("type", StringType),
      StructField("coordinates",
        ArrayType(ArrayType(ArrayType(DoubleType))))))
    val parsed = df.withColumn("_gi_g", from_json(col(jsonCol), schema))
      .withColumn(ringsCol,
        when(col("_gi_g.type") === "Polygon", col("_gi_g.coordinates"))
          .otherwise(lit(null)))
      .drop("_gi_g")
    finishParse(parsed, idCol, jsonCol)
  }

  /** Emit half (list-aoi.py analog): vertices → WKT POLYGON text, one
    * row per id. Ring and vertex order restored via sort_array on the
    * collected (idx, x, y) structs — the parse→emit→parse round trip
    * is vertex-exact (string formatting of doubles differs, parsed
    * geometry does not). */
  def toWkt(vertices: DataFrame, idCol: String): DataFrame = {
    val rings = vertices
      .groupBy(col(idCol), col("ring"))
      .agg(sort_array(collect_list(struct(col("idx"), col("x"), col("y"))))
        .as("_pts"))
      .withColumn("_rt", concat(lit("("), array_join(expr(
        "transform(_pts, p -> concat(CAST(p.x AS STRING), ' ', CAST(p.y AS STRING)))"),
        ", "), lit(")")))
    rings.groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("ring"), col("_rt")))).as("_rs"))
      .withColumn("wkt", concat(lit("POLYGON ("),
        array_join(expr("transform(_rs, r -> r._rt)"), ", "), lit(")")))
      .select(col(idCol), col("wkt"))
  }

  /** Emit: vertices → GeoJSON Polygon text, one row per id. */
  def toGeoJson(vertices: DataFrame, idCol: String): DataFrame = {
    val rings = vertices
      .groupBy(col(idCol), col("ring"))
      .agg(sort_array(collect_list(struct(col("idx"), col("x"), col("y"))))
        .as("_pts"))
      .withColumn("_coords", expr("transform(_pts, p -> array(p.x, p.y))"))
    rings.groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("ring"), col("_coords"))))
        .as("_rs"))
      .withColumn("geojson", to_json(struct(
        lit("Polygon").as("type"),
        expr("transform(_rs, r -> r._coords)").as("coordinates"))))
      .select(col(idCol), col("geojson"))
  }

  /** Edge table from a vertices frame: one row per directed boundary
    * segment (consecutive vertices within a ring; the retained closing
    * vertex supplies the wrap-around edge). */
  def edges(vertices: DataFrame, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol), col("ring")).orderBy("idx")
    vertices
      .withColumn("x2", lead("x", 1).over(w))
      .withColumn("y2", lead("y", 1).over(w))
      .where(col("x2").isNotNull)
      .select(col(idCol), col("ring"), col("idx").as("seg"),
        col("x").as("x1"), col("y").as("y1"), col("x2"), col("y2"))
  }
}
