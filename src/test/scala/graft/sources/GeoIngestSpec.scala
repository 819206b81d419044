package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GeoIngestSpec extends SparkSpec {
  import GeoIngest._

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("id", "g")
  }

  test("WKT: simple polygon parses to closed vertex ring") {
    val (v, c) = parseWktPolygons(
      df((1L, "POLYGON ((0 0, 4 0, 4 3, 0 3, 0 0))")), "id", "g")
    assert(c.count() == 0)
    val pts = v.orderBy("idx").select("x", "y").collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    assert(pts == Seq((0.0, 0.0), (4.0, 0.0), (4.0, 3.0), (0.0, 3.0), (0.0, 0.0)))
  }

  test("WKT: polygon with hole yields two rings") {
    val (v, c) = parseWktPolygons(df(
      (1L, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")),
      "id", "g")
    assert(c.count() == 0)
    assert(v.select("ring").distinct().count() == 2)
    assert(v.where(col("ring") === 1).count() == 5)
  }

  test("WKT: whitespace variants parse") {
    val (v, c) = parseWktPolygons(df(
      (1L, "  POLYGON  (( 0 0 ,4 0, 4 3 ,0 3,0 0 ))  ")), "id", "g")
    assert(c.count() == 0 && v.count() == 5)
  }

  test("WKT corrupt cohort quarantines with raw payload; good rows survive") {
    val (v, c) = parseWktPolygons(df(
      (1L, "POLYGON ((0 0, 4 0, 4 3, 0 3, 0 0))"),
      (2L, "POLYGON ((broken"),                       // truncated
      (3L, "POLYGON ((0 0, 1 0, 0 0))"),              // < 4 points
      (4L, "POLYGON ((0 0, 4 0, 4 3, 0 3, 1 1))"),    // not closed
      (5L, "POLYGON ((0 0, a b, 4 3, 0 3, 0 0))"),    // non-numeric
      (6L, "LINESTRING (0 0, 1 1)")),                 // wrong type
      "id", "g")
    assert(v.select("id").distinct().collect().map(_.getLong(0)).toSet == Set(1L))
    val bad = c.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(bad.keySet == Set(2L, 3L, 4L, 5L, 6L))
    assert(bad(2L) == "POLYGON ((broken")
  }

  test("GeoJSON: polygon parses and agrees with the WKT form") {
    val (vw, _) = parseWktPolygons(
      df((1L, "POLYGON ((0 0, 4 0, 4 3, 0 3, 0 0))")), "id", "g")
    val (vg, cg) = parseGeoJsonPolygons(df(
      (1L, """{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,3],[0,3],[0,0]]]}""")),
      "id", "g")
    assert(cg.count() == 0)
    assert(vw.exceptAll(vg).isEmpty && vg.exceptAll(vw).isEmpty)
  }

  test("GeoJSON: wrong type, junk, and open ring quarantine") {
    val (v, c) = parseGeoJsonPolygons(df(
      (1L, """{"type":"Point","coordinates":[1,2]}"""),
      (2L, """not json at all"""),
      (3L, """{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,3],[1,1]]]}""")),
      "id", "g")
    assert(v.count() == 0 && c.count() == 3)
  }

  test("toWkt/toGeoJson round trip is vertex-exact (holes included)") {
    val src = df(
      (1L, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))"),
      (2L, "POLYGON ((5 5, 8 5, 8 9, 5 9, 5 5))"))
    val (v0, _) = parseWktPolygons(src, "id", "g")
    // WKT round trip
    val (v1, c1) = parseWktPolygons(
      toWkt(v0, "id").withColumnRenamed("wkt", "g"), "id", "g")
    assert(c1.count() == 0)
    assert(v0.exceptAll(v1).isEmpty && v1.exceptAll(v0).isEmpty)
    // GeoJSON round trip
    val (v2, c2) = parseGeoJsonPolygons(
      toGeoJson(v0, "id").withColumnRenamed("geojson", "g"), "id", "g")
    assert(c2.count() == 0)
    assert(v0.exceptAll(v2).isEmpty && v2.exceptAll(v0).isEmpty)
  }

  test("edges: closing vertex supplies the wrap-around edge") {
    val (v, _) = parseWktPolygons(
      df((1L, "POLYGON ((0 0, 4 0, 4 3, 0 3, 0 0))")), "id", "g")
    val e = edges(v, "id").orderBy("seg").collect()
    assert(e.length == 4)
    assert(e.last.getDouble(e.last.fieldIndex("x1")) == 0.0 &&
      e.last.getDouble(e.last.fieldIndex("y1")) == 3.0 &&
      e.last.getDouble(e.last.fieldIndex("x2")) == 0.0 &&
      e.last.getDouble(e.last.fieldIndex("y2")) == 0.0)
    // shoelace over the edge table: 2A = 24 for the 4x3 rect
    val sh = edges(v, "id").agg(
      sum(expr("CAST(x1 * y2 - x2 * y1 AS BIGINT)")).as("a2")).head().getLong(0)
    assert(sh == 24L)
  }
}
