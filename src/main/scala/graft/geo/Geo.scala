package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic synthetic geography (SURVEY.md §3): lng/lat derived
  * arithmetically from (user_id, event_id) so spatial operators are
  * oracle-checkable in DuckDB. Integer modulo on BIGINT is exact in both
  * engines; the +0.005 offset keeps points off tile boundaries so the
  * FP tile math is robust (margin ≥ 2.5e-4 deg vs ~1e-13 FP error).
  */
object SyntheticGeo {
  def lng: Column = (col("user_id") * 47 + col("event_id") * 13) % 36000 / 100.0 - 180 + 0.005
  def lat: Column = (col("user_id") * 31 + col("event_id") * 7) % 17000 / 100.0 - 85 + 0.005
  // identical expression for the DuckDB oracle (same op order → same doubles)
  val lngSql = "(((user_id*47 + event_id*13) % 36000) / 100.0 - 180 + 0.005)"
  val latSql = "(((user_id*31 + event_id*7) % 17000) / 100.0 - 85 + 0.005)"
}

/** Bing-maps quadkey tile math as Catalyst `Column` expressions — the
  * Spark-first re-expression of the reference's mercantile grid layer
  * (/root/reference/src/ubdc_airbnb/ubdc_airbnb/utils/grids.py:22,
  * models.py:201 UBDCGrid.quadkey). Pure built-in functions: whole-stage
  * codegen applies, no UDF. NOTE: built-in `radians()` is avoided — JVM
  * `toRadians` is x/180*π while DuckDB is x*π/180, which can differ in the
  * last ULP; we spell out one explicit op order used by both engines.
  */
object QuadKey {
  private def rad(c: Column): Column = c * math.Pi / 180
  private def radSql(e: String): String = s"$e * pi() / 180"

  private def toCol(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.GraftColumnBridge.column(e)
  private def toExpr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.GraftColumnBridge.expression(c)

  /** Web-mercator tile x at zoom z, clamped to [0, 2^z-1]. Native
    * Catalyst expression (one static call in codegen); bit-identical to
    * [[tileXComposed]] — asserted in TileExprSpec. */
  def tileX(lng: Column, z: Int): Column =
    toCol(graft.expressions.TileX(toExpr(lng.cast("double")),
      org.apache.spark.sql.catalyst.expressions.Literal(z)))

  /** Web-mercator tile y at zoom z, clamped to [0, 2^z-1]. Native. */
  def tileY(lat: Column, z: Int): Column =
    toCol(graft.expressions.TileY(toExpr(lat.cast("double")),
      org.apache.spark.sql.catalyst.expressions.Literal(z)))

  /** Composed built-in-function forms (the tier-a ladder rung): kept for
    * the native-vs-composed equality spec and as reference semantics. */
  def tileXComposed(lng: Column, z: Int): Column = {
    val n = 1L << z
    least(greatest(floor((lng + 180) / 360 * n), lit(0L)), lit(n - 1)).cast(LongType)
  }

  def tileYComposed(lat: Column, z: Int): Column = {
    val n = 1L << z
    val r = rad(lat)
    val f = (lit(1) - log(tan(r) + lit(1) / cos(r)) / math.Pi) / 2 * n
    least(greatest(floor(f), lit(0L)), lit(n - 1)).cast(LongType)
  }

  def tileXSql(lng: String, z: Int): String = {
    val n = 1L << z
    s"CAST(least(greatest(floor(($lng + 180) / 360 * $n), 0), ${n - 1}) AS BIGINT)"
  }

  def tileYSql(lat: String, z: Int): String = {
    val n = 1L << z
    val r = radSql(lat)
    s"CAST(least(greatest(floor((1 - ln(tan($r) + 1 / cos($r)) / pi()) / 2 * $n), 0), ${n - 1}) AS BIGINT)"
  }

  /** Numeric quadkey: x/y bits interleaved (y high) — a BIGINT grouping
    * key (z ≤ 22 fits in 44 bits). Identical unrolled arithmetic is
    * emitted for the oracle by [[qkNumSql]]. */
  def qkNum(x: Column, y: Column, z: Int): Column =
    (0 until z).map { k =>
      (shiftright(x, k).bitwiseAND(lit(1L))) * (1L << (2 * k)) +
        (shiftright(y, k).bitwiseAND(lit(1L))) * (2L << (2 * k))
    }.reduce(_ + _)

  def qkNumSql(x: String, y: String, z: Int): String =
    (0 until z).map { k =>
      s"(($x >> $k) & 1) * ${1L << (2 * k)} + (($y >> $k) & 1) * ${2L << (2 * k)}"
    }.mkString("(", " + ", ")")

  /** Quadkey digit string ("0123..."), z digits, most-significant first —
    * the partition-prefix form used for the 100 TB layout (sources/Io). */
  def qkString(x: Column, y: Column, z: Int): Column =
    concat((z - 1 to 0 by -1).map { k =>
      (shiftright(y, k).bitwiseAND(lit(1L)) * 2 + shiftright(x, k).bitwiseAND(lit(1L)))
        .cast("string")
    }: _*)

  /** Parent tile coordinate (one zoom up): floor-halving, mirrors
    * quadkey-string truncation. */
  def parent(t: Column): Column = shiftright(t, 1)

  // --- quadkey-string surface mirroring the reference's grids.py --------

  /** Decode a quadkey digit string to struct(x, y, z)
    * (bbox_from_quadkey inverse path, utils/grids.py:9). Left fold over
    * digits: each digit contributes one bit to x (d & 1) and y (d >> 1). */
  def qkDecode(qkName: String): Column = expr(
    s"""aggregate(
          transform(sequence(1, length($qkName)), i -> ascii(substr($qkName, i, 1)) - 48),
          named_struct('x', 0L, 'y', 0L),
          (acc, d) -> named_struct('x', acc.x * 2 + (d % 2), 'y', acc.y * 2 + (d div 2)),
          acc -> named_struct('x', acc.x, 'y', acc.y, 'z', length($qkName)))""")

  /** Tile → lng/lat bbox struct(west, south, east, north)
    * (mercantile.bounds / bbox_from_quadkey, utils/grids.py:9). */
  def tileBbox(x: Column, y: Column, z: Int): Column = {
    val n = (1L << z).toDouble
    def lngOf(t: Column) = t / n * 360 - 180
    def latOf(t: Column) = atan(sinh((lit(1) - t / n * 2) * math.Pi)) * 180 / math.Pi
    struct(lngOf(x).as("west"), latOf(y + 1).as("south"),
      lngOf(x + 1).as("east"), latOf(y).as("north"))
  }

  /** The four child quadkeys (replace_quadkey_with_children,
    * utils/grids.py:107). */
  def children(qk: Column): Column =
    array(Seq("0", "1", "2", "3").map(d => concat(qk, lit(d))): _*)

  /** Parent quadkey string; empty at the root (qk_has_parent,
    * utils/grids.py:72). */
  def parentQk(qk: Column): Column = qk.substr(lit(1), length(qk) - 1)

  /** All quadkeys at zoom `z` whose tiles intersect the lng/lat bbox —
    * the grid-seeding step (quadkeys_of_geom/get_quadkeys_for,
    * utils/spatial.py:115,130), here for bbox geometries. Produces
    * O((Δx)·(Δy)) strings: callers pick a coarse z (the reference seeds
    * at z<=12 too). */
  def tilesCoveringBbox(west: Column, south: Column, east: Column, north: Column,
                        z: Int): Column = {
    val xs = sequence(tileX(west, z), tileX(east, z))
    val ys = sequence(tileY(north, z), tileY(south, z)) // y grows southward
    flatten(transform(xs, x => transform(ys, y => qkString(x, y, z))))
  }
}

/** EPSG:4326 ↔ 3857 web-mercator, mirroring the reference's `reproject`
  * (/root/reference/src/ubdc_airbnb/ubdc_airbnb/utils/spatial.py:225) —
  * here as closed-form Column math instead of a GIS library call. */
object Mercator {
  val R = 6378137.0
  val Max = 20037508.342789244 // R * pi

  def x3857(lng: Column): Column = lng * Max / 180
  def y3857(lat: Column): Column = log(tan((lit(90) + lat) * math.Pi / 360)) * R
  def lngOf(x: Column): Column = x / Max * 180
  def latOf(y: Column): Column = (atan(exp(y / R)) * 360 / math.Pi) - 90

  // NOTE: no `D` suffix — these fragments are DuckDB SQL; decimal/E-notation
  // literals promote to DOUBLE exactly when mixed with double operands.
  def x3857Sql(lng: String): String = s"$lng * $Max / 180"
  def y3857Sql(lat: String): String = s"ln(tan((90 + $lat) * pi() / 360)) * $R"
  def lngOfSql(x: String): String = s"$x / $Max * 180"
  def latOfSql(y: String): String = s"(atan(exp($y / $R)) * 360 / pi()) - 90"
}

/** Great-circle + planar distances, mirroring `postgis_distance_a_to_b`
  * (/root/reference/src/ubdc_airbnb/ubdc_airbnb/utils/spatial.py:179) and
  * the `significally_moved` threshold check (workunits.py:124). */
object Distance {
  /** Haversine distance in km; one explicit op order shared with the SQL
    * mirror so both engines agree to ~1 ULP. */
  def haversineKm(lat1: Column, lng1: Column, lat2: Column, lng2: Column): Column = {
    def rad(c: Column): Column = c * math.Pi / 180
    val dLat = rad(lat2 - lat1) / 2
    val dLng = rad(lng2 - lng1) / 2
    val a = sin(dLat) * sin(dLat) + cos(rad(lat1)) * cos(rad(lat2)) * sin(dLng) * sin(dLng)
    asin(sqrt(a)) * (2 * 6371.0088)
  }

  def haversineKmSql(lat1: String, lng1: String, lat2: String, lng2: String): String = {
    def rad(e: String) = s"($e) * pi() / 180"
    val dLat = s"(${rad(s"$lat2 - $lat1")} / 2)"
    val dLng = s"(${rad(s"$lng2 - $lng1")} / 2)"
    val a = s"sin($dLat) * sin($dLat) + cos(${rad(lat1)}) * cos(${rad(lat2)}) * sin($dLng) * sin($dLng)"
    s"asin(sqrt($a)) * ${2 * 6371.0088}"
  }
}
