package graft.geo

import graft.SparkSpec
import graft.operators.GridOps
import org.apache.spark.sql.functions._

class GeoSpec extends SparkSpec {
  import spark.implicits._

  test("tileX/tileY hit the expected corner tiles") {
    val df = Seq(
      (-179.9, 84.9),  // top-left → (0, 0)
      (179.9, -84.9),  // bottom-right → (n-1, n-1)
      (0.1, -0.1)      // just past the center → (n/2, n/2)
    ).toDF("lng", "lat")
    val z = 4
    val out = df.select(QuadKey.tileX(col("lng"), z), QuadKey.tileY(col("lat"), z))
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((0L, 0L), (15L, 15L), (8L, 8L)))
  }

  test("qkString interleaves bits y-high, msb first") {
    // x=3 (011), y=5 (101) at z=3 → digits (2y+x per bit, msb→lsb) = 2,1,3
    val out = spark.range(1)
      .select(QuadKey.qkString(lit(3L), lit(5L), 3)).as[String].head()
    assert(out == "213")
  }

  test("qkNum equals digit expansion and parents truncate") {
    // qkNum interleaves lsb-first: digit k = 2*ybit_k + xbit_k, weight 4^k
    val (x, y) = (6L, 9L) // x=0110, y=1001
    val expected = (0 until 4).map { k =>
      (((y >> k) & 1) * 2 + ((x >> k) & 1)) * (1L << (2 * k))
    }.sum
    val got = spark.range(1).select(QuadKey.qkNum(lit(x), lit(y), 4)).as[Long].head()
    assert(got == expected)
    val p = spark.range(1).select(QuadKey.parent(lit(x))).as[Long].head()
    assert(p == 3L)
  }

  test("qkDecode inverts qkString and parent/children round-trip") {
    val df = Seq((13L, 27L)).toDF("x", "y")
      .withColumn("qk", QuadKey.qkString(col("x"), col("y"), 6))
    val dec = df.select(QuadKey.qkDecode("qk").as("s")).select("s.*")
      .as[(Long, Long, Int)].head()
    assert(dec == ((13L, 27L, 6)))
    val (kids, par) = df.select(QuadKey.children(col("qk")), QuadKey.parentQk(col("qk")))
      .as[(Seq[String], String)].head()
    val qk = df.select("qk").as[String].head()
    assert(kids == Seq("0", "1", "2", "3").map(qk + _))
    assert(par == qk.dropRight(1))
  }

  test("tileBbox contains the tile's own points and tilesCoveringBbox covers it") {
    val z = 5
    val df = Seq((-122.33, 47.61)).toDF("lng", "lat")
      .select(QuadKey.tileX(col("lng"), z).as("x"), QuadKey.tileY(col("lat"), z).as("y"))
    val (w, s, e, n) = df.select(QuadKey.tileBbox(col("x"), col("y"), z).as("b"))
      .select("b.*").as[(Double, Double, Double, Double)].head()
    assert(w <= -122.33 && -122.33 < e && s <= 47.61 && 47.61 < n)
    // covering tiles of that bbox at the same zoom include the tile itself
    val qks = spark.range(1)
      .select(QuadKey.tilesCoveringBbox(lit(w + 1e-9), lit(s + 1e-9),
        lit(e - 1e-9), lit(n - 1e-9), z)).as[Seq[String]].head()
    val selfQk = df.select(QuadKey.qkString(col("x"), col("y"), z)).as[String].head()
    assert(qks == Seq(selfQk)) // epsilon-shrunk bbox maps to exactly its tile
  }

  test("mercator forward/inverse roundtrips") {
    val df = Seq((-122.33, 47.61), (0.005, 0.005), (179.0, -84.0)).toDF("lng", "lat")
    val bad = df.filter(
      abs(Mercator.lngOf(Mercator.x3857(col("lng"))) - col("lng")) > 1e-9 ||
        abs(Mercator.latOf(Mercator.y3857(col("lat"))) - col("lat")) > 1e-9)
    assert(bad.count() == 0)
  }

  test("haversine matches a known distance") {
    // London (51.5074, -0.1278) ↔ Paris (48.8566, 2.3522) ≈ 343.5 km
    val km = spark.range(1).select(
      Distance.haversineKm(lit(51.5074), lit(-0.1278), lit(48.8566), lit(2.3522)))
      .as[Double].head()
    assert(math.abs(km - 343.5) < 1.0, s"got $km")
  }

  test("subdivide splits hot tiles and keeps cold ones") {
    // 300 points in one z3 tile (split expected), 10 in another (kept)
    val hot = (1 to 300).map(i => (10.0 + i * 0.001, 10.0 + i * 0.001))
    val cold = (1 to 10).map(i => (-100.0 + i * 0.001, -40.0))
    val df = (hot ++ cold).toDF("lng", "lat")
    val out = GridOps.subdivide(df, col("lng"), col("lat"), z0 = 3, zMax = 5, threshold = 100)
      .select("z", "c").as[(Int, Long)].collect()
    // cold tile stays at z3 with c=10; hot tile never appears at z3
    assert(out.exists { case (z, c) => z == 3 && c == 10 })
    assert(out.filter(_._1 > 3).nonEmpty)
    // counts are preserved across the leaves
    assert(out.map(_._2).sum == 310)
    // no leaf above threshold except (possibly) at zMax
    assert(out.forall { case (z, c) => c <= 100 || z == 5 })
  }
}
