package graft.geo

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

class QuadKeyPropSpec extends SparkSpec {
  import spark.implicits._

  private val lngGen = Gen.chooseNum(-179.99, 179.99)
  private val latGen = Gen.chooseNum(-84.99, 84.99)
  private val zGen = Gen.chooseNum(1, 12)

  test("encode→decode roundtrips and parent truncates (random samples)") {
    // collect a batch of samples, run them through Spark in one pass
    val samples = (for {
      lng <- Gen.listOfN(40, lngGen)
      lat <- Gen.listOfN(40, latGen)
      z <- Gen.listOfN(40, zGen)
    } yield lng.lazyZip(lat).lazyZip(z).toList).sample.get

    val df = samples.toDF("lng", "lat", "z")
    for (z <- samples.map(_._3).distinct) {
      val part = df.filter(col("z") === z)
        .withColumn("x", QuadKey.tileX(col("lng"), z))
        .withColumn("y", QuadKey.tileY(col("lat"), z))
        .withColumn("qk", QuadKey.qkString(col("x"), col("y"), z))
      val rows = part
        .withColumn("dec", QuadKey.qkDecode("qk"))
        .select(col("x"), col("y"), col("qk"),
          col("dec.x").as("dx"), col("dec.y").as("dy"), col("dec.z").as("dz"))
        .as[(Long, Long, String, Long, Long, Int)].collect()
      for ((x, y, qk, dx, dy, dz) <- rows) {
        assert(qk.length == z)
        assert((dx, dy, dz) == ((x, y, z)), s"roundtrip failed for ($x,$y,$z)")
        // parent string == parent tile coordinates
        if (z > 1) {
          val pqk = qk.dropRight(1)
          val px = x >> 1; val py = y >> 1
          val enc = spark.range(1)
            .select(QuadKey.qkString(lit(px), lit(py), z - 1)).as[String].head()
          assert(pqk == enc)
        }
      }
    }
  }

  test("tile bbox partitions points: every point's tile bbox contains it") {
    val pts = (for {
      lng <- Gen.listOfN(30, lngGen)
      lat <- Gen.listOfN(30, latGen)
    } yield lng.zip(lat)).sample.get
    val z = 7
    val bad = pts.toDF("lng", "lat")
      .withColumn("x", QuadKey.tileX(col("lng"), z))
      .withColumn("y", QuadKey.tileY(col("lat"), z))
      .withColumn("b", QuadKey.tileBbox(col("x"), col("y"), z))
      .filter(!(col("lng") >= col("b.west") && col("lng") < col("b.east") &&
        col("lat") > col("b.south") && col("lat") <= col("b.north")))
    assert(bad.count() == 0)
  }
}
