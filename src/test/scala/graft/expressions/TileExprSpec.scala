package graft.expressions

import graft.SparkSpec
import graft.geo.QuadKey
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

class TileExprSpec extends SparkSpec {
  import spark.implicits._

  test("native tile expressions equal the composed forms on random points") {
    val pts = (for {
      lng <- Gen.listOfN(200, Gen.chooseNum(-180.0, 180.0))
      lat <- Gen.listOfN(200, Gen.chooseNum(-89.0, 89.0))
    } yield lng.zip(lat)).sample.get
    val df = pts.toDF("lng", "lat")
    for (z <- Seq(1, 6, 14, 22)) {
      val bad = df.filter(
        QuadKey.tileX(col("lng"), z) =!= QuadKey.tileXComposed(col("lng"), z) ||
          QuadKey.tileY(col("lat"), z) =!= QuadKey.tileYComposed(col("lat"), z))
      assert(bad.count() == 0, s"divergence at z=$z")
    }
  }

  test("SQL registration works and clamps out-of-range latitudes") {
    val r = spark.sql(
      "SELECT graft_tile_x(-180D, 3), graft_tile_x(180D, 3), " +
        "graft_tile_y(89.9D, 3), graft_tile_y(-89.9D, 3)").head()
    assert(r.getLong(0) == 0L && r.getLong(1) == 7L)
    assert(r.getLong(2) == 0L && r.getLong(3) == 7L)
  }
}
