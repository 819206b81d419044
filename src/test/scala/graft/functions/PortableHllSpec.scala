package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PortableHllSpec extends SparkSpec {

  test("portable HLL tracks exact cardinality within the m=64 error regime") {
    import spark.implicits._
    // three groups with very different cardinalities in one pass
    val df = (1 to 20000).map { i =>
      val g = i % 3 match { case 0 => "small"; case 1 => "mid"; case _ => "big" }
      val card = g match { case "small" => 50; case "mid" => 900; case _ => 6000 }
      (g, s"user_${i % card}_$g")
    }.toDF("g", "k")
    val got = PortableHll.approxDistinct(df, col("k"), Seq("g"), "approx")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = df.groupBy("g").agg(countDistinct(col("k")).as("ex"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((g, ex) <- exact) {
      val ap = got(g)
      // 1.04/sqrt(64) ≈ 13% standard error; allow 3 sigma
      assert(math.abs(ap - ex).toDouble / ex < 0.4, s"$g: approx=$ap exact=$ex")
    }
  }

  test("estimate is deterministic across partitionings") {
    import spark.implicits._
    val df = (1 to 5000).map(i => ("g", s"id_$i")).toDF("g", "k")
    val a = PortableHll.approxDistinct(df.repartition(32), col("k"), Seq("g"), "a")
      .collect().head.getLong(1)
    val b = PortableHll.approxDistinct(df.repartition(3), col("k"), Seq("g"), "a")
      .collect().head.getLong(1)
    assert(a == b)
  }

  test("exact integer harmonic sum: bucket ranks stay within the int64-safe cap") {
    import spark.implicits._
    val df = (1 to 1000).map(i => ("g", s"v$i")).toDF("g", "k")
    val rhos = df.select(PortableHash.md5Long(col("k")).as("h"))
      .selectExpr("least(1 + bit_count(((h >> 6) & -(h >> 6)) - 1), 40) AS rho")
      .agg(min("rho"), max("rho")).collect().head
    assert(rhos.getInt(0) >= 1 && rhos.getInt(1) <= 40)
  }
}
