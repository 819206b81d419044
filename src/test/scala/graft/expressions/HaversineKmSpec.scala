package graft.expressions

import graft.SparkSpec
import graft.geo.Distance
import org.apache.spark.sql.functions._

class HaversineKmSpec extends SparkSpec {
  import spark.implicits._

  private val pts = Seq(
    (51.5074, -0.1278, 48.8566, 2.3522),  // London–Paris
    (0.005, 0.005, 0.005, 0.005),          // zero distance
    (-84.0, -179.0, 84.0, 179.0)           // near-antipodal
  ).toDF("lat1", "lng1", "lat2", "lng2")

  test("native expression is registered and bit-matches the composed form") {
    pts.createOrReplaceTempView("pts")
    val composed = pts.select(
      Distance.haversineKm(col("lat1"), col("lng1"), col("lat2"), col("lng2")))
      .as[Double].collect().toSeq
    val native = spark.sql(
      "SELECT graft_haversine(lat1, lng1, lat2, lng2) FROM pts")
      .as[Double].collect().toSeq
    assert(native == composed) // exact: same op order, same doubles
    assert(math.abs(native.head - 343.5) < 1.0)
    assert(native(1) == 0.0)
  }

  test("null inputs yield null (nullSafeEval path)") {
    val r = spark.sql("SELECT graft_haversine(CAST(NULL AS DOUBLE), 0D, 1D, 1D)")
      .collect().head
    assert(r.isNullAt(0))
  }

  test("constant inputs fold through codegen") {
    val plan = spark.sql("SELECT graft_haversine(0D, 0D, 0D, 1D) AS d")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("graft_haversine")) // constant-folded at plan time
  }
}
