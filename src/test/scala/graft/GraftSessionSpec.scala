package graft

class GraftSessionSpec extends SparkSpec {

  test("session carries the scale-oriented defaults the engine relies on") {
    val c = spark.conf
    assert(c.get("spark.sql.adaptive.enabled") == "true")
    assert(c.get("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(c.get("spark.sql.adaptive.coalescePartitions.enabled") == "true")
    assert(c.get("spark.sql.session.timeZone") == "UTC")
    assert(c.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
    assert(c.get("spark.sql.parquet.filterPushdown") == "true")
    assert(c.get("spark.sql.autoBroadcastJoinThreshold").toLong > 0)
  }

  test("graft extensions are registered (native SQL functions resolve)") {
    val r = spark.sql("SELECT graft_haversine(0D, 0D, 0D, 0D)").collect()
    assert(r.head.getDouble(0) == 0.0)
  }
}
