package graft.expressions

import graft.SparkSpec
import graft.functions.PortableHash
import org.apache.spark.sql.functions._

class Md5LongSpec extends SparkSpec {

  test("native md5Long is bit-identical to the composed hex/conv form") {
    import spark.implicits._
    val df = (Seq("", "a", "hello world", "Ünïcødé ☃ text", "x" * 500) ++
      (1 to 2000).map(i => s"doc $i body"))
      .toDF("s")
    val n = df
      .select(PortableHash.md5Long(col("s")).as("a"),
        PortableHash.md5LongComposed(col("s")).as("b"))
      .filter(col("a") =!= col("b") || col("a").isNull =!= col("b").isNull)
      .count()
    assert(n == 0)
  }

  test("salted form matches, null stays null, SQL registration works") {
    import spark.implicits._
    val df = Seq(Some("k1"), None, Some("k2")).toDF("s")
    val rows = df.select(
      PortableHash.md5Long(col("s"), salt = "band3~").as("a"),
      PortableHash.md5LongComposed(col("s"), salt = "band3~").as("b")).collect()
    for (r <- rows) assert(r.isNullAt(0) == r.isNullAt(1) &&
      (r.isNullAt(0) || r.getLong(0) == r.getLong(1)))
    val viaSql = spark.sql("SELECT graft_md5long('hello')").head.getLong(0)
    val viaCol = spark.range(1).select(PortableHash.md5Long(lit("hello"))).head.getLong(0)
    assert(viaSql == viaCol)
  }

  test("default hash profile is the portable md5 (oracle-matchable)") {
    assert(PortableHash.profile == "portable" ||
      sys.env.get("SPARK_GRAFT_HASH").contains(PortableHash.profile))
    if (PortableHash.profile == "portable") {
      val h = spark.range(1)
        .select(PortableHash.md5Long(org.apache.spark.sql.functions.lit("hello")))
        .head.getLong(0)
      // known value: first 15 hex chars of md5('hello') = 5d41402abc4b2a7
      assert(h == java.lang.Long.parseLong("5d41402abc4b2a7", 16))
    }
  }

  test("values are non-negative 60-bit") {
    import spark.implicits._
    val mm = (1 to 5000).map(i => s"v$i").toDF("s")
      .select(PortableHash.md5Long(col("s")).as("h"))
      .agg(min("h"), max("h")).head
    assert(mm.getLong(0) >= 0L && mm.getLong(1) < (1L << 60))
  }
}
