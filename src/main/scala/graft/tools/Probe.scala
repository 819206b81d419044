package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Dev-only probe of testdata schemas/values as Spark sees them. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("probe")
    val dir = "/root/testdata/sf0.001"
    for (t <- Seq("events", "orders", "lineitem")) {
      val df = spark.read.parquet(s"$dir/$t.parquet")
      println(s"== $t: ${df.schema.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")}")
      df.show(3, truncate = false)
    }
    val ev = graft.Tables.t(spark, dir, "events")
    ev.selectExpr("event_id", "ts DIV 1000000 AS ts_ms",
        "CAST(get_json_object(props, '$.k') AS INT) AS k")
      .show(3, truncate = false)
    println("conv check: " + spark.range(1)
      .select(conv(substring(md5(lit("hello")), 1, 15), 16, 10).cast("long")).head.getLong(0))
    spark.stop()
  }
}
