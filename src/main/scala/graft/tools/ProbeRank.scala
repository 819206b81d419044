package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.ScaleRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only: q385-shaped multi-branch consistency of ScaleRank ranks. */
object ProbeRank {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("probe-rank")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val acc = ScaleRank.withGlobalRowNumber(
      Tables.t(spark, dir, "events")
        .selectExpr("event_id", "ts",
          "CAST(get_json_object(props, '$.k') AS BIGINT) AS key"),
      Seq(col("ts"), col("event_id")), "ord")
    // branch 1: like q385's `reuse` (window by key), keep event_id
    val b1 = acc
      .withColumn("prev_ord", lag("ord", 1).over(
        Window.partitionBy("key").orderBy("ord")))
      .select(col("event_id"), col("ord").as("ord1"))
    // branch 2: like q385's `accB` (plain projection)
    val b2 = acc.select(col("event_id"), col("ord").as("ord2"))
    val j = b1.join(b2, "event_id")
    val n = j.count()
    val bad = j.where(col("ord1") =!= col("ord2")).count()
    println(s"[probe] rows=$n inconsistent=$bad")
    spark.stop()
  }
}
