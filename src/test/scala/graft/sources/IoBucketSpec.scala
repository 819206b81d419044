package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IoBucketSpec extends SparkSpec {
  import spark.implicits._

  test("equal-bucketed tables join without a shuffle exchange") {
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "vb")
    Io.writeBucketed(a, "bkt_a", 8, "k")
    Io.writeBucketed(b, "bkt_b", 8, "k")
    try {
      // force a sort-merge join (broadcast would hide the bucketing)
      val joined = spark.table("bkt_a")
        .join(spark.table("bkt_b").hint("merge"), "k")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"expected no shuffle:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }
}
