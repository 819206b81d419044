package graft.queries

import graft.{SparkEntry, SparkSpec}
import graft.operators.SkewTools
import org.apache.spark.sql.functions._

/** Adversarial skew: 95% of rows land on ONE key (the celebrity-listing /
  * viral-grid shape at 100 TB). The salted paths must produce exactly the
  * plain results, and the window/groupBy-heavy queries must complete and
  * keep their invariants on the skewed copy. */
class SkewedInputSpec extends SparkSpec {

  private lazy val skewDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-skew").toString
    graft.Tables.all.foreach { name =>
      val df = graft.Tables.t(spark, "/root/testdata/sf0.001", name)
      val out =
        if (name == "events")
          // 95% of events collapse onto user_id = 1
          df.withColumn("user_id",
            when(pmod(col("event_id"), lit(20)) =!= 0, lit(1L)).otherwise(col("user_id")))
        else df
      out.write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    dir
  }

  test("salted aggregation equals plain aggregation on a 95%-hot key") {
    val ev = graft.Tables.t(spark, skewDir, "events")
    val plain = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = SkewTools.saltedCount(ev, "user_id", nSalts = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(plain(1L) > plain.values.sum * 9 / 10, "the skew must actually be planted")
  }

  test("salted join equals plain join on the hot key") {
    val ev = graft.Tables.t(spark, skewDir, "events")
      .select("event_id", "user_id", "value")
    val dim = spark.read.parquet(s"$skewDir/customer.parquet")
      .selectExpr("c_custkey AS user_id", "c_mktsegment")
    val plain = ev.join(dim, "user_id").count()
    val salted = SkewTools.saltedJoin(ev, dim, "user_id", nSalts = 8).count()
    assert(salted == plain && plain > 0)
  }

  test("groupBy/window-heavy queries survive the skewed copy with invariants intact") {
    val names = Seq("q07_sessionize", "q11_task_stats", "q72_salted_hot_key",
      "q76_late_events", "q104_skew_report", "q79_path_signature")
    names.foreach { n =>
      val rows = SparkEntry.queries(n)(spark, skewDir).collect()
      assert(rows.nonEmpty, s"$n returned nothing on the skewed copy")
    }
    // the skew detector must actually flag the hot key
    val skew = SparkEntry.queries("q104_skew_report")(spark, skewDir).collect()
    assert(skew.exists(_.getAs[Long]("top_share_bp") > 9000),
      "q104 must report the planted 95% hot key")
  }
}
