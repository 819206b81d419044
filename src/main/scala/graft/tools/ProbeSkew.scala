package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.SkewTools
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only planted-skew join measurement (SURVEY §5's skew paragraph).
  *
  * Builds a (default 200×) events mirror where ONE user_id owns 20% of all rows
  * (plus a 192-char payload so the hot partition carries real bytes),
  * then measures the same inner join under three strategies:
  *
  *   naive  — sort-merge join, AQE skew-join OFF: the hot key's entire
  *            row set sorts and joins in a single task;
  *   salted — SkewTools.saltedJoin (deterministic 32-way salt);
  *   aqe    — AQE skew-join ON with thresholds scaled to the probe's
  *            partition sizes (defaults are tuned for 256MB+ cluster
  *            partitions and would never fire on a local mirror).
  *
  * Broadcast is disabled throughout: at 100 TB both join sides are huge
  * — a broadcast here would measure nothing. All three variants must
  * return the identical row count (asserted).
  *
  * Usage: ProbeSkew [factor=200]
  */
object ProbeSkew {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("probe-skew")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = args.headOption.map(_.toInt).getOrElse(200)
    val tmp = "/tmp/graft-skew"

    val ev = Tables.t(spark, dir, "events")
      .select("event_id", "user_id", "value")
    val skewed = (0 until factor).map { k =>
      ev.select((col("event_id") + lit(k * 1000000000L)).as("event_id"),
        col("user_id"), col("value"))
    }.reduce(_ unionByName _)
      // plant the hot key: every 5th row (20%) collapses onto user 7
      .withColumn("user_id",
        when(pmod(col("event_id"), lit(5)) === 0, lit(7L))
          .otherwise(col("user_id")))
      .withColumn("payload", repeat(md5(col("event_id").cast("string")), 6))
    skewed.write.mode("overwrite").parquet(s"$tmp/left.parquet")
    // cache both sides eagerly: the probe must measure the JOIN under
    // skew, not the parquet scan (which is parallel and identical for
    // all three variants)
    val left = spark.read.parquet(s"$tmp/left.parquet").cache()
    val nLeft = left.count()
    val hot = left.filter(col("user_id") === 7L).count()
    println(f"[skew] left rows=$nLeft hot-key share=${hot * 100.0 / nLeft}%.1f%%")

    // right side: per-user attributes — small, but broadcast is disabled
    // so the join is a genuine shuffle join on the skewed key
    left.select("user_id").distinct()
      .withColumn("segment", pmod(col("user_id"), lit(7)))
      .write.mode("overwrite").parquet(s"$tmp/right.parquet")
    val right = spark.read.parquet(s"$tmp/right.parquet").cache()
    right.count()

    def joined(l: DataFrame): DataFrame =
      l.join(right, Seq("user_id"))
        .groupBy("segment")
        .agg(count(lit(1)).as("n"), sum("value").as("sv"),
          sum(length(col("payload"))).as("sp"))

    def run(label: String, skewJoin: Boolean, useSalt: Boolean): (Double, Long) = {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewJoin.toString)
      if (skewJoin) {
        // defaults (256MB / factor 5) never fire at probe scale
        spark.conf.set(
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2MB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
      } else
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")
      val dt = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val df = if (useSalt) {
          val sj = SkewTools.saltedJoin(left, right, "user_id", nSalts = 32)
          sj.groupBy("segment").agg(count(lit(1)).as("n"),
            sum("value").as("sv"), sum(length(col("payload"))).as("sp"))
        } else joined(left)
        df.count()
        (System.nanoTime() - t0) / 1e9
      }.min
      val n = (if (useSalt) SkewTools.saltedJoin(left, right, "user_id", 32)
               else left.join(right, Seq("user_id"))).count()
      println(f"[skew] $label%-7s $dt%.2f s  (join rows $n)")
      (dt, n)
    }

    val (tN, nN) = run("naive", skewJoin = false, useSalt = false)
    val (tS, nS) = run("salted", skewJoin = false, useSalt = true)
    val (tA, nA) = run("aqe", skewJoin = true, useSalt = false)
    require(nN == nS && nN == nA, s"row counts diverge: $nN $nS $nA")
    println(f"[skew] summary: naive $tN%.2f s | salted $tS%.2f s | " +
      f"aqe $tA%.2f s  (salted ${tN / tS}%.1fx, aqe ${tN / tA}%.1fx vs naive)")
    // restore session defaults
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.stop()
  }
}
