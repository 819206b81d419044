package graft.tools

import graft.{GraftSession, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Dev-only WHOLE-SUITE 10× robustness audit: builds a full factor×
  * mirror of the SF dir (facts replicated under fresh key ranges —
  * orders, lineitem, customer, events, documents, embeddings; dims
  * copied — part, supplier, nation, region, since dims grow slower than
  * facts), then runs EVERY registered query once with a try/catch.
  *
  * Two failure classes this catches that sf0.1 verification cannot:
  *   - int64 overflow in component-sum arithmetic (q547's n·Σx² crossed
  *     int64 exactly here — found by this probe's ancestor);
  *   - super-linear plans (reported: per-query seconds at factor×).
  *
  * Usage: ProbeScaleAll [factor] [startAfterQueryName]
  */
object ProbeScaleAll {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("probe-scale-all")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val startAfter = args.drop(1).headOption

    val tmp = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      java.nio.file.Files.createTempDirectory("graft-scale-all").toString)
    def rep(name: String, key: String, stride: Long): Unit = {
      val base = Tables.t(spark, dir, name)
      (0 until factor).map { k =>
        base.select(((col(key) + lit(k * stride)).as(key) +:
          base.columns.filter(_ != key).map(col).toIndexedSeq): _*)
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$tmp/$name.parquet")
    }
    // The mirror is stamped with its build factor so a rerun at a
    // different factor (or a pre-stamp leftover) rebuilds instead of
    // silently auditing stale data.
    val stamp = java.nio.file.Paths.get(s"$tmp/_factor")
    val stampOk = java.nio.file.Files.exists(stamp) &&
      java.nio.file.Files.readString(stamp).trim == factor.toString
    if (new java.io.File(s"$tmp/lineitem.parquet").exists() && !stampOk)
      println(s"[scale-all] stamp mismatch or missing at $tmp — rebuilding at ${factor}x")
    if (!new java.io.File(s"$tmp/lineitem.parquet").exists() || !stampOk) {
      rep("orders", "o_orderkey", 100000000L)
      // lineitem keeps baskets intact under the same orderkey stride
      val li = Tables.t(spark, dir, "lineitem")
      (0 until factor).map { k =>
        li.select(((col("l_orderkey") + lit(k * 100000000L)).as("l_orderkey") +:
          li.columns.filter(_ != "l_orderkey").map(col).toIndexedSeq): _*)
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
      rep("customer", "c_custkey", 10000000L)
      rep("documents", "doc_id", 10000000L)
      rep("embeddings", "vec_id", 10000000L)
      val ev = Tables.t(spark, dir, "events") // ts normalized to BIGINT nanos
      (0 until factor).map { k =>
        ev.select((col("event_id") + lit(k * 1000000000L)).as("event_id"),
          col("ts"), (col("user_id") + lit(k * 10000000L)).as("user_id"),
          col("event_type"), col("value"), col("props"))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$tmp/events.parquet")
      Seq("part", "supplier", "nation", "region").foreach { d =>
        Tables.t(spark, dir, d).write.mode("overwrite")
          .parquet(s"$tmp/$d.parquet")
      }
      java.nio.file.Files.writeString(stamp, factor.toString)
    }
    println(s"[scale-all] dir=$tmp " +
      s"lineitem=${Tables.t(spark, tmp, "lineitem").count()} (${factor}x)")

    var failed = 0
    val names = startAfter match {
      case Some(list) if list.contains(",") =>
        list.split(",").toSeq.filter(SparkEntry.queries.contains)
      case _ => SparkEntry.queries.keys.toSeq.sorted
        .dropWhile(n => startAfter.exists(_ >= n))
    }
    for (q <- names) {
      val t0 = System.nanoTime()
      try {
        val n = SparkEntry.queries(q)(spark, tmp).count()
        println(f"[scale-all] $q: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      } catch {
        case e: Throwable =>
          failed += 1
          val root = Option(e.getMessage).getOrElse("").linesIterator
            .take(2).mkString(" | ")
          println(s"[scale-all] $q: FAILED $root")
      }
      spark.catalog.clearCache()
    }
    println(s"[scale-all] done: ${names.size - failed}/${names.size} ok")
    spark.stop()
  }
}
