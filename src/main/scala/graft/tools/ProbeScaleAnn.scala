package graft.tools

import graft.{GraftSession, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Dev-only similarity-family scale probe: replicates `embeddings` by an
  * integer factor (distinct vec_ids, perturbed values so near-duplicate
  * structure persists without exact collisions), writes it as a temp
  * table dir, and times the REAL registered queries against it. The
  * scale argument ratio (e.g. 25× rows → ~25× time for the linear paths,
  * far less for bucket-scoped ones) is the 100 TB evidence for §5.
  *
  * Usage: ProbeScaleAnn [factor] [query...]; defaults factor=25 over
  * q40/q41/q42/q47 at SPARK_GRAFT_SF_DIR.
  */
object ProbeScaleAnn {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("probe-scale-ann")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = args.headOption.map(_.toInt).getOrElse(25)
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q40_knn_brute", "q41_knn_lsh", "q42_knn_ivf", "q47_pq_quantize")

    val base = Tables.t(spark, dir, "embeddings")
    val big = (0 until factor).map { k =>
      base.select(
        (col("vec_id") + lit(k * 10000000L)).as("vec_id"),
        transform(col("embedding"),
          x => (x * (lit(1.0f) + lit(k.toFloat) * lit(0.001f))).cast("float")).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
    val tmp = java.nio.file.Files.createTempDirectory("graft-scale-ann").toString
    big.write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    println(s"[scale-ann] embeddings = ${Tables.t(spark, tmp, "embeddings").count()} (${factor}x)")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scale-ann] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    for (q <- names) {
      time(s"$q @1x")(SparkEntry.queries(q)(spark, dir).count())
      time(s"$q @${factor}x")(SparkEntry.queries(q)(spark, tmp).count())
    }
    spark.stop()
  }
}
