package graft.tools

import graft.{GraftSession, Tables}
import graft.dedup.Dedup
import graft.functions.TextFunctions

import org.apache.spark.sql.functions._

/** Dev-only stage-by-stage timing of q31's pipeline (current shape). */
object ProbeQ31 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("probe-q31")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // current production shape: position-explode + per-row concat/md5
    val exploded = Tables.t(spark, dir, "documents")
      .withColumn("w", TextFunctions.words(col("text")))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(0), size(col("w")) - 3)).as("i"))
      .withColumn("h", Dedup.shingleHash(expr("concat_ws(' ', w[i], w[i+1], w[i+2])")))
    time("pos-explode-count")(exploded.count())
    time("pos-explode-hash-max")(exploded.select(max(col("h"))).head)
    val aggs = sort_array(collect_set(col("h"))).as("sh") +: Dedup.minhashAggs(col("h"), 6)
    val docs = exploded.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .withColumn("sig", array((0 until 6).map(j => col(s"_mh$j")): _*))
      .select("doc_id", "sh", "sig")
    time("agg-count")(docs.count())
    time("full-q31")(graft.SparkEntry.queries("q31_dedup_minhash")(spark, dir).count())
    time("full-q31-again")(graft.SparkEntry.queries("q31_dedup_minhash")(spark, dir).count())
    spark.stop()
  }
}
