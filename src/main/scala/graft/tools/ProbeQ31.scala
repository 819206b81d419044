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
    val exploded = Tables.t(spark, dir, "documents")
      .withColumn("w", TextFunctions.words(col("text")))
      .withColumn("sh0", array_distinct(TextFunctions.wordNgrams("w", 3)))
      .filter(size(col("sh0")) > 0)
      .select(col("doc_id"), explode(col("sh0")).as("s"))
    time("explode-count")(exploded.count())
    time("ngrams-only")(Tables.t(spark, dir, "documents")
      .withColumn("w", TextFunctions.words(col("text")))
      .select(sum(size(array_distinct(TextFunctions.wordNgrams("w", 3))))).head)
    val hashed = exploded.withColumn("h", Dedup.shingleHash(col("s")))
    time("hash-agg-max")(hashed.select(max(col("h"))).head)
    val aggs = collect_set(col("h")).as("sh") +: Dedup.minhashAggs(col("h"), 6)
    val docs = hashed.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .withColumn("sig", array((0 until 6).map(j => col(s"_mh$j")): _*))
      .select("doc_id", "sh", "sig")
    time("collect-set")(docs.count())
    val sigs = docs.select("doc_id", "sig")
    val pairs = Dedup.lshCandidates(sigs, "doc_id", "sig", nHashes = 6, bandSize = 2)
    println("[probe] n_pairs = " + time("pairs")(pairs.count()))
    spark.stop()
  }
}
