package graft.tools

import graft.{GraftSession, Tables}
import graft.dedup.Dedup
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Dev-only stage-by-stage timing of q31's pipeline. */
object ProbeQ31 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("probe-q31")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val base = Tables.t(spark, dir, "documents")
      .withColumn("w", TextFunctions.words(col("text")))
    time("words")(base.select(sum(size(col("w")))).head)
    val ngrams = base.withColumn("sh0", array_distinct(TextFunctions.wordNgrams("w", 3)))
    time("ngrams")(ngrams.select(sum(size(col("sh0")))).head)
    val hashed = ngrams.filter(size(col("sh0")) > 0)
      .withColumn("sh", array_distinct(Dedup.shingleHashes("sh0")))
      .select("doc_id", "sh")
    time("hashed")(hashed.select(sum(size(col("sh")))).head)
    val sigs = hashed.select(col("doc_id"), Dedup.minhashSig("sh", 6).as("sig"))
    time("sigs")(sigs.select(max(col("sig").getItem(0))).head)
    val pairs = Dedup.lshCandidates(sigs, "doc_id", "sig", nHashes = 6, bandSize = 2)
    println("[probe] n_pairs = " + time("pairs")(pairs.count()))
    val a = hashed.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = hashed.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    val full = pairs.join(a, "id_a").join(b, "id_b")
      .withColumn("jac_bp", Dedup.jaccardBp("sh_a", "sh_b"))
    time("full")(full.count())
    spark.stop()
  }
}
