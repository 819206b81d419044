package graft.tools

import graft.{GraftSession, Tables}
import graft.dedup.{Components, Dedup}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Dev-only 10× scale probe: replicates documents (distinct doc_ids,
  * perturbed text) and runs the MinHash→LSH→jaccard→components pipeline
  * end-to-end, reporting wall time per stage. Linearity here is the
  * evidence that the dedup path holds at 100 TB (no O(n²) stage). */
object ProbeScale {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("probe-scale")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scale] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val base = Tables.t(spark, dir, "documents").select("doc_id", "text")
    val big = (0 until factor).map { k =>
      base.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"),
        // perturb: shift text by k chars so replicas aren't exact dups
        concat(substring(col("text"), k + 1, 100000), substring(col("text"), 1, k)).as("text"))
    }.reduce(_ unionByName _)
    println(s"[scale] docs = ${big.count()} (${factor}x)")

    val exploded = big
      .withColumn("w", TextFunctions.words(col("text")))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(0), size(col("w")) - 3)).as("i"))
      .withColumn("h", Dedup.shingleHash(expr("concat_ws(' ', w[i], w[i+1], w[i+2])")))
    val aggs = collect_set(col("h")).as("sh") +: Dedup.minhashAggs(col("h"), 6)
    val sigs = exploded.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .withColumn("sig", array((0 until 6).map(j => col(s"_mh$j")): _*))
      .select("doc_id", "sh", "sig").cache()
    time("signatures")(sigs.count())
    val pairs = Dedup.lshCandidates(sigs.select("doc_id", "sig"),
      "doc_id", "sig", nHashes = 6, bandSize = 2)
    val nPairs = time("candidates")(pairs.count())
    println(s"[scale] pairs = $nPairs")
    val a = sigs.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = sigs.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    val verified = pairs.join(a, "id_a").join(b, "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jac_bp", Dedup.jaccardBpFromInter(col("inter"), "sh_a", "sh_b"))
    time("verify")(verified.count())
    val comps = Components.labelPropagation(pairs, "id_a", "id_b")
    time("components")(comps.count())
    spark.stop()
  }
}
