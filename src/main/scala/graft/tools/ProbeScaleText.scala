package graft.tools

import graft.{GraftSession, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Dev-only text-family scale probe: replicates `documents` by an integer
  * factor (distinct doc_ids, rotated text so content varies) into a temp
  * table dir and times the REAL registered text queries against it —
  * the §5 linearity evidence for the tokenize/fingerprint/LM family
  * (ProbeScale covers the dedup chain, ProbeScaleAnn the ANN family).
  *
  * Usage: ProbeScaleText [factor] [query...]; default factor=10 over the
  * text headliners at SPARK_GRAFT_SF_DIR.
  */
object ProbeScaleText {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("probe-scale-text")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q50_langid", "q51_quality", "q54_vocab", "q57_bigram_lm",
        "q58_segment_dedup", "q59_repetition", "q101_bpe_merge", "q68_token_diversity")

    val base = Tables.t(spark, dir, "documents")
    val big = (0 until factor).map { k =>
      base.select(
        (col("doc_id") + lit(k * 10000000L)).as("doc_id"),
        concat(substring(col("text"), k + 1, 1 << 20),
          substring(col("text"), 1, k)).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
    val tmp = java.nio.file.Files.createTempDirectory("graft-scale-text").toString
    big.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    println(s"[scale-text] documents = ${Tables.t(spark, tmp, "documents").count()} (${factor}x)")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scale-text] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    for (q <- names) {
      time(s"$q @1x")(SparkEntry.queries(q)(spark, dir).count())
      time(s"$q @${factor}x")(SparkEntry.queries(q)(spark, tmp).count())
    }
    spark.stop()
  }
}
