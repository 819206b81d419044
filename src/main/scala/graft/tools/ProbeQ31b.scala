package graft.tools
import graft.{GraftSession, Tables}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
object ProbeQ31b {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("probe-q31b")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val base = Tables.t(spark, dir, "documents").withColumn("w", TextFunctions.words(col("text")))
    time("explode-words")(base.select(explode(col("w"))).count())
    val ng = base.withColumn("sh0", TextFunctions.wordNgrams("w", 3))
    time("explode-ngrams-nodistinct")(ng.select(col("doc_id"), explode(col("sh0"))).count())
    val ngd = base.withColumn("sh0", array_distinct(TextFunctions.wordNgrams("w", 3)))
    time("explode-ngrams-distinct")(ngd.select(col("doc_id"), explode(col("sh0"))).count())
    val mat = ngd.select(col("doc_id"), col("sh0"))
    mat.cache().count()
    time("explode-precomputed")(mat.select(col("doc_id"), explode(col("sh0"))).count())
    spark.stop()
  }
}
