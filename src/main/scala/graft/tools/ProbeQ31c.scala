package graft.tools
import graft.{GraftSession, Tables}
import graft.dedup.Dedup
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
object ProbeQ31c {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("probe-q31c")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val exploded = Tables.t(spark, dir, "documents")
      .withColumn("w", TextFunctions.words(col("text")))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), col("w"), explode(sequence(lit(0), size(col("w")) - 3)).as("i"))
    time("explode-pos")(exploded.count())
    val hashed = exploded.withColumn("h", Dedup.shingleHash(expr("concat_ws(' ', w[i], w[i+1], w[i+2])")))
    time("md5")(hashed.select(max(col("h"))).head)
    time("md5-again")(hashed.select(max(col("h"))).head)
    val aggs = collect_set(col("h")).as("sh") +: Dedup.minhashAggs(col("h"), 6)
    val docs = hashed.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .withColumn("sig", array((0 until 6).map(j => col(s"_mh$j")): _*))
    time("collect-set")(docs.count())
    spark.stop()
  }
}
