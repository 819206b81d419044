package graft.tools

import graft.GraftSession
import graft.Tables.t
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Dev-only: stage timings of q422's census build. */
object ProbeTg {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val s = GraftSession.get("probe-tg")
    def tm[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val base = t(s, dir, "documents")
      .repartition(col("doc_id"))
      .withColumn("w", TextFunctions.words(col("text")))
      .where(size(col("w")) >= 3)
    for (_ <- 1 to 2) {
      tm("words only")(base.select(size(col("w"))).agg(sum("size(w)")).collect())
      tm("gramset build")(base
        .select(col("source"), TextFunctions.wordNgramSet(col("w"), 3).as("gs"))
        .select(sum(size(col("gs")))).collect())
      tm("explode")(base
        .select(col("source"), TextFunctions.wordNgramSet(col("w"), 3).as("gs"))
        .select(col("source"), explode(col("gs")).as("g")).count())
      tm("explode+distinct+collect")(base
        .select(col("source"), TextFunctions.wordNgramSet(col("w"), 3).as("gs"))
        .select(col("source"), explode(col("gs")).as("g"))
        .distinct().collect().length)
    }
    s.stop()
  }
}
