package graft.tools

import graft.GraftSession
import graft.Tables.t
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Dev-only: does GenerateExec re-evaluate the generator child per OUTPUT
  * row? Compares explode(f(text)) against project-then-explode. */
object ProbeGen {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val s = GraftSession.get("probe-gen")
    def tm[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val base = t(s, dir, "documents").repartition(col("doc_id")).cache()
    base.count()
    for (_ <- 1 to 2) {
      tm("inline explode(words)")(base
        .select(explode(TextFunctions.words(col("text"))).as("w")).count())
      tm("project-then-explode words")(base
        .select(TextFunctions.words(col("text")).as("ws"))
        .select(explode(col("ws")).as("w")).count())
      tm("inline explode(wordNgramSet)")(base
        .select(explode(TextFunctions.wordNgramSet(
          TextFunctions.words(col("text")), 3)).as("g")).count())
      tm("project-then-explode ngramset")(base
        .select(TextFunctions.wordNgramSet(
          TextFunctions.words(col("text")), 3).as("gs"))
        .select(explode(col("gs")).as("g")).count())
    }
    s.stop()
  }
}
