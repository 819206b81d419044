package graft.tools
import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._
object ProbeG {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("probe-g")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val lp = Tables.t(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey")).distinct()
    time("lp-count")(println("lp=" + lp.count()))
    val e = lp.select(col("ok"), col("l_partkey").as("a"))
      .join(lp.select(col("ok"), col("l_partkey").as("b")), Seq("ok"))
      .where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("w"))
      .where(col("w") >= 2)
      .select("a", "b")
    time("edges-count")(println("edges=" + e.count()))
    time("edges-count2")(println("edges=" + e.count()))
    val ec = e.cache(); time("edges-cache")(ec.count())
    val deg = ec.select(col("a").as("v")).unionAll(ec.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    time("deg")(deg.where(col("deg") >= 3).count())
    spark.stop()
  }
}
