package graft.tools
import graft.{GraftSession, SparkEntry}
object EntryCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("entry-check")
    val n = SparkEntry.entry(spark).count()
    println(s"[entry] rows=$n")
    spark.stop()
  }
}
