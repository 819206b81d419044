package graft.tools
object P594 {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.get("p594")
    def tm[T](l: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[p594] $l: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val df = tm("build+exec")(
      graft.SparkEntry.queries("q594_bpe_train")(spark, "/root/testdata/sf0.1"))
    tm("final count")(df.count())
    spark.stop()
  }
}
