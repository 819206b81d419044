package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev-only: time a single named query from SparkEntry. */
object ProbeQ22 {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q22_grid_subdivide"
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("probe-one")
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"[probe] run$i $name rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
