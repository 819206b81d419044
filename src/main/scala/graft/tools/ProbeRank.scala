package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev-only: print the executed plan of named queries. */
object ProbeRank {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("probe-plan")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect()
      println(s"===== $name =====")
      println(df.queryExecution.executedPlan.toString.take(6000))
    }
    spark.stop()
  }
}
