package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev-only: sweep EVERY registered query's physical plan for scale
  * red flags (CartesianProduct; zero codegen spans) at a small SF. */
object PlanScan {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("plan-scan")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    var bad = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        df.collect()
        val plan = df.queryExecution.executedPlan.toString
        val cart = plan.contains("CartesianProduct")
        val wsc = "\\*\\(\\d+\\)".r.findFirstIn(plan).isDefined
        if (cart || !wsc) {
          bad += 1
          println(s"FLAG $name cartesian=$cart codegen=$wsc")
        }
      } catch { case e: Throwable =>
        bad += 1; println(s"FAIL $name ${e.getMessage.take(120)}")
      }
    }
    println(s"[planscan] flagged=$bad of ${SparkEntry.queries.size}")
    spark.stop()
  }
}
