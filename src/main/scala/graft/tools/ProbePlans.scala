package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev-only plan auditor: prints the physical-plan properties that matter
  * at 100 TB (pushed filters, pruned read schema, join strategies,
  * codegen coverage) for selected queries. */
object ProbePlans {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("probe-plans")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q01_pricing_summary", "q03_join_agg_sort", "q12_stale_scan",
      "q16_semi_anti", "q20_point_in_bbox_join", "q40_knn_brute",
      "q17_approx_distinct", "q22_grid_subdivide", "q28_interval_union",
      "q42_knn_ivf", "q54_vocab", "q71_stream_windowed")
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, dir)
      df.collect() // let AQE finalize
      val plan = df.queryExecution.executedPlan.toString
      def grep(p: String) =
        plan.linesIterator.filter(_.contains(p)).map(_.trim.take(200)).toSeq
      println(s"===== $n")
      grep("PushedFilters").foreach(l => println(s"  scan: $l"))
      grep("ReadSchema").foreach(l => println(s"  read: $l"))
      (grep("BroadcastHashJoin") ++ grep("SortMergeJoin") ++
        grep("BroadcastNestedLoopJoin") ++ grep("ShuffledHashJoin"))
        .foreach(l => println(s"  join: ${l.takeWhile(_ != ',')}"))
      // executedPlan.toString renders codegen stages as "*(n)" markers
      val wsc = plan.linesIterator.flatMap(l =>
        "\\*\\((\\d+)\\)".r.findAllMatchIn(l).map(_.group(1))).toSet.size
      println(s"  codegen spans: $wsc")
    }
    spark.stop()
  }
}
