package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Dev-only: sweep EVERY registered query's physical plan for scale
  * red flags at a small SF:
  *   - CartesianProduct anywhere;
  *   - zero whole-stage-codegen spans;
  *   - unpartitioned WindowExec over a non-aggregated input — the
  *     "WindowExec: No Partition Defined" single-task serializer on an
  *     unbounded row domain. Windows over aggregates are allowed only
  *     when the aggregate's domain is bounded by construction; those
  *     are reported as info (`aggwin=`) so reviewers can audit them.
  */
object PlanScan {

  /** Queries whose FINAL frame is legitimately a LocalTableScan of
    * driver-computed rows (bounded-census driver finishes; the heavy
    * distributed stages ran as earlier jobs). Any query outside this
    * list whose plan degenerates to a local relation is FLAGGED. */
  val DriverFinish: Set[String] = Set(
    "q463_als_rank1", "q506_bradley_terry", "q535_char_entropy",
    "q597_bradley_terry", "q625_pca_top2",
    // round-9 bounded-census finishes
    "q561_katz_centrality", "q428_bipartite_audit")
  private def kids(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
    case s: QueryStageExec => Seq(s.plan)
    case r: ReusedExchangeExec => Seq(r.child)
    case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
      Seq(m.relation.cachedPlan) // windows hidden behind .cache() count too
    case _ => p.children
  }

  private def walk(p: SparkPlan): Seq[SparkPlan] =
    p +: kids(p).flatMap(walk)

  /** A window input is bounded when an aggregate OR a limit sits
    * below it — a window over a top-k's ≤k rows never serializes
    * meaningful volume. */
  private def hasAggBelow(p: SparkPlan): Boolean =
    walk(p).exists { n =>
      n.isInstanceOf[BaseAggregateExec] ||
        n.getClass.getSimpleName.contains("Limit") ||
        n.isInstanceOf[org.apache.spark.sql.execution.TakeOrderedAndProjectExec]
    }

  /** (rawGlobalWindows, aggGlobalWindows) below `root`. */
  def globalWindows(root: SparkPlan): (Int, Int) = {
    var raw = 0; var agg = 0
    walk(root).foreach {
      case w: WindowExec if w.partitionSpec.isEmpty =>
        if (hasAggBelow(w.child)) agg += 1 else raw += 1
      case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
        if (hasAggBelow(w.child)) agg += 1 else raw += 1
      case _ =>
    }
    (raw, agg)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("plan-scan")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val only = args.toSet
    var bad = 0
    var aggTotal = 0
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.contains(n) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, dir)
          df.collect() // materialize AQE final plan
          val plan = df.queryExecution.executedPlan
          val planStr = plan.toString
          val cart = planStr.contains("CartesianProduct")
          // AQE propagates EmptyRelation through empty intermediate
          // results at tiny SFs — nothing executes, so "no codegen
          // span" is vacuous there (q214/q216 at sf0.001). The
          // driver-finish pattern also ends in a LocalTableScan of
          // driver-computed rows with no distributed source — the heavy
          // Spark stages ran as earlier census jobs that PlanScan's
          // per-query root can't see — but ONLY for the explicit
          // allowlist below (r8 advice: a plan-shape heuristic would let
          // a query that accidentally degenerates to a literal local
          // plan slip through the codegen gate unflagged).
          val wsc = "\\*\\(\\d+\\)".r.findFirstIn(planStr).isDefined ||
            planStr.contains("EmptyRelation") ||
            (planStr.contains("LocalTableScan") &&
              !planStr.contains("Scan parquet") &&
              PlanScan.DriverFinish(name))
          val (rawWin, aggWin) = globalWindows(plan)
          aggTotal += aggWin
          if (cart || !wsc || rawWin > 0) {
            bad += 1
            println(s"FLAG $name cartesian=$cart codegen=$wsc rawGlobalWindow=$rawWin")
          } else if (aggWin > 0) {
            println(s"info $name aggwin=$aggWin")
          }
        } catch { case e: Throwable =>
          bad += 1; println(s"FAIL $name ${e.getMessage.take(120)}")
        }
      }
    println(s"[planscan] flagged=$bad of ${SparkEntry.queries.size} (agg-domain global windows: $aggTotal)")
    spark.stop()
  }
}
