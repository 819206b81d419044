package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Physical-plan audit over EVERY registered query: the two properties
  * that must hold for the 100 TB story regardless of operator —
  * no CartesianProduct anywhere (every join has a key or a broadcast
  * side), and at least one WholeStageCodegen span (nothing has fallen
  * out of codegen wholesale, e.g. via a stray non-codegen expression at
  * the plan root). Runs at sf0.001 — plan SHAPE is SF-independent. */
class PlanQualitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("no query plan contains a CartesianProduct; all retain codegen spans") {
    val flagged = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val df = fn(spark, dir)
      df.collect() // let AQE finalize the plan
      val plan = df.queryExecution.executedPlan.toString
      val cart = plan.contains("CartesianProduct")
      val wsc = "\\*\\(\\d+\\)".r.findFirstIn(plan).isDefined
      // AQE collapses provably-empty results (q214/q216 have no pairs at
      // sf0.001) to EmptyRelation — no codegen span because nothing runs;
      // that IS the optimal plan, not a codegen regression
      val empty = plan.contains("EmptyRelation")
      // Driver-finished bounded iterations (q463/q506/q535/q597, the q625
      // pattern: one sufficient-statistics pass, then BigInt math over a
      // bounded domain) return a LocalTableScan of the finished result —
      // no scan, no exchange, nothing left to codegen. The heavy pass ran
      // (with codegen) inside the builder; the RETURNED plan is a local
      // table by design.
      val localOnly = plan.contains("LocalTableScan") &&
        !plan.contains("Scan parquet") && !plan.contains("Exchange")
      if (cart || (!wsc && !empty && !localOnly)) Some(s"$name cartesian=$cart codegen=$wsc") else None
    }
    assert(flagged.isEmpty, s"plan red flags:\n${flagged.mkString("\n")}")
  }
}
