package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Invariants for the QueriesCX pack (RD, Kaplan–Meier, info-gain split,
  * native session windows). */
class QueriesCXSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q403 RD: one row, populated sides, jump is the intercept gap") {
    val rows = SparkEntry.queries("q403_regression_discontinuity")(spark, dir)
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("n_left") > 0 && r.getAs[Long]("n_right") > 0)
    assert(r.getAs[Long]("jump_micro") ==
      r.getAs[Long]("b0r_micro") - r.getAs[Long]("b0l_micro"))
    // line counts are 1..7, so both local intercepts live in that range
    assert(r.getAs[Long]("b0l_micro") > 0 && r.getAs[Long]("b0l_micro") < 8000000)
    assert(r.getAs[Long]("b0r_micro") > 0 && r.getAs[Long]("b0r_micro") < 8000000)
  }

  test("q404 KM: survival non-increasing, at-risk non-increasing, S within [0,1]") {
    val rows = SparkEntry.queries("q404_kaplan_meier")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("segment")).foreach { case (_, g) =>
      val byD = g.sortBy(_.getAs[Long]("d"))
      assert(byD.map(_.getAs[Long]("d")).toSeq == (0L until byD.length).toSeq)
      val s = byD.map(_.getAs[Long]("s_micro"))
      assert(s.forall(v => v >= 0 && v <= 1000000))
      assert(s.zip(s.tail).forall { case (a, b) => b <= a },
        "the product-limit curve can only fall")
      val risk = byD.map(_.getAs[Long]("at_risk"))
      assert(risk.zip(risk.tail).forall { case (a, b) => b <= a },
        "the risk set shrinks by conversions + censorings")
    }
  }

  test("q405 info gain: non-negative gain, interior split, brand coverage") {
    val rows = SparkEntry.queries("q405_info_gain_split")(spark, dir).collect()
    assert(rows.length == 25, "one best split per brand")
    rows.foreach { r =>
      assert(r.getAs[Long]("gain_pico") >= 0,
        "information gain is non-negative for any split")
      val (rk, n) = (r.getAs[Long]("split_rank"), r.getAs[Long]("n"))
      assert(rk >= 1 && rk < n, "split must leave both children non-empty")
      assert(r.getAs[Long]("pos_total") <= n)
    }
  }

  test("q406 native session_window equals manual gap-break sessionization") {
    val rows = SparkEntry.queries("q406_session_window")(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events"),
          r.getAs[Long]("max_span_ms"))).toMap
    val w = Window.partitionBy("user_id").orderBy("ms")
    val manual = graft.Tables.t(spark, dir, "events")
      .selectExpr("user_id", "ts DIV 1000000 AS ms")
      .withColumn("brk", when(col("ms") - lag("ms", 1).over(w) >= 1800000L ||
        lag("ms", 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("sid", sum("brk").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("c"), (max("ms") - min("ms")).as("span"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("ns"), sum("c").as("ne"), max("span").as("sp"))
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("ns"), r.getAs[Long]("ne"), r.getAs[Long]("sp"))).toMap
    assert(rows == manual,
      "the native merging-window operator must agree with the islands form")
  }
}
