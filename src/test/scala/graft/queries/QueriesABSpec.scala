package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesAB pack. */
class QueriesABSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q121 boxplot: quartile ordering, outliers verified independently") {
    val byType = graft.Tables.t(spark, dir, "events")
      .selectExpr("event_type", "CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc")
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).sorted).toMap
    val rows = SparkEntry.queries("q121_boxplot_outliers")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val vs = byType(r.getAs[String]("event_type"))
      val n = vs.length
      val q1 = vs((n * 25 + 99) / 100 - 1)
      val q3 = vs((n * 75 + 99) / 100 - 1)
      assert(r.getAs[Long]("q1_cents") == q1)
      assert(r.getAs[Long]("q3_cents") == q3)
      assert(q1 <= q3)
      val iqr = q3 - q1
      val expOut = vs.count(v => 2 * v < 2 * q1 - 3 * iqr || 2 * v > 2 * q3 + 3 * iqr)
      assert(r.getAs[Long]("n_outliers") == expOut,
        s"outliers for ${r.getString(0)}: got ${r.getAs[Long]("n_outliers")}, want $expOut")
    }
  }
}
