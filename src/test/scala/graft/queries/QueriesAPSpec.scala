package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesAP pack. */
class QueriesAPSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q172 Benford: digits 1-9; shares sum to ~10000; constants are the true table") {
    val rows = SparkEntry.queries("q172_benford")(spark, dir).collect()
    assert(rows.map(_.getAs[Number]("digit").longValue).toSet.subsetOf((1L to 9L).toSet))
    val shareSum = rows.map(_.getAs[Number]("share_bp").longValue).sum
    assert(shareSum >= 10000 - rows.length && shareSum <= 10000)
    rows.foreach { r =>
      val d = r.getAs[Number]("digit").intValue
      val expected = math.floor(math.log10(1.0 + 1.0 / d) * 10000).toLong
      assert(r.getAs[Number]("benford_bp").longValue == expected, s"digit $d")
    }
  }

  test("q173 Pareto: 80% threshold is minimal; decile share recomputes") {
    val r = SparkEntry.queries("q173_pareto")(spark, dir).collect().head
    val revs = graft.Tables.t(spark, dir, "events")
      .where("event_type = 'purchase'")
      .selectExpr("user_id", "CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc")
      .groupBy("user_id").sum("vc").collect()
      .map(x => x.getLong(0) -> x.getLong(1)).sortBy(x => (-x._2, x._1))
    val tot = revs.map(_._2).sum
    var cum = 0L; var k = 0
    while (cum * 10 < tot * 8) { cum += revs(k)._2; k += 1 }
    assert(r.getAs[Number]("users_for_80pct").longValue == k.toLong)
    assert(r.getAs[Number]("n_users").longValue == revs.length.toLong)
    val decile = revs.take(revs.length / 10).map(_._2).sum
    assert(r.getAs[Number]("top_decile_share_bp").longValue == decile * 10000 / tot)
  }
}
