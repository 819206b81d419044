package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesDF pack (Kruskal–Wallis, Friedman, ESD). */
class QueriesDFSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q432 KW: rank-sum conservation and H >= 0 (within quantization)") {
    val rows = SparkEntry.queries("q432_kruskal_wallis")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 7)
    val n = rows.map(_.getAs[Long]("n_days")).sum
    assert(rows.map(_.getAs[Long]("n_total")).distinct.head == n)
    // sum of doubled midranks over everything = 2 * N(N+1)/2 = N(N+1)
    assert(rows.map(_.getAs[Long]("r2_sum")).sum == n * (n + 1))
    val h = rows.map(_.getAs[Long]("h_micro")).distinct
    assert(h.length == 1)
    assert(h.head >= -3000000, "H is >= 0 up to the x2520 floor slack")
  }

  test("q433 Friedman: within-day rank sums conserve, chi2 bounded") {
    val rows = SparkEntry.queries("q433_friedman")(spark, dir).collect()
    assert(rows.length == 5)
    val n = rows.map(_.getAs[Long]("n_days")).distinct
    assert(n.length == 1, "complete blocks only: same day count per type")
    val k = rows.length.toLong
    // per complete day the doubled ranks sum to k(k+1); across n days:
    assert(rows.map(_.getAs[Long]("r2_sum")).sum == n.head * k * (k + 1))
    val chi = rows.map(_.getAs[Long]("chi2_micro")).distinct
    assert(chi.length == 1)
    // chi2 is bounded above by n*(k-1) scaled
    assert(chi.head >= -1000000 &&
      chi.head <= n.head * (k - 1) * 1000000)
  }

  test("q434 ESD: rounds remove distinct days, deviations shrink") {
    val rows = SparkEntry.queries("q434_esd_peel")(spark, dir).collect()
    assert(rows.length == 15, "3 rounds x 5 types")
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val days = rs.map(_.getAs[Long]("d"))
      assert(days.distinct.length == 3, "each round peels a new day")
      // flagged rounds must be a prefix under re-computation semantics:
      // once a round is unflagged the remaining set is within 3 sigma,
      // but later rounds may flag again only if moments shrank — allow
      // any pattern, just require booleans present
      rs.foreach(r => r.getAs[Boolean]("flagged"))
    }
  }
}
