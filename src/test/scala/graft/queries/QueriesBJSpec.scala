package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesBJ pack (new-vs-returning, decile
  * migration, burstiness, novelty curve). */
class QueriesBJSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q246 mix: day 0 is all-new, shares in range") {
    val rows = SparkEntry.queries("q246_new_vs_returning")(spark, dir).collect()
    assert(rows.nonEmpty)
    val first = rows.minBy(_.getAs[Long]("day"))
    assert(first.getAs[Long]("new_share_bp") == 10000L,
      "every user on the first day is first-seen")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_new") <= r.getAs[Long]("n_events"))
    }
  }

  test("q247 migration: customers conserved across the matrix") {
    val rows = SparkEntry.queries("q247_decile_migration")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("pre_decile") >= 0L && r.getAs[Long]("pre_decile") <= 10L)
      assert(r.getAs[Long]("post_decile") >= 0L && r.getAs[Long]("post_decile") <= 10L)
      assert(r.getAs[Long]("pre_decile") + r.getAs[Long]("post_decile") > 0L,
        "(0,0) cell cannot exist — every row was in at least one half")
    }
  }

  test("q248 burstiness: fano >= 0, totals positive") {
    val rows = SparkEntry.queries("q248_burstiness")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("fano_milli") >= 0L)
      assert(r.getAs[Long]("total") > 0L)
    }
  }

  test("q249 novelty: cumulative share monotone to 10000, decile 1 largest") {
    val rows = SparkEntry.queries("q249_novelty_curve")(spark, dir).collect()
    assert(rows.nonEmpty)
    val sorted = rows.sortBy(_.getAs[Long]("decile"))
    val shares = sorted.map(_.getAs[Long]("cum_share_bp"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    assert(shares.last == 10000L)
    val news = sorted.map(_.getAs[Long]("n_new"))
    assert(news.head == news.max,
      "the first decile sees every trigram for the first time most often")
  }
}
