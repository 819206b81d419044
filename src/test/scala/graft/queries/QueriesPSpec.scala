package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesP pack (text hygiene + stream semantics). */
class QueriesPSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q65 PII scrub: every constructed row has exactly one email+phone, zero leaks") {
    val rows = SparkEntry.queries("q65_pii_scrub")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_rows")
      assert(r.getAs[Long]("n_emails") == n, "one constructed email per row")
      assert(r.getAs[Long]("n_phones") == n, "one constructed phone per row")
      assert(r.getAs[Long]("n_leaks") == 0L, "redaction must remove every match")
      assert(r.getAs[Long]("chars_removed") > 0L)
    }
  }

  test("q66 normalize: noisy variants all round-trip; union dedups 2n → n") {
    val rows = SparkEntry.queries("q66_normalize_match")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_rows")
      assert(r.getAs[Long]("n_roundtrip_ok") == n, "normalizer must undo the noise")
      assert(r.getAs[Long]("n_distinct_norm") <= n / 2,
        "original+noisy must collapse to at most one key per doc")
    }
  }

  test("q68 token diversity: bounds and top-share consistency") {
    val rows = SparkEntry.queries("q68_token_diversity")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val div = r.getAs[Long]("simpson_div_bp")
      assert(div >= 0 && div < 10000)
      assert(r.getAs[Long]("top_share_bp") * r.getAs[Long]("n_types") >= 10000 - r.getAs[Long]("n_types"),
        "top token share can't be below uniform share")
      assert(r.getAs[Long]("n_types") <= r.getAs[Long]("n_tokens"))
    }
  }

  test("q76 late events: late fraction bounded, counts consistent") {
    val rows = SparkEntry.queries("q76_late_events")(spark, dir).collect()
    assert(rows.nonEmpty)
    val (n, late) = rows.map(r =>
      (r.getAs[Long]("n_events"), r.getAs[Long]("n_late"))).reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    assert(late < n, "not every event can be late")
    rows.foreach { r =>
      assert(r.getAs[Long]("late_bp") == r.getAs[Long]("n_late") * 10000 / r.getAs[Long]("n_events"))
    }
  }
}
