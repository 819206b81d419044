package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesDI pack (bandit replay, IPS, unit entropy,
  * stay-points). */
class QueriesDISpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q443 replay: matched <= steps, rewards <= matched, ~1/5 match rate") {
    val rows = SparkEntry.queries("q443_bandit_replay")(spark, dir).collect()
    assert(rows.nonEmpty)
    val steps = rows.map(_.getAs[Long]("steps")).sum
    val matched = rows.map(_.getAs[Long]("matched")).sum
    assert(matched <= steps)
    rows.foreach { r =>
      assert(r.getAs[Long]("rewards") <= r.getAs[Long]("matched"))
      assert(r.getAs[Long]("match_bp") <= 10000)
    }
    // the logged log is ~uniform over 5 arms; any fixed policy matches
    // a ~20% slice — replay keeps a meaningful but minority fraction
    assert(matched * 100 / steps >= 5 && matched * 100 / steps <= 60,
      s"replay match rate implausible: $matched/$steps")
  }

  test("q443: partitioning invariance at 1 partition") {
    val a = SparkEntry.queries("q443_bandit_replay")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val b = SparkEntry.queries("q443_bandit_replay")(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(a == b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("q444 IPS: identity — IPS equals direct when propensities are exact") {
    val rows = SparkEntry.queries("q444_ips_estimator")(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    // IPS with the TRUE logging propensity is unbiased; with the
    // empirical share and integer truncation it lands within the
    // bp-truncation envelope of the direct estimate.
    val bias = math.abs(r.getAs[Long]("bias_micro"))
    assert(bias <= r.getAs[Long]("direct_micro") / 100 + 2000,
      s"IPS should closely track direct: bias=$bias")
    assert(r.getAs[Long]("pi_p_bp") > 0)
  }

  test("q445 entropy: char entropy below word entropy, ratios positive") {
    val rows = SparkEntry.queries("q445_unit_entropy")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("h_word_micro") > r.getAs[Long]("h_char_micro"),
        "word distribution has far more support than the character set")
      assert(r.getAs[Long]("h_char_micro") > 0)
      assert(r.getAs[Long]("nc") > r.getAs[Long]("nw"))
      assert(r.getAs[Long]("chars_per_word_milli") > 1000)
    }
  }

  test("q446 stay-points: accounting bounds hold") {
    val rows = SparkEntry.queries("q446_staypoints")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("dwell_pts") >= 2 * r.getAs[Long]("episodes"))
      assert(r.getAs[Long]("dwell_pts") <= r.getAs[Long]("points"))
      assert(r.getAs[Long]("longest") <= r.getAs[Long]("dwell_pts") ||
        r.getAs[Long]("episodes") == 0)
    }
  }
}
