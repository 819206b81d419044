package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesBA pack (Holt smoothing, filter cascade,
  * boilerplate shingles, interval census, fuzzy blocking). */
class QueriesBASpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q210 holt: n_days positive, forecast = level + trend, sae >= 0") {
    val rows = SparkEntry.queries("q210_holt")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_days") > 0L)
      assert(r.getAs[Long]("forecast_milli") ==
        r.getAs[Long]("level_milli") + r.getAs[Long]("trend_milli"))
      assert(r.getAs[Long]("sae_milli") >= 0L)
      // level tracks the daily count scale: strictly positive for count data
      assert(r.getAs[Long]("level_milli") > 0L)
    }
  }

  test("q210 holt: single-type recompute matches an in-memory replay") {
    import org.apache.spark.sql.functions._
    val daily = graft.Tables.t(spark, dir, "events")
      .selectExpr("event_type", "(ts DIV 1000000) DIV 86400000 AS day")
      .groupBy("event_type", "day").agg(count(lit(1)).as("y"))
      .orderBy("event_type", "day").collect()
      .groupBy(_.getAs[String]("event_type"))
    val got = SparkEntry.queries("q210_holt")(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    daily.foreach { case (et, rows) =>
      val ys = rows.sortBy(_.getAs[Long]("day")).map(_.getAs[Long]("y"))
      var lv = ys.head * 1000L; var tr = 0L; var sae = 0L
      ys.tail.foreach { y =>
        val f = lv + tr
        sae += math.abs(y * 1000L - f)
        val nl = (300L * y * 1000L + 700L * f) / 1000L
        tr = (200L * (nl - lv) + 800L * tr) / 1000L
        lv = nl
      }
      val r = got(et)
      assert(r.getAs[Long]("level_milli") == lv, s"$et level")
      assert(r.getAs[Long]("trend_milli") == tr, s"$et trend")
      assert(r.getAs[Long]("sae_milli") == sae, s"$et sae")
    }
  }

  test("q211 cascade: every doc attributed exactly once") {
    val rows = SparkEntry.queries("q211_filter_cascade")(spark, dir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val nDocs = graft.Tables.t(spark, dir, "documents").count()
    assert(total == nDocs, "first-fail attribution must partition the corpus")
    val rules = rows.map(_.getAs[String]("rule")).toSet
    assert(rules.subsetOf(Set("short", "few_words", "no_stopwords", "repetitive", "pass")))
  }

  test("q212 boilerplate: bp bounds and source coverage") {
    val rows = SparkEntry.queries("q212_boilerplate")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") > 0L)
      val mean = r.getAs[Long]("mean_bp"); val mx = r.getAs[Long]("max_bp")
      assert(mean >= 0L && mean <= mx && mx <= 10000L)
      assert(r.getAs[Long]("n_heavy") <= r.getAs[Long]("n_docs"))
    }
  }

  test("q213 interval census: pair count = orders - customers-with-orders") {
    val rows = SparkEntry.queries("q213_interval_census")(spark, dir).collect()
    assert(rows.nonEmpty)
    val totalPairs = rows.map(_.getAs[Long]("n_pairs")).sum
    val o = graft.Tables.t(spark, dir, "orders")
    val expected = o.count() - o.select("o_custkey").distinct().count()
    assert(totalPairs == expected,
      "each customer with k orders contributes k-1 consecutive pairs")
  }

  test("q214 fuzzy blocks: exact dups have min_d 0, counts consistent") {
    // sf0.001's 200 parts have no within-block pairs at d<=4; the driver's
    // gate runs sf0.01 where the threshold bites (483 pairs)
    val rows = SparkEntry.queries("q214_fuzzy_block_match")(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_exact") <= r.getAs[Long]("n_pairs"))
      val minD = r.getAs[Long]("min_d")
      assert(minD >= 0L && minD <= 4L)
      if (r.getAs[Long]("n_exact") > 0L) assert(minD == 0L)
    }
  }
}
