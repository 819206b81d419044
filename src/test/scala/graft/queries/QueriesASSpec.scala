package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesAS pack (EWMA, SAX, Zipf). */
class QueriesASSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q179 EWMA: equals sequential in-memory recurrence per user") {
    val ev = graft.Tables.t(spark, dir, "events")
      .selectExpr("user_id", "ts DIV 1000000 AS ts_ms", "event_id",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val rows = SparkEntry.queries("q179_ewma")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val uid = r.getAs[Long]("user_id")
      val seq = ev.filter(_._1 == uid).sortBy(e => (e._2, e._3)).map(_._4)
      var sm = 0L; var spikes = 0L
      seq.zipWithIndex.foreach { case (v, i) =>
        if (i == 0) sm = v
        else {
          if (v > 2L * sm) spikes += 1L
          sm = (3L * sm + v) / 4L
        }
      }
      assert(r.getAs[Long]("n_events") == seq.length.toLong, s"user $uid n")
      assert(r.getAs[Long]("ewma_cents") == sm, s"user $uid ewma")
      assert(r.getAs[Long]("n_spikes") == spikes, s"user $uid spikes")
    }
  }

  test("q180 SAX: signature has n_days letters with balanced quartiles") {
    val rows = SparkEntry.queries("q180_sax")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sax = r.getAs[String]("sax")
      val m = r.getAs[Long]("n_days")
      assert(sax.length.toLong == m)
      assert(sax.forall(c => c >= 'a' && c <= 'd'))
      // exact-rank quantization: each letter's count is floor/ceil of m/4
      val counts = sax.groupBy(identity).view.mapValues(_.length).toMap
      if (m >= 4) ('a' to 'd').foreach { c =>
        val n = counts.getOrElse(c, 0).toLong
        assert(n >= m / 4 - 1 && n <= m / 4 + 2, s"letter $c count $n of $m")
      }
    }
  }

  test("q181 Zipf: equals in-memory integer-log2 OLS; slope is negative") {
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("text").collect().flatMap { r =>
        Option(r.getString(0)).toSeq.flatMap(_.trim.split("\\s+").filter(_.nonEmpty))
      }
    val tf = toks.groupBy(identity).view.mapValues(_.length.toLong).toSeq
    val ranked = tf.sortBy { case (t, c) => (-c, t) }.zipWithIndex
      .map { case ((_, c), i) =>
        def lg(x: Long) = (63 - java.lang.Long.numberOfLeadingZeros(x)).toLong
        (lg(i + 1L), lg(c))
      }
    val n = ranked.length.toLong
    val sx = ranked.map(_._1).sum; val sy = ranked.map(_._2).sum
    val sxx = ranked.map(p => p._1 * p._1).sum
    val sxy = ranked.map(p => p._1 * p._2).sum
    val num = n * sxy - sx * sy; val den = n * sxx - sx * sx
    val exp = (if (num * den >= 0) 1L else -1L) * (math.abs(num) * 1000000L / math.abs(den))
    val row = SparkEntry.queries("q181_zipf")(spark, dir).collect().head
    assert(row.getAs[Long]("n_tokens") == n)
    assert(row.getAs[Long]("zipf_slope_micro") == exp)
    assert(row.getAs[Long]("zipf_slope_micro") < 0L, "natural corpus slope must fall")
  }
}
