package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesDT pack (Viterbi, energy distance,
  * overbooking, IV). */
class QueriesDTSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q487 Viterbi: path length matches days, score dominates greedy") {
    val rows = SparkEntry.queries("q487_viterbi")(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val path = r.getAs[String]("path")
      assert(path.length == r.getAs[Long]("n_days"))
      assert(path.forall(c => c == 'A' || c == 'B'))
      assert(r.getAs[Long]("n_high") == path.count(_ == 'A'))
      assert(r.getAs[Long]("switches") ==
        path.zip(path.drop(1)).count { case (a, b) => a != b })
      assert(r.getAs[Long]("v_best") < 0, "log-probabilities are negative")
    }
  }

  test("q487: partitioning invariance at 1 partition") {
    val a = SparkEntry.queries("q487_viterbi")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val b = SparkEntry.queries("q487_viterbi")(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(a == b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("q488 energy distance: non-negative up to DIV slack") {
    val rows = SparkEntry.queries("q488_energy_distance")(spark, dir)
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("energy_milli") >= -1,
        "energy distance >= 0 (it is a metric between distributions)")
      assert(r.getAs[Long]("denom") ==
        r.getAs[Long]("n") * r.getAs[Long]("n") *
          r.getAs[Long]("m") * r.getAs[Long]("m"))
    }
  }

  test("q489 overbooking: exactly one best level, EV peaks inside range") {
    val rows = SparkEntry.queries("q489_overbooking")(spark, dir)
      .collect().sortBy(_.getAs[Long]("book"))
    assert(rows.length == 6)
    assert(rows.map(_.getAs[Long]("is_best")).sum == 1)
    rows.foreach { r =>
      assert(r.getAs[Long]("ev_milli") <= 20L * 100 * 1000,
        "EV bounded by full-house revenue")
    }
    // booking exactly capacity always has non-negative EV
    assert(rows.head.getAs[Long]("ev_milli") >= 0)
  }

  test("q490 IV: Wald identity reproduced from components") {
    val r = SparkEntry.queries("q490_iv_wald")(spark, dir).collect().head
    val (itt, fs, late) = (r.getAs[Long]("itt_micro"),
      r.getAs[Long]("fs_micro"), r.getAs[Long]("late_micro"))
    if (fs != 0) assert(late == itt * 1000000L / fs)
    assert(math.abs(fs) <= 1000000)
    assert(math.abs(itt) <= 1000000)
  }
}
