package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesDQ pack (triplet LF, label noise, ESS,
  * membership inference). */
class QueriesDQSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q475 triplet: estimated accuracies in (0.5, 1] when defined") {
    val rows = SparkEntry.queries("q475_triplet_lf")(spark, dir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val a = r.getAs[Long]("est_acc_milli")
      assert(a == -1 || (a >= 500 && a <= 1000),
        s"triplet accuracy is the positive root: $a")
      assert(r.getAs[Long]("pos_votes") <= r.getAs[Long]("n"))
      assert(r.getAs[Long]("maj_pos") <= r.getAs[Long]("n"))
    }
  }

  test("q476 label noise: confusion accounting per class") {
    val rows = SparkEntry.queries("q476_label_noise")(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("correct") <= r.getAs[Long]("n"))
      val bp = r.getAs[Long]("noise_bp")
      assert(bp >= 0 && bp <= 10000)
      assert(r.getAs[Long]("conf_c") <= r.getAs[Long]("n"))
      if (r.getAs[Long]("conf_c") > 0)
        assert(r.getAs[String]("top_confusion") != r.getAs[String]("lang"))
    }
  }

  test("q477 ESS: reweighting can only lose effective sample") {
    val rows = SparkEntry.queries("q477_reweight_ess")(spark, dir).collect()
    assert(rows.nonEmpty)
    val ess = rows.map(_.getAs[Long]("ess")).distinct
    assert(ess.length == 1)
    val n = rows.map(_.getAs[Long]("c")).sum
    assert(ess.head <= n, "Kish ESS <= n by Cauchy-Schwarz")
    assert(ess.head > 0)
    rows.foreach(r => assert(r.getAs[Long]("w_milli") > 0))
    val bp = rows.map(_.getAs[Long]("ess_bp")).distinct.head
    assert(bp >= 0 && bp <= 10000)
  }

  test("q478 membership inference: rate accounting, advantage consistent") {
    val rows = SparkEntry.queries("q478_membership_inference")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("tp") <= r.getAs[Long]("n_train"))
      assert(r.getAs[Long]("fp") <= r.getAs[Long]("n_out"))
      assert(r.getAs[Long]("advantage_bp") ==
        r.getAs[Long]("tpr_bp") - r.getAs[Long]("fpr_bp"))
      // an LM assigns lower NLL to its own training docs: the attack
      // should show non-trivial positive advantage in aggregate
    }
    val adv = rows.map(_.getAs[Long]("advantage_bp"))
    assert(adv.sum > 0, "train docs score better than held-out on average")
  }
}
