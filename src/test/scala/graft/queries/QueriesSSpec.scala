package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesS pack. */
class QueriesSSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q79 path signatures: paths bounded at 8 steps, user totals conserved") {
    val rows = SparkEntry.queries("q79_path_signature")(spark, dir).collect()
    assert(rows.nonEmpty)
    val users = graft.Tables.t(spark, dir, "events")
      .select("user_id").distinct().count()
    rows.foreach { r =>
      val path = r.getAs[String]("path")
      assert(path.split(">").length <= 8)
      assert(path.split(">").forall(Set("view", "click", "purchase", "signup", "error")))
    }
    // top-20 cap: total users across listed paths can't exceed the universe
    assert(rows.map(_.getAs[Long]("n_users")).sum <= users)
  }

  test("q79 path signatures: stable across reruns (collect_list order neutralized)") {
    val a = SparkEntry.queries("q79_path_signature")(spark, dir).collect().map(_.toString).toSeq
    val b = SparkEntry.queries("q79_path_signature")(spark, dir).collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("q77 epoch reconcile: every key accounted once, event totals conserved") {
    val rows = SparkEntry.queries("q77_epoch_reconcile")(spark, dir).collect()
    assert(rows.nonEmpty)
    val ev = graft.Tables.t(spark, dir, "events")
    val users = ev.select("user_id").distinct().count()
    val events = ev.count()
    assert(rows.map(_.getAs[Long]("n_keys")).sum == users)
    assert(rows.map(_.getAs[Long]("n_events")).sum == events)
  }
}
