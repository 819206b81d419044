package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesR pack. */
class QueriesRSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q89 polygon area: shoelace matches the hand-computed pentagon, same for every region") {
    // pentagon offsets are translation-invariant: every region's polygon
    // has the same area. Hand shoelace: vertices (-30,-40) (20,-35)
    // (32,10) (5,45) (-25,20)
    val ring = Seq((-30, -40), (20, -35), (32, 10), (5, 45), (-25, 20))
    val twiceA = math.abs(ring.zip(ring.tail :+ ring.head)
      .map { case ((ax, ay), (bx, by)) => ax.toLong * by - bx.toLong * ay }.sum)
    val rows = SparkEntry.queries("q89_polygon_area")(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("area2") == twiceA, "translation must not change the area")
      assert(r.getAs[Long]("fill_bp") > 0 && r.getAs[Long]("fill_bp") <= 10000)
      assert(r.getAs[Long]("area2") <= 2 * r.getAs[Long]("bbox_area"))
    }
  }

  test("q92 group progress: counts add up, eta present iff something completed") {
    val rows = SparkEntry.queries("q92_group_progress")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_done") + r.getAs[Long]("n_pending") == r.getAs[Long]("n_tasks"))
      val bp = r.getAs[Long]("completion_bp")
      assert(bp >= 0 && bp <= 10000)
      if (r.getAs[Long]("n_done") > 0) assert(!r.isNullAt(r.fieldIndex("eta_s")))
      else assert(r.isNullAt(r.fieldIndex("eta_s")))
    }
  }
}
