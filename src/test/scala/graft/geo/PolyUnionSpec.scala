package graft.geo

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PolyUnionSpec extends SparkSpec {

  private def rects(rows: (String, Long, Long, Long, Long)*) = {
    import spark.implicits._
    rows.toSeq.toDF("grp", "x0", "x1", "y0", "y1")
  }

  private def union1(rows: (String, Long, Long, Long, Long)*): (Long, Long) = {
    val r = PolyUnion.dissolveArea(rects(rows: _*), Seq("grp"))
      .select("sum_part_area", "union_area").head()
    (r.getLong(0), r.getLong(1))
  }

  test("single rect: union equals its own area") {
    assert(union1(("a", 0L, 10L, 0L, 5L)) == (50L, 50L))
  }

  test("disjoint rects: union equals sum of parts") {
    val (s, u) = union1(("a", 0L, 10L, 0L, 5L), ("a", 20L, 30L, 10L, 20L))
    assert(s == 150L && u == 150L)
  }

  test("inclusion-exclusion on two overlapping rects") {
    // A=[0,10)x[0,10) area 100, B=[5,15)x[5,15) area 100, A∩B=[5,10)² area 25
    val (s, u) = union1(("a", 0L, 10L, 0L, 10L), ("a", 5L, 15L, 5L, 15L))
    assert(s == 200L && u == 175L)
  }

  test("containment collapses to the outer rect") {
    val (s, u) = union1(("a", 0L, 100L, 0L, 100L), ("a", 10L, 20L, 10L, 20L))
    assert(s == 10100L && u == 10000L)
  }

  test("duplicate parts count once in the union") {
    val (s, u) = union1(("a", 0L, 10L, 0L, 10L), ("a", 0L, 10L, 0L, 10L))
    assert(s == 200L && u == 100L)
  }

  test("L-shape decomposition: overlapping decomposition unions exactly") {
    // vertical bar [0,4)x[0,10) + horizontal bar [0,10)x[0,4): L-shape
    // area = 40 + 40 - 16 = 64
    val (s, u) = union1(("a", 0L, 4L, 0L, 10L), ("a", 0L, 10L, 0L, 4L))
    assert(s == 80L && u == 64L)
  }

  test("dissolve groups independently; conservation holds per group") {
    val df = rects(
      ("a", 0L, 10L, 0L, 10L), ("a", 5L, 15L, 5L, 15L),
      ("b", 0L, 2L, 0L, 2L), ("b", 10L, 12L, 10L, 12L))
    val out = PolyUnion.dissolveArea(df, Seq("grp"))
      .orderBy("grp").collect()
    assert(out.length == 2)
    val a = out(0); val b = out(1)
    assert(a.getAs[Long]("union_area") == 175L)
    assert(b.getAs[Long]("union_area") == 8L)
    // conservation: union never exceeds sum of parts
    out.foreach(r =>
      assert(r.getAs[Long]("union_area") <= r.getAs[Long]("sum_part_area")))
  }

  test("clipParts/intersectionArea: |A∩B| = |A| + |B| − |A∪B| (rect case)") {
    val a = rects(("g", 0L, 10L, 0L, 10L))
    val b = rects(("g", 5L, 15L, 5L, 15L))
    val inter = PolyUnion.intersectionArea(a, b, Seq("grp"))
      .head().getAs[Long]("intersection_area")
    val un = PolyUnion.dissolveArea(a.unionByName(b), Seq("grp"))
      .head().getAs[Long]("union_area")
    assert(inter == 25L && un == 175L && inter == 100L + 100L - un)
  }

  test("intersection with overlapping clip parts is exact (no double count)") {
    // B's two rects overlap each other AND A: clipped parts overlap,
    // the final dissolve must collapse them
    val a = rects(("g", 0L, 20L, 0L, 20L))
    val b = rects(("g", 0L, 10L, 0L, 10L), ("g", 5L, 15L, 5L, 15L))
    val inter = PolyUnion.intersectionArea(a, b, Seq("grp"))
      .head().getAs[Long]("intersection_area")
    assert(inter == 175L) // = |B's union|, since B ⊂ A
  }

  test("disjoint intersection yields no group row") {
    val a = rects(("g", 0L, 5L, 0L, 5L))
    val b = rects(("g", 10L, 15L, 10L, 15L))
    assert(PolyUnion.intersectionArea(a, b, Seq("grp")).count() == 0)
  }

  test("random overlapping sets: union bounded by sum and by bbox") {
    val rows = (0 until 60).map { i =>
      val x = (i * 37 % 50).toLong; val y = (i * 53 % 40).toLong
      ("g" + (i % 3), x, x + 7L, y, y + 5L)
    }
    val out = PolyUnion.dissolveArea(rects(rows: _*), Seq("grp")).collect()
    assert(out.length == 3)
    out.foreach { r =>
      val u = r.getAs[Long]("union_area")
      assert(u <= r.getAs[Long]("sum_part_area"))
      assert(u > 0 && u <= 57L * 45L) // inside the coordinate bbox
    }
  }
}
