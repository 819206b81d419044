package graft.operators

import graft.SparkSpec
import graft.dedup.Components
import org.scalacheck.Gen

/** Property tests (random inputs, brute-force references) for the
  * round-4 algorithmic kernels. */
class RelationalPropSpec extends SparkSpec {
  import spark.implicits._

  test("prorate conserves each group's total and bumps exactly the remainder (random)") {
    val gen = for {
      nGroups <- Gen.chooseNum(1, 8)
      rows <- Gen.listOfN(60, for {
        g <- Gen.chooseNum(1, nGroups)
        w <- Gen.chooseNum(1L, 50L)
        tie <- Gen.chooseNum(1L, 1000000L)
      } yield (g.toLong, w, tie))
      totals <- Gen.listOfN(8, Gen.chooseNum(100L, 100000L))
    } yield (rows, totals)
    val (rows, totals) = gen.sample.get
    val df = rows.zipWithIndex
      .map { case ((g, w, tie), i) => (g, totals((g % 8).toInt), w, tie * 100 + i) }
      .toDF("grp", "total", "weight", "tie")
    val out = Relational.prorate(df, "grp", "total", "weight", "tie")
      .select("grp", "total", "weight", "alloc", "bump")
      .as[(Long, Long, Long, Long, Long)].collect()
    out.groupBy(_._1).foreach { case (_, g) =>
      val total = g.head._2
      assert(g.map(_._4).sum == total, "allocation must conserve the total")
      val floorSum = {
        val wsum = g.map(_._3).sum
        g.map(r => total * r._3 / wsum).sum
      }
      assert(g.map(_._5).sum == total - floorSum, "bumps = remainder")
      assert(g.forall(r => r._5 == 0L || r._5 == 1L))
    }
  }

  test("skyline2d equals the brute-force Pareto frontier (random point sets)") {
    val pts = Gen.listOfN(300, for {
      x <- Gen.chooseNum(0L, 40L)
      y <- Gen.chooseNum(0L, 40L)
    } yield (x, y)).sample.get
    val sky = Relational.skyline2d(pts.toDF("x", "y"), "x", "y")
      .select("x", "y", "multiplicity")
      .as[(Long, Long, Long)].collect()
    def dominates(a: (Long, Long), b: (Long, Long)): Boolean =
      a._1 <= b._1 && a._2 >= b._2 && (a._1 < b._1 || a._2 > b._2)
    val expected = pts.distinct.filter(p => !pts.exists(q => dominates(q, p))).toSet
    assert(sky.map(p => (p._1, p._2)).toSet == expected)
    sky.foreach { case (x, y, m) =>
      assert(m == pts.count(_ == ((x, y))).toLong, "multiplicity counts raw rows")
    }
  }

  test("unionFindBounded equals brute-force components (random graphs, many shapes)") {
    for (seed <- Seq(1, 42, 2026)) {
      val rnd = new scala.util.Random(seed)
      val n = 40 + rnd.nextInt(60)
      val edges = (1 to n).map { _ =>
        (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong)
      }
      // brute force: repeated relabeling to fixpoint
      val lbl = scala.collection.mutable.HashMap.empty[Long, Long]
      edges.foreach { case (a, b) =>
        lbl.getOrElseUpdate(a, a); lbl.getOrElseUpdate(b, b)
      }
      var changed = true
      while (changed) {
        changed = false
        edges.foreach { case (a, b) =>
          val m = math.min(lbl(a), lbl(b))
          if (lbl(a) != m) { lbl(a) = m; changed = true }
          if (lbl(b) != m) { lbl(b) = m; changed = true }
        }
        // propagate through label chains
        lbl.keys.toSeq.foreach { k =>
          var r = lbl(k)
          while (lbl.getOrElse(r, r) != r) r = lbl(r)
          if (lbl(k) != r) { lbl(k) = r; changed = true }
        }
      }
      val got = Components.unionFindBounded(edges.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(got == lbl.toMap, s"seed $seed")
    }
  }
}
