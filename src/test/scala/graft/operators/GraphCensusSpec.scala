package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** One-task vs distributed path equality for the bounded graph censuses
  * on random graphs (the branch is a pure optimization: same counts). */
class GraphCensusSpec extends SparkSpec {

  private def randomEdges(seed: Int, nNodes: Int, nEdges: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val pairs = (1 to nEdges).map { _ =>
      val a = rnd.nextInt(nNodes).toLong
      val b = rnd.nextInt(nNodes).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct
    import spark.implicits._
    pairs.toDF("a", "b")
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("kcoreCensus: one-task path equals distributed path") {
    for (seed <- 1 to 3) {
      val e = randomEdges(seed, nNodes = 60, nEdges = 150).cache()
      val fast = rows(GraphCensus.kcoreCensus(e, "a", "b", k = 3, rounds = 3)
        .orderBy("round"))
      val dist = rows(GraphCensus.kcoreCensus(e, "a", "b", k = 3, rounds = 3,
        oneTaskMaxEdges = 0L).orderBy("round"))
      assert(fast === dist, s"seed=$seed")
      assert(fast.size === 3)
      // survivor counts never grow round-over-round
      val edgeCounts = fast.map(_(2).asInstanceOf[Long])
      assert(edgeCounts.zip(edgeCounts.tail).forall { case (x, y) => y <= x })
    }
  }

  test("bfsCensus: one-task path equals distributed path") {
    for (seed <- 1 to 3) {
      val e = randomEdges(seed + 10, nNodes = 80, nEdges = 120).cache()
      val fast = rows(GraphCensus.bfsCensus(e, "a", "b", hops = 3)
        .orderBy("hop"))
      val dist = rows(GraphCensus.bfsCensus(e, "a", "b", hops = 3,
        oneTaskMaxEdges = 0L).orderBy("hop"))
      assert(fast === dist, s"seed=$seed")
      assert(fast.size === 3)
      // reached is monotone non-decreasing and >= frontier + 1 (source)
      val reached = fast.map(_(2).asInstanceOf[Long])
      assert(reached.zip(reached.tail).forall { case (x, y) => y >= x })
    }
  }

  test("bfsCensus: empty edge list yields no rows") {
    import spark.implicits._
    val e = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(GraphCensus.bfsCensus(e, "a", "b", hops = 3).count() === 0L)
  }

  test("doubleSweep: one-task path equals distributed path") {
    for (seed <- 1 to 3) {
      val e = randomEdges(seed + 20, nNodes = 80, nEdges = 120).cache()
      val fast = rows(GraphCensus.doubleSweep(e, "a", "b", hops = 4)
        .orderBy("phase"))
      val dist = rows(GraphCensus.doubleSweep(e, "a", "b", hops = 4,
        oneTaskMaxEdges = 0L).orderBy("phase"))
      assert(fast === dist, s"seed=$seed")
      assert(fast.size === 2)
      // phase 2 starts at a node reached by phase 1, so in the same
      // component: both sweeps reach the identical vertex set when the
      // hop bound is not binding on either.
      val eccs = fast.map(_(2).asInstanceOf[Long])
      assert(eccs.forall(x => x >= 0 && x <= 4))
    }
  }
}
