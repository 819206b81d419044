package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded graph censuses over DERIVED edge lists (co-occurrence /
  * candidate graphs an order of magnitude smaller than the fact tables
  * they come from — the distributed aggregation upstream already
  * collapsed the volume).
  *
  * Reference analog: dense co-visibility region extraction over the
  * listing/part co-occurrence graph (beside the q184/q185/q188 censuses).
  *
  * Scale shape (the q145/unionFindBounded lesson): the support-filtered
  * edge list is dimension-bounded (nodes ⊆ part keys, edges cut by the
  * support threshold), so when it fits one task we run the whole bounded
  * iteration in a single mapPartitions pass — replacing O(rounds) driver-
  * looped shuffle jobs with exactly one. When the derived graph is still
  * large (`oneTaskMaxEdges` exceeded), both operators fall back to the
  * distributed per-round form: one degree aggregation + semi-join round
  * (k-core) / one frontier-expansion join round (BFS) per iteration —
  * linear shuffles, no all-pairs stage. Both paths are spec-asserted
  * equal (GraphCensusSpec).
  */
object GraphCensus {

  /** K-core peel census: `rounds` rounds of "drop nodes with degree < k
    * (and their edges)", emitting per-round survivor counts.
    *
    * @param edges distinct undirected edges (srcCol < dstCol, each once)
    * @return DataFrame(round BIGINT, n_nodes BIGINT, n_edges BIGINT)
    */
  def kcoreCensus(edges: DataFrame, srcCol: String, dstCol: String,
                  k: Int, rounds: Int,
                  oneTaskMaxEdges: Long = 2000000L): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    val e0 = edges.select(col(srcCol).cast("long").as("a"),
      col(dstCol).cast("long").as("b")).cache()
    val nEdges = e0.count()
    if (nEdges <= oneTaskMaxEdges) {
      val out = e0.as[(Long, Long)]
        .coalesce(1)
        .mapPartitions { it =>
          var es = it.toArray
          (1 to rounds).iterator.map { round =>
            val deg = scala.collection.mutable.HashMap.empty[Long, Int]
            es.foreach { case (a, b) =>
              deg(a) = deg.getOrElse(a, 0) + 1; deg(b) = deg.getOrElse(b, 0) + 1
            }
            es = es.filter { case (a, b) => deg(a) >= k && deg(b) >= k }
            val nodes = scala.collection.mutable.HashSet.empty[Long]
            es.foreach { case (a, b) => nodes += a; nodes += b }
            (round.toLong, nodes.size.toLong, es.length.toLong)
          }
        }
        .toDF("round", "n_nodes", "n_edges")
      // no unpersist here: it would run at plan-BUILD time, before the
      // returned frame executes, evicting the very blocks the one-task
      // pass reads (advice r4). Blocks free on GC / bench clearCache.
      out
    } else {
      // distributed peel: per round ONE degree aggregation (map-side
      // partial) + two semi-joins against the survivor set. Stats are
      // read EAGERLY (one row per round), so the previous round's cache
      // can be dropped as soon as the next round materializes —
      // cached-block memory stays O(1) in rounds, and the result is a
      // literal frame with no lineage into the dropped caches.
      var e = e0
      var acc: Seq[(Long, Long, Long)] = Nil
      for (round <- 1 to rounds) {
        val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
          .groupBy("v").agg(count(lit(1)).as("deg"))
        val keep = deg.where(col("deg") >= k).select("v")
        val prev = e
        e = e.join(keep.withColumnRenamed("v", "a"), Seq("a"), "left_semi")
          .join(keep.withColumnRenamed("v", "b"), Seq("b"), "left_semi")
          .select("a", "b")
          .cache()
        e.count()
        if (prev ne e0) prev.unpersist(false)
        val r = e.select(explode(array(col("a"), col("b"))).as("v"))
          .agg((count(lit(1)) / 2).cast("bigint").as("n_edges"),
            countDistinct("v").as("n_nodes"))
          .head()
        acc = acc :+ ((round.toLong, r.getAs[Long]("n_nodes"),
          r.getAs[Long]("n_edges")))
      }
      if (e ne e0) e.unpersist(false)
      e0.unpersist(false)
      acc.toDF("round", "n_nodes", "n_edges")
    }
  }

  /** Bounded BFS frontier census from the max-degree node (smallest-id
    * tiebreak): per hop, |new frontier| and |reached so far| (source
    * included).
    *
    * @param edges distinct undirected edges (srcCol < dstCol, each once)
    * @return DataFrame(hop BIGINT, frontier BIGINT, reached BIGINT)
    */
  def bfsCensus(edges: DataFrame, srcCol: String, dstCol: String,
                hops: Int,
                oneTaskMaxEdges: Long = 2000000L): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    val e0 = edges.select(col(srcCol).cast("long").as("a"),
      col(dstCol).cast("long").as("b")).cache()
    val nEdges = e0.count()
    if (nEdges <= oneTaskMaxEdges) {
      val out = e0.as[(Long, Long)]
        .coalesce(1)
        .mapPartitions { it =>
          val adj = scala.collection.mutable.HashMap
            .empty[Long, scala.collection.mutable.ArrayBuffer[Long]]
          def add(u: Long, v: Long): Unit =
            adj.getOrElseUpdate(u, scala.collection.mutable.ArrayBuffer.empty) += v
          var n = 0L
          it.foreach { case (a, b) => add(a, b); add(b, a); n += 1 }
          if (adj.isEmpty) Iterator.empty
          else {
            // max degree, smallest id tiebreak
            val src = adj.iterator.map { case (v, ns) => (v, ns.length) }
              .reduceLeft((x, y) =>
                if (y._2 > x._2 || (y._2 == x._2 && y._1 < x._1)) y else x)._1
            val visited = scala.collection.mutable.HashSet(src)
            var frontier = Set(src)
            (1 to hops).iterator.map { hop =>
              val next = frontier.iterator
                .flatMap(v => adj.getOrElse(v, Nil))
                .filter(!visited.contains(_)).toSet
              visited ++= next
              frontier = next
              (hop.toLong, next.size.toLong, visited.size.toLong)
            }
          }
        }
        .toDF("hop", "frontier", "reached")
      // no unpersist here — see kcoreCensus note (plan-build-time
      // unpersist would evict before the one-task pass runs)
      out
    } else {
      // distributed frontier expansion: localCheckpoint truncates each
      // round's lineage (so earlier rounds need no cache), counts are
      // read eagerly per hop, and adj/e0 drop once the loop is done —
      // the returned frame is a literal with no lineage into them.
      val adj = e0.select(col("a").as("u"), col("b").as("v"))
        .unionAll(e0.select(col("b").as("u"), col("a").as("v"))).cache()
      adj.count()
      val src = adj.groupBy("u").agg(count(lit(1)).as("deg"))
        .orderBy(col("deg").desc, col("u")).limit(1).select(col("u").as("v"))
        .localCheckpoint()
      var visited = src
      var frontier = src
      var acc: Seq[(Long, Long, Long)] = Nil
      for (hop <- 1 to hops) {
        val next = adj.join(frontier.withColumnRenamed("v", "u"), Seq("u"))
          .select("v").distinct()
          .join(visited, Seq("v"), "left_anti").localCheckpoint()
        val f = next.count()
        frontier = next
        visited = visited.unionAll(next).localCheckpoint()
        acc = acc :+ ((hop.toLong, f, visited.count()))
      }
      adj.unpersist(false)
      e0.unpersist(false)
      acc.toDF("hop", "frontier", "reached")
    }
  }

  /** Double-sweep diameter lower bound: hop-bounded BFS from the
    * max-degree node (smallest-id tiebreak), then a second BFS from the
    * farthest node reached (max hop, smallest-id tiebreak). Emits one
    * row per phase with the BFS source, its bounded eccentricity and
    * reach. One-task finish when the derived edge list is bounded;
    * distributed per-round frontier expansion (cached, like
    * [[bfsCensus]]) otherwise.
    *
    * @param edges distinct undirected edges (srcCol < dstCol, each once)
    * @return DataFrame(phase BIGINT, src BIGINT, ecc BIGINT, reached BIGINT)
    */
  def doubleSweep(edges: DataFrame, srcCol: String, dstCol: String,
                  hops: Int,
                  oneTaskMaxEdges: Long = 2000000L): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    val e0 = edges.select(col(srcCol).cast("long").as("a"),
      col(dstCol).cast("long").as("b")).cache()
    val nEdges = e0.count()
    if (nEdges <= oneTaskMaxEdges) {
      val out = e0.as[(Long, Long)]
        .coalesce(1)
        .mapPartitions { it =>
          val adj = scala.collection.mutable.HashMap
            .empty[Long, scala.collection.mutable.ArrayBuffer[Long]]
          def add(u: Long, v: Long): Unit =
            adj.getOrElseUpdate(u, scala.collection.mutable.ArrayBuffer.empty) += v
          it.foreach { case (a, b) => add(a, b); add(b, a) }
          if (adj.isEmpty) Iterator.empty
          else {
            // BFS returning (eccentricity, reached, farthest node)
            def sweep(src: Long): (Long, Long, Long) = {
              val visited = scala.collection.mutable.HashSet(src)
              var frontier = Set(src)
              var ecc = 0L
              var far = src
              var hop = 1
              while (hop <= hops && frontier.nonEmpty) {
                val next = frontier.iterator
                  .flatMap(v => adj.getOrElse(v, Nil))
                  .filter(!visited.contains(_)).toSet
                if (next.nonEmpty) { ecc = hop.toLong; far = next.min }
                visited ++= next
                frontier = next
                hop += 1
              }
              (ecc, visited.size.toLong, far)
            }
            val hub = adj.iterator.map { case (v, ns) => (v, ns.length) }
              .reduceLeft((x, y) =>
                if (y._2 > x._2 || (y._2 == x._2 && y._1 < x._1)) y else x)._1
            val (ecc1, reach1, far1) = sweep(hub)
            val (ecc2, reach2, _) = sweep(far1)
            Iterator((1L, hub, ecc1, reach1), (2L, far1, ecc2, reach2))
          }
        }
        .toDF("phase", "src", "ecc", "reached")
      // no unpersist here — see kcoreCensus note
      out
    } else {
      val adj = e0.select(col("a").as("u"), col("b").as("v"))
        .unionAll(e0.select(col("b").as("u"), col("a").as("v"))).cache()
      adj.count()
      def sweepD(srcDf: DataFrame): (DataFrame, DataFrame) = {
        // srcDf: one row (v BIGINT), lineage-truncated. Returns (phase
        // stats sans phase id, farthest-node df). localCheckpoint per
        // round keeps the iterative plan from growing (Components.scala
        // precedent) — without it the 2-phase × hops lineage overflows
        // the planner stack.
        var visited = srcDf
        var frontier = srcDf
        var ecc = 0L
        var lastNonEmpty = srcDf
        for (hop <- 1 to hops) {
          val next = adj.join(frontier.withColumnRenamed("v", "u"), Seq("u"))
            .select("v").distinct()
            .join(visited, Seq("v"), "left_anti").localCheckpoint()
          if (next.count() > 0) { ecc = hop.toLong; lastNonEmpty = next }
          frontier = next
          visited = visited.unionAll(next).localCheckpoint()
        }
        val stats = visited.agg(count(lit(1)).as("reached"))
          .crossJoin(srcDf.select(col("v").as("src")))
          .selectExpr("src", s"CAST($ecc AS BIGINT) AS ecc", "reached")
        val far = lastNonEmpty.orderBy("v").limit(1).localCheckpoint()
        (stats, far)
      }
      val hub = adj.groupBy("u").agg(count(lit(1)).as("deg"))
        .orderBy(col("deg").desc, col("u")).limit(1).select(col("u").as("v"))
        .localCheckpoint()
      val (s1, far1) = sweepD(hub)
      val (s2, _) = sweepD(far1)
      // both sweeps ran eagerly; stats/far are checkpoint-backed, so the
      // adjacency cache can drop now
      adj.unpersist(false)
      e0.unpersist(false)
      s1.selectExpr("CAST(1 AS BIGINT) AS phase", "src", "ecc", "reached")
        .unionAll(s2.selectExpr("CAST(2 AS BIGINT) AS phase", "src", "ecc",
          "reached"))
    }
  }
}
