package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-dup candidate edge list — the
  * clustering step that turns pairwise matches into dedup groups
  * ("keep the smallest doc_id per component").
  *
  * Min-label propagation to fixpoint: converges in <= diameter
  * iterations; near-dup components are shallow (stars/cliques), so this
  * terminates in 2-3 rounds in practice. Each round is one shuffle; the
  * driver loop checks convergence with a count. Lineage is truncated per
  * round (localCheckpoint) so the iterative plan doesn't grow. For
  * web-scale graphs swap in the alternating large-star/small-star
  * variant; the interface stays the same. */
object Components {

  /** @param edges DataFrame with two long columns (src, dst), undirected
    *              pairs (each pair once is fine).
    * @return DataFrame(id, label) — label = min node id in the component.
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       maxIter: Int = 20): DataFrame = {
    val und = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct()
      .localCheckpoint()
    // Each round is ONE Spark action: cache() + the convergence aggregate
    // both materializes the round's labels and returns Σ lbl. Labels only
    // ever decrease, so Σ lbl strictly decreases until the fixpoint — the
    // single agg replaces a diff join AND the separate eager-checkpoint
    // job (iterative rounds on a shallow graph are pure job-overhead).
    def materialize(df: DataFrame): (DataFrame, Long) = {
      val c = df.cache()
      val s = c.agg(coalesce(sum("lbl"), lit(0L))).head.getLong(0)
      (c, s)
    }
    // seed at min(self, neighbors): one aggregation over the (already
    // bidirectional) edge list — the same work as the distinct-ids init
    // but starting one propagation round ahead; identical fixpoint.
    var (labels, prevSum) = materialize(
      und.groupBy("src").agg(min("dst").as("mn"))
        .select(col("src").as("id"), least(col("src"), col("mn")).as("lbl")))
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // propagate over the original edges PLUS the current label mapping
      // (id ↔ lbl is an equivalence within the component): each round
      // covers 2-hop paths — pointer-jumping, O(log diameter) rounds to
      // the same fixpoint. The label edges are exactly |V| rows, so the
      // per-round shuffle stays linear.
      val hops = und
        .union(labels.select(col("id").as("src"), col("lbl").as("dst")))
        .union(labels.select(col("lbl").as("src"), col("id").as("dst")))
      val prop = hops.join(labels, hops("src") === labels("id"))
        .select(col("dst").as("id"), col("lbl"))
      val (next, s) = materialize(
        labels.select("id", "lbl").union(prop)
          .groupBy("id").agg(min("lbl").as("lbl")))
      // bound lineage growth across cached rounds (plans nest otherwise)
      val bounded =
        if ((iter + 1) % 4 == 0) { val b = next.localCheckpoint(); next.unpersist(); b }
        else next
      converged = s == prevSum
      prevSum = s
      labels.unpersist()
      labels = bounded
      iter += 1
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        System.err.println(s"[cc] round $iter sum=$s t=${System.nanoTime()}")
    }
    labels
  }

  /** Connected components for a graph whose NODE DOMAIN IS BOUNDED BY
    * CONSTRUCTION (e.g. z-level grid cells: ≤ 4^z nodes regardless of
    * data volume): one union-find pass in a single task. The distributed
    * aggregation upstream has already collapsed the data to the bounded
    * cell set, so a one-task finish is scale-safe — and replaces
    * O(diameter) driver-looped jobs with exactly one. Same contract as
    * [[labelPropagation]]: (id, lbl) with lbl = min node id in the
    * component. */
  def unionFindBounded(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    edges.select(col(srcCol).cast("long"), col(dstCol).cast("long"))
      .as[(Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x
          while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        it.foreach { case (a, b) =>
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val ra = find(a); val rb = find(b)
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        parent.keysIterator.map(k => (k, find(k))).toVector.iterator
      }
      .toDF("id", "lbl")
  }

  /** Dual-path connected components (the GraphCensus q195/q205 pattern):
    * derived edge lists (co-occurrence / candidate graphs) are usually
    * orders of magnitude smaller than the fact tables they come from, so
    * when the edge census fits one task the whole fixpoint runs as a
    * single [[unionFindBounded]] pass — replacing O(log diameter)
    * driver-looped shuffle rounds with exactly one job. Above the
    * threshold it falls back to [[labelPropagation]] (linear shuffles per
    * round). Both paths share the (id, lbl=min id) contract and are
    * spec-asserted equal (ComponentsSpec "both routes yield identical
    * labels").
    *
    * Ids are cast to long on BOTH paths, so the output schema does not
    * depend on which path ran. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          oneTaskMaxEdges: Long = 2000000L): DataFrame = {
    val e0 = edges.select(col(srcCol).cast("long").as("a"),
      col(dstCol).cast("long").as("b")).cache()
    val nEdges = e0.count()
    if (nEdges <= oneTaskMaxEdges) {
      // no unpersist here: it would run at plan-BUILD time, before the
      // returned frame executes (the GraphCensus note); blocks free on
      // GC / bench clearCache.
      unionFindBounded(e0, "a", "b")
    } else {
      // labelPropagation materializes eagerly round by round (und is
      // localCheckpointed up front), so the input cache can drop now
      val out = labelPropagation(e0, "a", "b")
      e0.unpersist(false)
      out
    }
  }

  /** DuckDB oracle mirror: transitive closure via recursive CTE, then
    * min reachable id per node. `edgesSql` must yield (id_a, id_b). */
  def labelPropagationSql(edgesSql: String): String =
    s"""WITH RECURSIVE e AS ($edgesSql),
        und AS (SELECT id_a AS src, id_b AS dst FROM e
                UNION SELECT id_b, id_a FROM e),
        reach(a, b) AS (
          SELECT src, src FROM und
          UNION
          SELECT r.a, u.dst FROM reach r JOIN und u ON r.b = u.src)
        SELECT a AS id, min(b) AS lbl FROM reach GROUP BY a"""
}
