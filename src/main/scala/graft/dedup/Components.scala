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
    var labels = und.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    // labels only ever decrease, so Σ lbl strictly decreases until the
    // fixpoint: one cheap agg per round replaces a diff join.
    def lblSum(df: DataFrame): Long =
      df.agg(coalesce(sum("lbl"), lit(0L))).head.getLong(0)
    var prevSum = lblSum(labels)
    while (iter < maxIter && !converged) {
      val prop = und.join(labels, und("src") === labels("id"))
        .select(col("dst").as("id"), col("lbl"))
      val next = labels.select("id", "lbl").union(prop)
        .groupBy("id").agg(min("lbl").as("lbl"))
        .localCheckpoint()
      val s = lblSum(next)
      converged = s == prevSum
      prevSum = s
      labels = next
      iter += 1
    }
    labels
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
