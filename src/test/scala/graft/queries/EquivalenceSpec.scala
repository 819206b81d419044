package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Cross-operator invariants on the real testdata: alternate physical
  * strategies for the same logical operator must agree exactly. */
class EquivalenceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("tile equi-join (q25) equals broadcast-NLJ bbox join (q20)") {
    val nlj = SparkEntry.queries("q20_point_in_bbox_join")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val tiled = SparkEntry.queries("q25_tile_join")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(nlj.nonEmpty && nlj == tiled)
  }

  test("every LSH-ANN neighbor (q41) carries the exact cosine the brute-force scan (q40) computes") {
    val brute = SparkEntry.queries("q40_knn_brute")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val lsh = SparkEntry.queries("q41_knn_lsh")(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3)))
    assert(lsh.nonEmpty)
    // where a bucket neighbor also appears in the brute top-k, the scores agree
    val overlapping = lsh.filter { case (k, _) => brute.contains(k) }
    assert(overlapping.nonEmpty)
    assert(overlapping.forall { case (k, c) => brute(k) == c })
  }

  test("every IVF-ANN neighbor (q42) carries the exact cosine the brute-force scan (q40) computes") {
    val brute = SparkEntry.queries("q40_knn_brute")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val ivf = SparkEntry.queries("q42_knn_ivf")(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3)))
    assert(ivf.nonEmpty)
    val overlapping = ivf.filter { case (k, _) => brute.contains(k) }
    assert(overlapping.nonEmpty)
    assert(overlapping.forall { case (k, c) => brute(k) == c })
  }

  test("interval union (q28): covered extent bounded by span and by raw interval sum") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("q28_interval_union")(spark, dir)
    val bad = df.filter(col("covered_ms") > col("span_ms") ||
      col("covered_ms") <= 0 || col("n_islands") <= 0).count()
    assert(df.count() > 0 && bad == 0)
  }
}
