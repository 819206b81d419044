package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariants for the QueriesFD pack (PCA top-2, log templates, Bloom
  * planner, Theil decomposition). */
class QueriesFDSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q625 PCA: loadings normalized to max 1e6, components near-" +
      "orthogonal, lambda1 >= lambda2 >= 0") {
    val out = SparkEntry.queries("q625_pca_top2")(spark, dir).collect()
    assert(out.length == 128)
    val byComp = out.groupBy(_.getAs[Long]("component"))
    val v1 = byComp(1L).sortBy(_.getAs[Long]("dim"))
      .map(_.getAs[Long]("loading_micro"))
    val v2 = byComp(2L).sortBy(_.getAs[Long]("dim"))
      .map(_.getAs[Long]("loading_micro"))
    assert(v1.map(math.abs).max == 1000000L)
    assert(v2.map(math.abs).max == 1000000L)
    val lam1 = byComp(1L).head.getAs[Long]("lam_scaled")
    val lam2 = byComp(2L).head.getAs[Long]("lam_scaled")
    assert(lam1 >= lam2, s"dominant eigenvalue first: $lam1 vs $lam2")
    assert(lam2 >= 0, "second-moment matrix is PSD")
    // near-orthogonality: |cos(v1, v2)| well below 1
    val dot = v1.zip(v2).map { case (a, b) => a.toDouble * b }.sum
    val n1 = math.sqrt(v1.map(x => x.toDouble * x).sum)
    val n2 = math.sqrt(v2.map(x => x.toDouble * x).sum)
    assert(math.abs(dot / (n1 * n2)) < 0.1,
      s"deflated component should be near-orthogonal: ${dot / (n1 * n2)}")
  }

  test("q626 templates: masked templates contain no digits; coverage sane") {
    val out = SparkEntry.queries("q626_log_templates")(spark, dir).collect()
    assert(out.nonEmpty && out.length <= 10)
    out.foreach { r =>
      assert(!r.getAs[String]("tmpl").exists(_.isDigit))
      val bp = r.getAs[Long]("coverage_bp")
      assert(bp >= 0 && bp <= 10000)
    }
    assert(out.map(_.getAs[Long]("coverage_bp")).sum <= 10000)
  }

  test("q627 Bloom planner: sizes replay the formula and scale with fpp") {
    val out = SparkEntry.queries("q627_bloom_planner")(spark, dir).collect()
    assert(out.length == 6)
    out.foreach { r =>
      val (ndv, m) = (r.getAs[Long]("ndv"), r.getAs[Long]("m_bits"))
      val c = if (r.getAs[Long]("fpp_bp") == 100L) 95851L else 143776L
      assert(m == (ndv * c + 9999) / 10000)
      assert(r.getAs[Long]("n_bytes") == (m + 7) / 8)
    }
    // stricter fpp needs more bits for the same key
    out.groupBy(_.getAs[String]("key_name")).values.foreach { rows =>
      val m = rows.map(r => r.getAs[Long]("fpp_bp") -> r.getAs[Long]("m_bits")).toMap
      assert(m(10L) > m(100L))
    }
  }

  test("q628 Theil: between-term signs offset and the decomposition is " +
      "internally consistent") {
    val out = SparkEntry.queries("q628_theil_decomposition")(spark, dir).collect()
    assert(out.nonEmpty)
    val n = Tables.t(spark, dir, "customer")
      .where(expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) > 0")).count()
    assert(out.map(_.getAs[Long]("ng")).sum == n)
    // Theil components: T_within >= 0 per nation (each nation's within
    // sum is a Σ p·ln(p/q) style divergence over its own members)
    out.foreach { r =>
      assert(r.getAs[Long]("within_num_micro") >= -out.length,
        "within term is a non-negative divergence (rounding slack)")
    }
    // between terms sum to >= 0 overall (it is a KL divergence)
    assert(out.map(_.getAs[Long]("between_num_micro")).sum >= -out.length)
  }
}
