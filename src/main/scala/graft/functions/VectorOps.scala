package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` columns as higher-order-function
  * expressions (codegen'd, no UDF), with DuckDB SQL twins that accumulate
  * in the same index order so doubles match bit-for-bit (SURVEY.md §2D).
  *
  * All helpers take COLUMN NAMES (expressions are parsed by each engine's
  * SQL parser). Elements are cast float→double before any arithmetic —
  * both engines then see identical doubles.
  */
object VectorOps {

  private def toCol(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.GraftColumnBridge.column(e)
  private def toExpr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.GraftColumnBridge.expression(c)

  /** Σ a[i]*b[i], left-to-right — native expression (tight primitive loop
    * in codegen); bit-identical to [[dotComposed]] (spec-asserted). */
  def dot(a: String, b: String): Column =
    toCol(graft.expressions.FloatVecDot(toExpr(col(a)), toExpr(col(b))))
  def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(list_zip($a, $b), " +
      s"t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE))), (acc, v) -> acc + v)"

  /** float-left, double-right native dot (recomputed centroids are
    * array<double>); same widening/op order as the HOF form it replaces. */
  def dotFD(a: String, b: String): Column =
    toCol(graft.expressions.FloatDoubleVecDot(toExpr(col(a)), toExpr(col(b))))

  /** Higher-order-function form (tier-a reference semantics). */
  def dotComposed(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "CAST(0 AS DOUBLE), (acc, v) -> acc + v)")

  /** Dot product against an integer-literal hyperplane (same length).
    * Weights ride as a foldable float-array literal: (double)(float)w ==
    * (double)w for |w| <= 10, so values match the int-promoted form. */
  def dotLit(a: String, w: Seq[Int]): Column =
    toCol(graft.expressions.FloatVecDot(toExpr(col(a)),
      toExpr(array(w.map(x => lit(x.toFloat)): _*))))
  def dotLitSql(a: String, w: Seq[Int]): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(list_zip($a, [${w.mkString(", ")}]), " +
      s"t -> CAST(t[1] AS DOUBLE) * t[2])), (acc, v) -> acc + v)"

  /** cosine(a, b) = dot/(sqrt(dot(a,a))*sqrt(dot(b,b))), identical op order. */
  def cosine(a: String, b: String): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  def cosineSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  /** sqrt(dot(v,v)) — project once per side BEFORE a pairwise join so each
    * pair computes one dot instead of three (same doubles as [[cosine]]:
    * identical op order, just factored out). */
  def norm(v: String): Column = sqrt(dot(v, v))
  def normSql(v: String): String = s"sqrt(${dotSql(v, v)})"

  /** cosine from a pair dot and precomputed norms. */
  def cosineFromNorms(a: String, b: String, normA: String, normB: String): Column =
    dot(a, b) / (col(normA) * col(normB))
  def cosineFromNormsSql(a: String, b: String, normA: String, normB: String): String =
    s"${dotSql(a, b)} / ($normA * $normB)"

  /** OUTPUT form: cosine rounded to 6 dp with IEEE signed zero
    * normalized (+ 0.0 maps -0.0 → +0.0, identity elsewhere). A cosine
    * in (-5e-7, 0) rounds to -0.0 on DuckDB's FP round but +0.0 through
    * Spark's BigDecimal round — repr-level hash mismatch without this. */
  def cosine6Out(a: String, b: String, normA: String, normB: String): Column =
    round(cosineFromNorms(a, b, normA, normB), 6) + lit(0.0)
  def cosine6OutSql(a: String, b: String, normA: String, normB: String): String =
    s"(round(${cosineFromNormsSql(a, b, normA, normB)}, 6) + 0.0)"

  /** Σ (a[i]-b[i])² over the length-n subvector at 0-based offset off —
    * the product-quantization subspace distance. Same left-to-right fold
    * as [[dotComposed]]; both engines see identical doubles. */
  def sliceD2(a: String, b: String, off: Int, n: Int): Column =
    expr(s"aggregate(zip_with(slice($a, ${off + 1}, $n), slice($b, ${off + 1}, $n), " +
      "(x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), " +
      "CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
  def sliceD2Sql(a: String, b: String, off: Int, n: Int): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(" +
      s"list_zip($a[${off + 1}:${off + n}], $b[${off + 1}:${off + n}]), " +
      s"t -> (CAST(t[1] AS DOUBLE) - CAST(t[2] AS DOUBLE)) * (CAST(t[1] AS DOUBLE) - CAST(t[2] AS DOUBLE)))), " +
      s"(acc, v) -> acc + v)"

  /** Deterministic pseudo-random hyperplane j over dim dims: integer
    * weights in [-10, 10] from pure key arithmetic — identical literals
    * are emitted into both engines' plans. */
  def hyperplane(j: Int, dim: Int): Seq[Int] =
    (0 until dim).map(i => ((j * 131 + i * 37) % 21) - 10)

  /** Random-hyperplane LSH bucket id of vector column `v`: bit j set iff
    * dot(v, hyperplane_j) >= 0. nPlanes <= 30. */
  def lshBucket(v: String, nPlanes: Int, dim: Int): Column =
    (0 until nPlanes).map { j =>
      when(dotLit(v, hyperplane(j, dim)) >= 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
  def lshBucketSql(v: String, nPlanes: Int, dim: Int): String =
    (0 until nPlanes).map { j =>
      s"(CASE WHEN ${dotLitSql(v, hyperplane(j, dim))} >= 0 THEN ${1 << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")
}
