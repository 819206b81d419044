package graft.expressions

import graft.SparkSpec
import graft.functions.VectorOps
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

class FloatVecDotSpec extends SparkSpec {
  import spark.implicits._

  test("native dot bit-matches the higher-order form on random vectors") {
    val vecs = (for {
      a <- Gen.listOfN(50, Gen.listOfN(64, Gen.chooseNum(-1.0f, 1.0f)))
      b <- Gen.listOfN(50, Gen.listOfN(64, Gen.chooseNum(-1.0f, 1.0f)))
    } yield a.zip(b)).sample.get
    val df = vecs.toDF("a", "b")
    val bad = df.filter(VectorOps.dot("a", "b") =!= VectorOps.dotComposed("a", "b"))
    assert(bad.count() == 0)
    // hyperplane form agrees with int-promoted arithmetic
    val w = VectorOps.hyperplane(3, 64)
    val lits = w.mkString(", ")
    val bad2 = df.filter(VectorOps.dotLit("a", w) =!=
      expr(s"aggregate(zip_with(a, array($lits), (x, y) -> CAST(x AS DOUBLE) * y), " +
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"))
    assert(bad2.count() == 0)
  }

  test("graft_dot registered in SQL; null array propagates null") {
    val r = spark.sql(
      "SELECT graft_dot(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>), CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)), " +
        "graft_dot(CAST(NULL AS ARRAY<FLOAT>), CAST(array(1.0) AS ARRAY<FLOAT>))").head()
    assert(r.getDouble(0) == 11.0 && r.isNullAt(1))
  }
}
