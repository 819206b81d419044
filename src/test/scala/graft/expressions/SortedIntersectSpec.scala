package graft.expressions

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

class SortedIntersectSpec extends SparkSpec {
  import spark.implicits._

  test("native sorted intersect-count equals size(array_intersect) on random sets") {
    val sets = (for {
      a <- Gen.listOfN(100, Gen.listOf(Gen.chooseNum(0L, 500L)))
      b <- Gen.listOfN(100, Gen.listOf(Gen.chooseNum(0L, 500L)))
    } yield a.zip(b)).sample.get
    val df = sets.toDF("a0", "b0")
      .select(sort_array(array_distinct(col("a0"))).as("a"),
        sort_array(array_distinct(col("b0"))).as("b"))
    val bad = df.filter(Dedup.sortedIntersectCount("a", "b") =!=
      size(array_intersect(col("a"), col("b"))).cast("long"))
    assert(bad.count() == 0)
  }

  test("edges: empty and disjoint arrays; SQL registration") {
    val r = spark.sql(
      "SELECT graft_intersect_count(array(1L, 3L, 5L), array(2L, 3L, 4L, 5L)), " +
        "graft_intersect_count(CAST(array() AS ARRAY<BIGINT>), array(1L)), " +
        "graft_intersect_count(array(1L), array(2L))").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 0L && r.getLong(2) == 0L)
  }
}
