package graft.dedup

import graft.SparkSpec

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("labelPropagation finds components with min-id labels") {
    // components: {1,2,3,4} (chain), {10,11}, {20,21,22} (triangle)
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)
    ).toDF("a", "b")
    val labels = Components.labelPropagation(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("a long chain converges (diameter > 2)") {
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("a", "b")
    val labels = Components.labelPropagation(chain, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(labels.values.toSet == Set(1L) && labels.size == 12)
  }

  test("unionFindBounded agrees with labelPropagation on a multi-component graph") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 200).map { _ =>
      val c = rnd.nextInt(10) // keep edges inside a component
      (c * 1000L + rnd.nextInt(30), c * 1000L + rnd.nextInt(30))
    }.toDF("id_a", "id_b")
    val lp = Components.labelPropagation(edges, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    val uf = Components.unionFindBounded(edges, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(uf == lp)
  }

  test("connectedComponents: both routes yield identical labels") {
    // same graph down both paths: oneTaskMaxEdges high => union-find,
    // oneTaskMaxEdges=0 => label propagation; outputs must be equal
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)
    ).toDF("a", "b")
    val oneTask = Components.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    val looped = Components.connectedComponents(edges, "a", "b",
        oneTaskMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(oneTask == looped)
    assert(oneTask == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connectedComponents casts ids to long on both routes") {
    val edges = Seq((1, 2), (2, 3), (7, 8)).toDF("a", "b") // ints in
    val small = Components.connectedComponents(edges, "a", "b")
    val big = Components.connectedComponents(edges, "a", "b",
      oneTaskMaxEdges = 0L)
    // contract = column names + types (nullability legitimately differs:
    // the one-task route is a Dataset tuple, the looped route an agg)
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq
    assert(small.schema("id").dataType.typeName == "long")
    assert(shape(small) == shape(big))
  }
}
