package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesBE pack (coverage gaps, reorder depth,
  * shard packing, WAU retention). */
class QueriesBESpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q226 coverage: all 20 lat bands present, cells conserved, bp consistent") {
    val rows = SparkEntry.queries("q226_coverage_gap")(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("cy")).sorted.toSeq == (0L to 19L))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_cells") == 12L, "12 lng cells per band")
      val e = r.getAs[Long]("n_empty")
      assert(e >= 0L && e <= 12L)
      assert(r.getAs[Long]("coverage_bp") == (12L - e) * 10000L / 12L)
    }
  }

  test("q227 reorder depth: buckets partition all events") {
    val rows = SparkEntry.queries("q227_reorder_depth")(spark, dir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == graft.Tables.t(spark, dir, "events").count())
  }

  test("q228 shards: per-source shards contiguous from 0, bytes conserved") {
    val rows = SparkEntry.queries("q228_media_shard_plan")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, g) =>
      val shards = g.map(_.getAs[Long]("shard")).sorted
      assert(shards.head == 0L)
      assert(shards.zip(shards.tail).forall { case (a, b) => b == a + 1 },
        "offset-based sharding cannot skip a shard index")
    }
    val bytes = rows.map(_.getAs[Long]("shard_bytes")).sum
    val expected = graft.Tables.t(spark, dir, "documents")
      .agg(org.apache.spark.sql.functions.sum("n_chars")).head.getLong(0)
    assert(bytes == expected, "every byte lands in exactly one shard")
  }

  test("q229 retention: bp within [0, 10000+], retained <= prev_wau bound") {
    val rows = SparkEntry.queries("q229_wau_retention")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("retained") <= r.getAs[Long]("prev_wau"))
      assert(r.getAs[Long]("retained") <= r.getAs[Long]("wau"))
      val bp = r.getAs[Long]("retention_bp")
      assert(bp >= 0L && bp <= 10000L)
    }
  }
}
