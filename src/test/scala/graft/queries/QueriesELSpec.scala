package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants for the QueriesEL pack (shard-escape dedup audit,
  * bridges, VCG auction, PID replay). */
class QueriesELSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q554 shard escape: identity escaped = global - shard holds and " +
      "a direct group census agrees") {
    val r = SparkEntry.queries("q554_shard_dedup_escape")(spark, dir)
      .collect().head
    assert(r.getAs[Long]("escaped") ==
      r.getAs[Long]("global_dupes") - r.getAs[Long]("shard_dupes"))
    assert(r.getAs[Long]("escaped") >= 0)
    assert(r.getAs[Long]("escape_bp") >= 0 &&
      r.getAs[Long]("escape_bp") <= 10000)
    // exact duplicate groups really exist in the corpus (else the
    // audit is vacuous) and some straddle shards
    assert(r.getAs[Long]("dup_groups") > 0)
    assert(r.getAs[Long]("escaped") > 0,
      "hash sharding splits at least one duplicate group")
  }

  test("q555 bridges: each reported bridge disconnects its endpoints " +
      "(checked by flood fill without the edge) and non-bridges don't") {
    val out = SparkEntry.queries("q555_bridges")(spark, dir).collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"))).toSet
    val nodes = graft.Tables.t(spark, dir, "lineitem")
      .selectExpr("l_partkey % 200 AS id").where("id >= 1")
      .distinct().collect().map(_.getLong(0)).toSet
    val edges = (for (u <- nodes; v <- Seq(u * 2, u * 3) if nodes(v))
      yield (u, v)).toSeq
    def reachable(from: Long, skip: (Long, Long)): Set[Long] = {
      val adj = edges.filterNot(_ == skip)
        .flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val seen = scala.collection.mutable.Set(from)
      val q = scala.collection.mutable.Queue(from)
      while (q.nonEmpty) {
        val n = q.dequeue()
        adj.getOrElse(n, Seq()).foreach { m =>
          if (!seen(m)) { seen += m; q += m }
        }
      }
      seen.toSet
    }
    edges.foreach { e =>
      val disconnects = !reachable(e._1, e)(e._2)
      assert(out(e) == disconnects,
        s"edge $e: bridge-set membership ${out(e)} vs flood fill $disconnects")
    }
  }

  test("q556 VCG: payments are individually rational (p <= bid), " +
      "monotone down the slots per unit weight, and match the formula") {
    val out = SparkEntry.queries("q556_vcg_auction")(spark, dir).collect()
    assert(out.length == 3)
    val bids = graft.Tables.t(spark, dir, "supplier")
      .where("s_acctbal > 0")
      .selectExpr("s_suppkey", "CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS bid")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(r => (-r._2, r._1)).take(8).map(_._2)
    val w = Seq(10L, 6L, 3L, 0L)
    out.foreach { r =>
      val k = r.getAs[Long]("slot").toInt
      assert(r.getAs[Long]("bid") == bids(k - 1))
      val pnum = (k until math.min(4, bids.length)).map(m =>
        bids(m) * (w(m - 1) - w(m))).sum
      assert(r.getAs[Long]("payment") == pnum / w(k - 1), s"slot $k")
      assert(r.getAs[Long]("payment") <= r.getAs[Long]("bid"),
        s"slot $k individually rational")
    }
    // per-click payment weakly decreases in later slots? (true for VCG
    // position auctions with decreasing bids)
    val perClick = out.sortBy(_.getAs[Long]("slot"))
      .map(_.getAs[Long]("payment_milli"))
    assert(perClick.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("q557 PID: Scala replay matches and the loop tracks the load") {
    val r = SparkEntry.queries("q557_pid_replay")(spark, dir).collect().head
    val loads = graft.Tables.t(spark, dir, "orders")
      .selectExpr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS day")
      .groupBy("day").agg(expr("CAST(count(*) AS BIGINT) AS l"))
      .orderBy("day").collect().map(_.getLong(1))
    var cap = 0L; var integ = 0L; var prevE = 0L
    var tot = 0L; var maxO = Long.MinValue; var maxU = Long.MinValue
    var first = true
    loads.foreach { l =>
      val e = l - cap
      integ += e
      val de = if (first) 0L else e - prevE
      cap += (2 * e + integ / 4 + 4 * de) / 8
      prevE = e; first = false
      tot += math.abs(e)
      if (cap - l > maxO) maxO = cap - l
      if (l - cap > maxU) maxU = l - cap
    }
    assert(r.getAs[Long]("n_days") == loads.length.toLong)
    assert(r.getAs[Long]("end_capacity") == cap)
    assert(r.getAs[Long]("total_abs_err") == tot)
    assert(r.getAs[Long]("max_overshoot") == maxO)
    assert(r.getAs[Long]("max_undershoot") == maxU)
    // the controller ends near the load scale (tracks, not diverges)
    assert(math.abs(cap - loads.last) <= loads.max)
  }
}
