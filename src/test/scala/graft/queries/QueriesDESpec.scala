package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesDE pack (Belady OPT vs LRU replay). */
class QueriesDESpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q431: Belady dominance — OPT hit rate >= LRU everywhere") {
    val rows = SparkEntry.queries("q431_opt_cache")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("opt_hits") >= r.getAs[Long]("lru_hits"),
        s"${r.getAs[String]("n_name")}: OPT is optimal, LRU cannot beat it")
      assert(r.getAs[Long]("opt_hits") <= r.getAs[Long]("accesses"))
      assert(r.getAs[Long]("opt_bp") >= r.getAs[Long]("lru_bp"))
    }
  }

  test("q431: partitioning invariance — 1 vs 5 shuffle partitions agree") {
    val a = SparkEntry.queries("q431_opt_cache")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val b = SparkEntry.queries("q431_opt_cache")(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(a == b, "per-key recurrence must not depend on partitioning")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("q431: direct in-memory replay matches for every supplier") {
    import org.apache.spark.sql.functions._
    // independent single-threaded replay of both policies
    val acc = graft.Tables.t(spark, dir, "lineitem")
      .selectExpr("l_suppkey AS sup", "l_partkey AS p",
        "unix_millis(CAST(l_shipdate AS TIMESTAMP)) AS ms",
        "l_orderkey AS ok", "l_linenumber AS ln")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
      .groupBy(_._1)
    var optTot = 0L; var lruTot = 0L; var accTot = 0L
    acc.foreach { case (_, rs) =>
      val seq = rs.sortBy(t => (t._3, t._4, t._5)).map(_._2)
      // next-use precompute
      val nu = Array.fill(seq.length)(Long.MaxValue)
      val lastPos = scala.collection.mutable.HashMap.empty[Long, Int]
      seq.zipWithIndex.foreach { case (p, i) =>
        lastPos.get(p).foreach(j => nu(j) = i.toLong)
        lastPos(p) = i
      }
      val opt = scala.collection.mutable.HashMap.empty[Long, Long]
      val lru = scala.collection.mutable.HashMap.empty[Long, Long]
      seq.zipWithIndex.foreach { case (p, i) =>
        if (opt.contains(p)) { optTot += 1; opt(p) = nu(i) }
        else {
          if (opt.size >= 4) opt.remove(opt.maxBy(kv => (kv._2, kv._1))._1)
          opt(p) = nu(i)
        }
        if (lru.contains(p)) { lruTot += 1; lru(p) = i.toLong }
        else {
          if (lru.size >= 4) lru.remove(lru.minBy(kv => (kv._2, kv._1))._1)
          lru(p) = i.toLong
        }
        accTot += 1
      }
    }
    val rows = SparkEntry.queries("q431_opt_cache")(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("accesses")).sum == accTot)
    assert(rows.map(_.getAs[Long]("opt_hits")).sum == optTot)
    assert(rows.map(_.getAs[Long]("lru_hits")).sum == lruTot)
  }
}
