package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants for the round-8 capacity/mix pack (q633-q639). Oracle
  * parity runs in the driver gate; these check the planner math and
  * conservation properties the hash compare can't see. */
class QueriesFFSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("q633 trigger planner: p95 <= peak, cap formula, full type census") {
    val out = SparkEntry.queries("q633_trigger_planner")(spark, dir).collect()
    assert(out.nonEmpty)
    val types = spark.read.parquet(s"$dir/events.parquet")
      .select("event_type").distinct().collect().map(_.getString(0)).toSet
    assert(out.map(_.getAs[String]("event_type")).toSet == types)
    out.foreach { r =>
      val (p95, peak) = (r.getAs[Long]("p95_pm"), r.getAs[Long]("peak_pm"))
      assert(p95 >= 1 && p95 <= peak)
      assert(r.getAs[Long]("trigger_cap") == ((p95 + 5) / 6) * 2)
      assert(r.getAs[Long]("n_minutes") >= 1)
    }
  }

  test("q634 state footprint equals a brute-force horizon recount") {
    val out = SparkEntry.queries("q634_state_footprint")(spark, dir)
      .collect().map(r => r.getAs[Long]("hour_end_ms") ->
        r.getAs[Long]("n_state_keys")).toMap
    assert(out.nonEmpty)
    val ev = graft.Tables.t(spark, dir, "events")
      .selectExpr("user_id", "ts DIV 1000000 AS ms")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // brute force: hour-end he holds a user iff it has an event with
    // he in (ts, ts+2h]  <=>  ts in [he-2h, he)
    out.foreach { case (he, n) =>
      val brute = ev.filter { case (_, ms) =>
        he > ms && he <= ms + 7200000L
      }.map(_._1).distinct.size
      assert(n == brute, s"hour_end $he: got $n brute $brute")
    }
  }

  test("q635 fertility: bpe stride bound and ws/re agreement on this corpus") {
    val out = SparkEntry.queries("q635_tokenizer_fertility")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      // bpe_tok = ceil(chars/4) => chars per 100 tokens <= 400
      val bpe = r.getAs[Long]("cpt_bpe_c")
      assert(bpe > 0 && bpe <= 400)
      assert(r.getAs[Long]("cpt_ws_c") > 0)
      val bp = r.getAs[Long]("ws_re_bp")
      assert(bp > 0 && bp <= 10000) // regex splits at least as fine as ws
    }
  }

  test("q636 packing boundaries: per-source brute-force replay") {
    val out = SparkEntry.queries("q636_packing_boundaries")(spark, dir).collect()
    assert(out.nonEmpty)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("tok",
        size(graft.functions.TextFunctions.words(col("text"))).cast("long"))
      .select("source", "doc_id", "tok")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    out.foreach { r =>
      val src = r.getAs[String]("source")
      val mine = docs.filter(_._1 == src).sortBy(_._2)
      var off = 0L
      var splits = 0L
      mine.foreach { case (_, _, tok) =>
        if (tok > 0 && off / 256 != (off + tok - 1) / 256) splits += 1
        off += tok
      }
      assert(r.getAs[Long]("total_tokens") == off, src)
      assert(r.getAs[Long]("n_split_docs") == splits, src)
      assert(r.getAs[Long]("n_seqs") == (off + 255) / 256, src)
      assert(r.getAs[Long]("n_split_docs") <= r.getAs[Long]("n_docs"))
    }
  }

  test("q637 dup weighting conserves the doc census and weights decay") {
    val out = SparkEntry.queries("q637_dup_weighting")(spark, dir)
      .collect().sortBy(_.getAs[Long]("mult"))
    assert(out.nonEmpty)
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(out.map(_.getAs[Long]("n_docs")).sum == nDocs)
    out.foreach { r =>
      val m = r.getAs[Long]("mult")
      assert(r.getAs[Long]("n_docs") == m * r.getAs[Long]("n_groups"))
      assert(r.getAs[Long]("weight_bp") ==
        math.floor(10000.0 / math.sqrt(m.toDouble)).toLong)
    }
    val ws = out.map(_.getAs[Long]("weight_bp"))
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b })
  }

  test("q638 mix planner respects the budget and the 4-epoch cap") {
    val out = SparkEntry.queries("q638_mix_epoch_planner")(spark, dir).collect()
    assert(out.nonEmpty)
    val total = out.map(_.getAs[Long]("t_tokens")).sum
    val alloc = out.map(_.getAs[Long]("alloc_tokens")).sum
    assert(alloc <= 2 * total) // never over budget
    assert(alloc >= (2 * total * 9) / 10) // redistribution round fills >=90%
    out.foreach { r =>
      val (t, a) = (r.getAs[Long]("t_tokens"), r.getAs[Long]("alloc_tokens"))
      assert(a <= 4 * t)
      assert(a >= 0)
      val bp = r.getAs[Long]("epochs_bp")
      assert(bp <= 40000 && bp == a * 10000 / math.max(t, 1))
    }
  }

  test("q639 IVF balance partitions the corpus across seed cells") {
    val out = SparkEntry.queries("q639_ivf_balance")(spark, dir).collect()
    assert(out.nonEmpty)
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(out.map(_.getAs[Long]("sz")).sum == n)
    val shares = out.map(_.getAs[Long]("share_bp"))
    assert(shares.sum <= 10000 && shares.sum >= 10000 - out.length)
    // every cell is a seed id
    out.foreach(r => assert(r.getAs[Long]("cell") % 100 == 0))
    // sorted by size desc
    val szs = out.map(_.getAs[Long]("sz"))
    assert(szs.zip(szs.tail).forall { case (a, b) => a >= b })
  }
}
