package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants for QueriesEU: the relational BPE trainer must equal a
  * plain procedural BPE trainer run on the same word census. */
class QueriesEUSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Classic sequential BPE on a word census: greedy left-to-right
    * merge application, overlapping pair counts, lexicographic ties. */
  private def bpeReplay(census: Seq[(String, Long)], rounds: Int)
      : Seq[(String, String, Long, Long)] = {
    var words: Seq[(Vector[String], Long)] =
      census.map { case (w, c) => (w.split("").toVector, c) }
    (1 to rounds).map { _ =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        syms.zip(syms.tail).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + c
        }
      }
      val ((x, y), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
      words = words.map { case (syms, wc) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == x && syms(i + 1) == y) {
            out += (x + y); i += 2
          } else { out += syms(i); i += 1 }
        }
        (out.result(), wc)
      }
      val tokens = words.map { case (s2, wc) => s2.length * wc }.sum
      (x, y, c, tokens)
    }
  }

  test("q594 BPE: 4 relational merge rounds equal a procedural BPE " +
      "trainer (greedy overlap chains included) on the same census") {
    val out = SparkEntry.queries("q594_bpe_train")(spark, dir)
      .collect().sortBy(_.getAs[Long]("round"))
      .map(r => (r.getAs[String]("x"), r.getAs[String]("y"),
        r.getAs[Long]("pair_count"), r.getAs[Long]("tokens_after")))
    val census = graft.Tables.t(spark, dir, "documents")
      .where("text IS NOT NULL")
      .select(explode(graft.functions.TextFunctions.words(col("text")))
        .as("w"))
      .where("length(w) BETWEEN 1 AND 20")
      .groupBy("w").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val expected = bpeReplay(census, 4)
    assert(out.toSeq == expected,
      s"relational BPE == procedural BPE\n got ${out.toSeq}\n exp $expected")
    // tokens strictly decrease while merges fire
    val toks = out.map(_._4)
    assert(toks.zip(toks.tail).forall { case (a, b) => b < a })
  }

  test("q594 BPE overlap chains: synthetic runs like 'aaaa' merge " +
      "greedily (floor(run/2) pairs)") {
    // direct unit check of the replay helper the equality test trusts
    val merges = bpeReplay(Seq(("aaaa", 10L), ("aaa", 1L)), 1)
    val (x, y, c, tokens) = merges.head
    assert((x, y) == ("a", "a"))
    assert(c == 10L * 3 + 1L * 2, "overlapping pair counts")
    // "aaaa" -> [aa, aa] (2 syms), "aaa" -> [aa, a] (2 syms)
    assert(tokens == 10L * 2 + 1L * 2)
  }
}
