package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the QueriesAN pack. */
class QueriesANSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q167 BM25: descending scores; all scores finite; top doc contains a query term") {
    val rows = SparkEntry.queries("q167_bm25")(spark, dir).collect()
    assert(rows.length == 15)
    val scores = rows.map(_.getAs[Double]("bm25_6"))
    assert(scores.sameElements(scores.sorted.reverse))
    assert(scores.forall(s => !s.isNaN && !s.isInfinite))
    // BM25 with mid-frequency terms (df < N/2) has positive idf, so the
    // top of the ranking must be strictly positive
    assert(scores.head > 0.0)
  }
}
