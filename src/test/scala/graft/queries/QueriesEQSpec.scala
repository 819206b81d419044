package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants for the QueriesEQ pack (FastSS edit-1, Zipf slope,
  * lexical richness, JS divergence). */
class QueriesEQSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def lev1(a: String, b: String): Boolean = {
    // exact edit-distance ≤ 1 check (lengths within 1 by construction)
    if (a == b) true
    else if (a.length == b.length)
      a.zip(b).count { case (x, y) => x != y } == 1
    else {
      val (s, l) = if (a.length < b.length) (a, b) else (b, a)
      if (l.length - s.length != 1) false
      else {
        var i = 0
        while (i < s.length && s(i) == l(i)) i += 1
        s.substring(i) == l.substring(i + 1)
      }
    }
  }

  test("q578 FastSS: edit-1 pair count matches an exact brute-force " +
      "sweep over the filtered vocabulary") {
    val r = SparkEntry.queries("q578_fastss_edit1")(spark, dir)
      .collect().head
    val vocab = graft.Tables.t(spark, dir, "documents")
      .where("text IS NOT NULL")
      .select(explode(graft.functions.TextFunctions.words(col("text")))
        .as("w"))
      .where("length(w) BETWEEN 6 AND 14").distinct()
      .collect().map(_.getString(0)).sorted
    assert(r.getAs[Long]("n_vocab") == vocab.length.toLong)
    var n1 = 0L
    for (i <- vocab.indices; j <- (i + 1) until vocab.length
         if math.abs(vocab(i).length - vocab(j).length) <= 1
         if lev1(vocab(i), vocab(j))) n1 += 1
    assert(r.getAs[Long]("n_edit1_pairs") == n1,
      "FastSS deletion-neighborhood join finds exactly the edit-1 pairs")
    assert(r.getAs[Long]("n_candidates") >= n1)
  }

  test("q579 Zipf: rank-frequency slope is negative (frequency decays " +
      "with rank) and uses exactly 100 points") {
    val r = SparkEntry.queries("q579_zipf_slope")(spark, dir).collect().head
    val nTypes = graft.Tables.t(spark, dir, "documents")
      .where("text IS NOT NULL")
      .select(explode(graft.functions.TextFunctions.words(col("text")))
        .as("w"))
      .distinct().count()
    assert(r.getAs[Long]("n_points") == math.min(100L, nTypes))
    assert(r.getAs[Long]("slope_milli") < 0, "Zipf slope is negative")
  }

  test("q580 richness: exact ratio identities hold and one source's " +
      "census replays") {
    val out = SparkEntry.queries("q580_lexical_richness")(spark, dir)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("ttr_ppm") ==
        r.getAs[Long]("types") * 1000000 / r.getAs[Long]("tokens"))
      assert(r.getAs[Long]("hapax_ppm") ==
        r.getAs[Long]("hapax") * 1000000 / r.getAs[Long]("types"))
      assert(r.getAs[Long]("hapax") <= r.getAs[Long]("types"))
      assert(r.getAs[Long]("types") <= r.getAs[Long]("tokens"))
    }
    val src = out.head.getAs[String]("source")
    val words = graft.Tables.t(spark, dir, "documents")
      .where(col("source") === src && col("text").isNotNull)
      .select(explode(graft.functions.TextFunctions.words(col("text")))
        .as("w"))
      .collect().map(_.getString(0))
    assert(out.head.getAs[Long]("tokens") == words.length.toLong)
    assert(out.head.getAs[Long]("types") ==
      words.distinct.length.toLong)
    assert(out.head.getAs[Long]("hapax") ==
      words.groupBy(identity).count(_._2.length == 1).toLong)
  }

  test("q581 JS divergence: bounded by ln2 and non-negative up to the " +
      "per-term micro-floor loss") {
    val out = SparkEntry.queries("q581_js_divergence")(spark, dir).collect()
    assert(out.length == 20)
    out.foreach { r =>
      val js = r.getAs[Long]("js_micro")
      // ln 2 ≈ 0.693147 nats is the JS maximum; floors lose ≤ 102 micro
      assert(js > -200 && js <= 693148, s"${r.getString(0)}: $js")
    }
    assert(out.map(_.getAs[Long]("js_micro")).max > 0,
      "at least one source diverges from the corpus")
  }
}
