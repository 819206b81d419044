package graft.dedup

import graft.SparkSpec
import graft.functions.{TextFunctions, VectorOps}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("canonicalKey collides on word-set-equal docs only") {
    val df = Seq(
      (1L, "b a a b"), (2L, "a  b"), (3L, "a b c")
    ).toDF("id", "text")
      .withColumn("w", TextFunctions.words(col("text")))
      .withColumn("sig", Dedup.canonicalKey(col("w")))
    val sigs = df.select("id", "sig").as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(2L) && sigs(1L) != sigs(3L))
  }

  test("lshCandidates finds identical docs and emits each pair once") {
    val df = Seq(
      (1L, "x y z p q r"), (2L, "x y z p q r"), (3L, "completely different words here now")
    ).toDF("doc_id", "text")
      .withColumn("w", TextFunctions.words(col("text")))
      .withColumn("sh0", array_distinct(TextFunctions.wordNgrams("w", 3)))
      .withColumn("sh", array_distinct(Dedup.shingleHashes("sh0")))
    val sigs = df.select(col("doc_id"), Dedup.minhashSig("sh", 4).as("sig"))
    val pairs = Dedup.lshCandidates(sigs, "doc_id", "sig", nHashes = 4, bandSize = 2)
      .as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L))) // identical sigs collide in every band, distinct'd to one pair
  }

  test("jaccardBp exact on known sets") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    // |∩|=2, |∪|=4 → 5000 bp
    assert(df.select(Dedup.jaccardBp("x", "y")).as[Long].head() == 5000L)
  }

  test("simhash32 is identical for same multiset, hamming 0") {
    val df = Seq((1L, "a b c a"), (2L, "c a b a"), (3L, "q r s t u v")).toDF("doc_id", "text")
      .withColumn("w", TextFunctions.words(col("text")))
      .withColumn("hw", transform(col("w"), x => graft.functions.PortableHash.md5Long(x)))
      .select(col("doc_id"), Dedup.simhash32("hw").as("sh"))
    val m = df.as[(Long, Long)].collect().toMap
    assert(m(1L) == m(2L))
    assert(m(3L) >= 0L && m(3L) <= 4294967295L && m(3L) != m(1L))
    val h = spark.range(1)
      .select(Dedup.hamming(lit(m(1L)), lit(m(3L)))).as[Long].head()
    assert(h == java.lang.Long.bitCount(m(1L) ^ m(3L)))
  }

  test("simhashAgg (explode form) equals simhash32 (array form)") {
    val docs = Seq((1L, "a b c a d"), (2L, "q r s t u v"), (3L, "x"))
      .toDF("doc_id", "text")
      .withColumn("w", TextFunctions.words(col("text")))
    val arrayForm = docs
      .withColumn("hw", transform(col("w"), x => graft.functions.PortableHash.md5Long(x)))
      .select(col("doc_id"), Dedup.simhash32("hw").as("sh"))
      .as[(Long, Long)].collect().toMap
    val aggForm = Dedup.simhashAgg(
        docs.select(col("doc_id"), explode(col("w")).as("word")), "doc_id", "word")
      .as[(Long, Long)].collect().toMap
    assert(arrayForm == aggForm)
  }

  test("cosine matches hand computation and lshBucket is stable") {
    val df = Seq((Seq(1.0f, 0.0f, 1.0f), Seq(1.0f, 1.0f, 0.0f))).toDF("x", "y")
    val c = df.select(VectorOps.cosine("x", "y")).as[Double].head()
    assert(math.abs(c - 0.5) < 1e-12) // dot=1, norms=sqrt2*sqrt2
    val b1 = df.select(VectorOps.lshBucket("x", 4, 3)).as[Int].head()
    val b2 = df.select(VectorOps.lshBucket("x", 4, 3)).as[Int].head()
    assert(b1 == b2 && b1 >= 0 && b1 < 16)
  }
}
