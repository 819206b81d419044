package graft

import graft.dedup.{Components, Dedup}
import graft.functions.{PortableHash, TextFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composition story — every stage is a
  * library operator that also ships as an oracle-checked query; this
  * object wires them into the pipeline a user would actually run over
  * 100 TB of raw documents:
  *
  *   raw → exact dedup (q30) → near-dup clustering, keep best quality
  *   (q31/q35/q36) → quality floor (q51) → deterministic split (q55)
  *
  * Returns the curated corpus plus a per-stage accounting report (rows
  * in/out per stage — the numbers a data-quality dashboard tracks).
  * Every stage is one shuffle-bounded DataFrame transform; nothing
  * collects to the driver.
  */
object Pipeline {

  final case class Curated(docs: DataFrame, report: DataFrame)

  def curate(documents: DataFrame, qualityMinBp: Long = 5000L): Curated = {
    val spark = documents.sparkSession
    import spark.implicits._

    val base = documents.select("doc_id", "text", "lang", "source", "n_chars")

    // stage 1: exact dedup on the canonical bag-of-words key
    val keyed = base.withColumn("w", TextFunctions.words(col("text")))
      .withColumn("ck", Dedup.canonicalKey(col("w")))
    val exactKept = keyed.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("ck").orderBy("doc_id")))
      .filter(col("rn") === 1).drop("rn", "ck")

    // stage 2: near-dup clusters via MinHash/LSH; keep best quality per cluster
    val exploded = exactKept
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(0), size(col("w")) - 3)).as("i"))
      .withColumn("h", Dedup.shingleHash(expr("concat_ws(' ', w[i], w[i+1], w[i+2])")))
    val sigs = exploded.groupBy("doc_id")
      .agg(Dedup.minhashAggs(col("h"), 6).head, Dedup.minhashAggs(col("h"), 6).tail: _*)
      .withColumn("sig", array((0 until 6).map(j => col(s"_mh$j")): _*))
      .select("doc_id", "sig")
    val pairs = Dedup.lshCandidates(sigs, "doc_id", "sig", nHashes = 6, bandSize = 2)
    val labels = Components.labelPropagation(pairs, "id_a", "id_b")

    val quality = exactKept.withColumn("n_words", size(col("w")))
      .withColumn("n_distinct", size(array_distinct(col("w"))))
      .withColumn("sum_wlen", expr("aggregate(w, 0, (acc, x) -> acc + length(x))"))
      .withColumn("n_stop",
        TextFunctions.langScore(col("w"), TextFunctions.langMarkers.toMap.apply("en")))
      .withColumn("quality_bp",
        expr("n_distinct * 5000 DIV n_words" +
          " + least(sum_wlen * 300 DIV n_words, 3000)" +
          " + (2000 - n_stop * 2000 DIV n_words)"))
      .drop("n_words", "n_distinct", "sum_wlen", "n_stop")

    val clustered = quality.join(labels.select(col("id").as("doc_id"), col("lbl")),
      Seq("doc_id"), "left_outer")
    val nearKept = clustered.withColumn("krn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(coalesce(col("lbl"), col("doc_id")))
          .orderBy(col("quality_bp").desc, col("doc_id"))))
      .filter(col("krn") === 1).drop("krn", "lbl")

    // stage 3: quality floor
    val qualified = nearKept.filter(col("quality_bp") >= qualityMinBp)

    // stage 4: deterministic split by portable hash range
    val split = qualified.withColumn("split",
      when(pmod(PortableHash.md5Long(col("doc_id").cast("string"), salt = "split~"),
        lit(100L)) < 90, "train")
        .when(pmod(PortableHash.md5Long(col("doc_id").cast("string"), salt = "split~"),
          lit(100L)) < 95, "val")
        .otherwise("test"))

    val curated = split.drop("w")

    val report = Seq(
      ("0_raw", base.count()),
      ("1_exact_dedup", exactKept.count()),
      ("2_near_dedup", nearKept.count()),
      ("3_quality_floor", qualified.count()),
      ("4_split", curated.count())
    ).toDF("stage", "n_docs")

    Curated(curated, report)
  }
}
