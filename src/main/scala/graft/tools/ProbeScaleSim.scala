package graft.tools

import graft.{GraftSession, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Dev-only PERTURBED 10× probe for the exact-similarity self-join
  * family (q288 prefix-filter join, q471 temporal reach, q473 linkage
  * attack). These three cannot use ProbeScaleAll's replica mirror: exact
  * replicas inflate the TRUE ANSWER quadratically (10 copies of a doc ⇒
  * 45× its dup pairs; 10 copies of a user in an hour ⇒ 100× the cell's
  * co-occurrence edges), so mirror wall-clock measures answer growth,
  * not plan quality. The valid "10× more data" model holds DENSITY
  * constant while growing the domain:
  *
  *  - documents (q288): replica k strides doc_id and suffixes every
  *    whitespace token with "~k" — replica vocabularies are disjoint, so
  *    per-token df (and thus prefix-filter candidate density) is
  *    unchanged and the true answer grows exactly linearly.
  *  - events, hour-shifted (q471): replica k shifts ts by k×370 days
  *    with fresh user/event ids — per-(event_type, hour) cell density is
  *    unchanged, the co-occurrence edge set grows exactly linearly.
  *  - events, jittered (q473): replica k keeps the time range (the
  *    attack's known/anon halves must stay populated) under fresh ids
  *    but drops a replica-dependent ~6% slice of events, so replica
  *    profile vectors differ and the dictionary-encoded NN sees a
  *    realistically growing (not collapsing) vector census.
  *  - embeddings: replica k rotates each vector's dims by k%64 and
  *    negates for k≥64 — norms and per-dim distributions preserved,
  *    replicas mutually DISSIMILAR (cos ≈ 0), so LSH bucket density
  *    stays constant instead of every bucket holding 100 copies of
  *    each vector.
  *
  * Usage: ProbeScaleSim [factor] [q1,q2,...]   (default factor 10 and
  * the q288/q471/q473 trio; base dir from SPARK_GRAFT_SF_DIR, default
  * sf0.1; mirrors under /tmp/graft-sim, stamped with the factor and
  * rebuilt on mismatch)
  */
object ProbeScaleSim {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("probe-scale-sim")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val root = sys.env.getOrElse("SPARK_GRAFT_SIM_DIR", "/tmp/graft-sim")
    val dirH = s"$root/hours" // documents + hour-shifted events
    val dirJ = s"$root/jitter" // jittered events
    val dirC = s"$root/chars" // alphabet-rotated documents

    val stamp = java.nio.file.Paths.get(s"$root/_factor")
    val stampVal = s"$factor v3" // v2: + embeddings; v3: + chars mirror
    val stampOk = java.nio.file.Files.exists(stamp) &&
      java.nio.file.Files.readString(stamp).trim == stampVal
    if (!stampOk) {
      new java.io.File(dirH).mkdirs(); new java.io.File(dirJ).mkdirs()
      new java.io.File(dirC).mkdirs()
      val docs = Tables.t(spark, dir, "documents")
      (0 until factor).map { k =>
        docs.withColumn("doc_id", col("doc_id") + lit(k * 10000000L))
          .withColumn("text",
            regexp_replace(col("text"), "(\\S+)", "$1~" + k))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dirH/documents.parquet")
      // chars mirror: CHAR-level similarity (3-gram Jaccard, CDC,
      // fingerprints) sees word-suffixed replicas as near-identical —
      // only word-boundary grams change — so the hours mirror makes the
      // true answer quadratic again. Rotating the alphabet per replica
      // keeps lang / n_chars / length bands / shingle-set sizes and the
      // df profile SHAPE intact while making replica shingle sets
      // disjoint: per-(lang, band) block density stays constant.
      // per-replica affine permutation i → a·i+b (mod 26): 12 units × 26
      // offsets = 312 distinct maps; two distinct affine maps agree on
      // ≤13 letters, so cross-replica 3-gram Jaccard ≤ ~(1/2)³ ≈ 0.07
      val az = "abcdefghijklmnopqrstuvwxyz"
      val units = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
      (0 until factor).map { k =>
        val a = units((k / 26) % units.size)
        val b = k % 26
        val toLower = (0 until 26).map(i => az((a * i + b) % 26)).mkString
        docs.withColumn("doc_id", col("doc_id") + lit(k * 10000000L))
          .withColumn("text",
            if (k == 0) col("text")
            else translate(col("text"), az + az.toUpperCase,
              toLower + toLower.toUpperCase))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dirC/documents.parquet")
      val ev = Tables.t(spark, dir, "events") // ts → BIGINT nanos
      (0 until factor).map { k =>
        ev.withColumn("event_id", col("event_id") + lit(k * 1000000000L))
          .withColumn("user_id", col("user_id") + lit(k * 10000000L))
          .withColumn("ts", col("ts") + lit(k * 370L * 86400L * 1000000000L))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dirH/events.parquet")
      (0 until factor).map { k =>
        ev.filter(pmod(col("event_id") + lit(k * 5), lit(17)) =!= 0)
          .withColumn("event_id", col("event_id") + lit(k * 1000000000L))
          .withColumn("user_id", col("user_id") + lit(k * 10000000L))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dirJ/events.parquet")
      val emb = Tables.t(spark, dir, "embeddings")
      (0 until factor).map { k =>
        val r = k % 64
        val rotated =
          if (r == 0) col("embedding")
          else concat(slice(col("embedding"), r + 1, 64 - r),
            slice(col("embedding"), 1, r))
        val signed =
          if (k >= 64) transform(rotated, x => -x) else rotated
        emb.select(((col("vec_id") + lit(k * 10000000L)).as("vec_id") +:
          signed.as("embedding") +:
          emb.columns.filter(c => c != "vec_id" && c != "embedding")
            .map(col).toIndexedSeq): _*)
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dirH/embeddings.parquet")
      java.nio.file.Files.writeString(stamp, stampVal)
    }
    println(s"[sim] mirrors at $root (${factor}x): " +
      s"docs=${spark.read.parquet(s"$dirH/documents.parquet").count()} " +
      s"eventsH=${spark.read.parquet(s"$dirH/events.parquet").count()} " +
      s"eventsJ=${spark.read.parquet(s"$dirJ/events.parquet").count()}")

    def time(name: String, d: String): Double = {
      // min of 2 runs: this VM throttles in bursts
      val dt = (1 to 2).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, d).count()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[sim]   $name @ $d: $s%.2f s ($n rows)")
        s
      }.min
      spark.catalog.clearCache()
      dt
    }
    // every query runs on dirH (vocab-disjoint docs, hour-shifted
    // events, rotated embeddings) except q473, whose attack semantics
    // need the same-time-range jittered events, and the CHAR-level
    // similarity family, which needs the alphabet-rotated chars mirror
    // (word suffixes leave char 3-grams nearly identical)
    val charQueries = Set("q33_dedup_ngram_jaccard", "q53_fingerprint",
      "q558_cdc_chunking", "q212_boilerplate")
    val defaultPlan = Seq("q288_prefix_filter_join", "q471_temporal_reach",
      "q473_linkage_attack")
    val names = args.drop(1).headOption
      .map(_.split(",").toSeq.filter(SparkEntry.queries.contains))
      .getOrElse(defaultPlan)
    val rows = names.map { q =>
      val mirror = if (q == "q473_linkage_attack") dirJ
        else if (charQueries(q)) dirC else dirH
      val b = time(q, dir)
      val m = time(q, mirror)
      (q, b, m, m / b)
    }
    rows.foreach { case (q, b, m, r) =>
      println(f"[sim] $q: base $b%.2f s -> ${factor}x $m%.2f s  ratio $r%.2f")
    }
    spark.stop()
  }
}
