package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Adversarial robustness, part 2: nulls in ATTRIBUTE columns (text,
  * payloads, measures, embeddings) are routine in 100 TB ingest; under
  * ANSI SQL they must degrade gracefully (rows drop out of filters /
  * null-group aggregates), never throw. Keys/timestamps stay non-null —
  * that's the realistic contract (enforced at ingest).
  *
  * Every registered query runs against a 1-in-5-nulled copy of the
  * testdata; anything but a throw passes.
  */
class NullInputSpec extends SparkSpec {

  /** Columns allowed to go null per table (attributes, never keys). */
  private val nullable: Map[String, Seq[String]] = Map(
    "documents" -> Seq("text", "lang", "source"),
    "events" -> Seq("value", "props"),
    "customer" -> Seq("c_acctbal", "c_mktsegment"),
    "orders" -> Seq("o_totalprice"),
    "lineitem" -> Seq("l_quantity"),
    "embeddings" -> Seq("embedding"))

  private lazy val nulledDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-nulled").toString
    Tables.all.foreach { name =>
      val base = Tables.t(spark, "/root/testdata/sf0.001", name)
      val out = nullable.getOrElse(name, Seq.empty).foldLeft(base) { (df, c) =>
        // deterministic 1-in-5 null injection keyed on a stable row id
        df.withColumn(c,
          when(pmod(xxhash64(col(df.columns.head), lit(c)), lit(5)) === 0, lit(null))
            .otherwise(col(c)))
      }
      out.write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    dir
  }

  test("every query tolerates nulls in attribute columns") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, nulledDir).collect()
        None
      } catch {
        case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}")
      }
    }
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
  }
}
