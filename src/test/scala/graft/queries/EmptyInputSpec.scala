package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}

/** Adversarial robustness: every registered query must EXECUTE on
  * empty inputs with the production schema — no exceptions from empty
  * caches, empty window partitions, empty LSH band tables, sequence()
  * on null aggregates, etc. (Empty partitions are routine at 100 TB:
  * a date/tile partition with no rows yet must not kill the job.)
  *
  * Queries may legitimately return zero rows; a handful return
  * constant-shaped rollups (funnel stages, set-op counts) — anything
  * but a throw is acceptable here.
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    Tables.all.foreach { name =>
      val schema = Tables.t(spark, "/root/testdata/sf0.001", name).schema
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .repartition(1)
        .write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    dir
  }

  test("every query runs to completion on empty tables") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, emptyDir).collect()
        None
      } catch {
        case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
  }
}
