package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ScaleRank must be BIT-IDENTICAL to the single-task global window it
  * replaces — same values, parallel plan. */
class ScaleRankSpec extends SparkSpec {

  private def sampleDf(n: Int) = {
    import spark.implicits._
    // duplicate keys + negatives, unsorted arrival, unique tiebreaker id
    (0 until n).map(i => ((i * 37 % 101) - 50, i.toLong)).toDF("v", "id")
      .repartition(7)
  }

  test("withGlobalRowNumber equals global row_number() (asc, desc, ties)") {
    val df = sampleDf(500)
    for (ord <- Seq(Seq(col("v"), col("id")), Seq(col("v").desc, col("id").desc))) {
      val fast = ScaleRank.withGlobalRowNumber(df, ord, "rn", nParts = 8)
      val slow = df.withColumn("rn", row_number().over(Window.orderBy(ord: _*)).cast("bigint"))
      assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
    }
  }

  test("withGlobalRowNumber plan has no unpartitioned WindowExec over the input") {
    val df = sampleDf(500)
    val fast = ScaleRank.withGlobalRowNumber(df, Seq(col("v"), col("id")), "rn", nParts = 8)
    fast.collect() // materialize AQE final plan
    val (raw, agg) = graft.tools.PlanScan.globalWindows(fast.queryExecution.executedPlan)
    assert(raw == 0, s"raw global windows: $raw")
    assert(agg <= 1, s"agg global windows: $agg") // only the nParts-row offsets cumsum
  }

  test("multi-branch consumers see one consistent rank assignment") {
    // the q385 regression shape: one ranked frame consumed by two
    // structurally different branches must agree on every rank
    val df = sampleDf(600)
    val ranked = ScaleRank.withGlobalRowNumber(df, Seq(col("v"), col("id")), "rn", nParts = 8)
    val b1 = ranked.withColumn("x", lag("rn", 1).over(
      Window.partitionBy("v").orderBy("rn")))
      .select(col("id"), col("rn").as("rn1"))
    val b2 = ranked.select(col("id"), col("rn").as("rn2"))
    assert(b1.join(b2, "id").where(col("rn1") =!= col("rn2")).count() == 0)
  }

  test("withGlobalRunningSum equals global running sum") {
    val df = sampleDf(400)
    val ord = Seq(col("v"), col("id"))
    val fast = ScaleRank.withGlobalRunningSum(df, ord, col("v") * 3 - 1, "cum", nParts = 8)
    val slow = df.withColumn("cum",
      sum((col("v") * 3 - 1).cast("bigint")).over(Window.orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
  }

  test("ntileFromRowNumber matches Spark ntile for awkward n, k") {
    import spark.implicits._
    for (n <- Seq(1, 7, 10, 23, 100); k <- Seq(1, 3, 4, 10, 17)) {
      val df = (1 to n).map(i => (i * 13 % 97, i.toLong)).toDF("v", "id")
      val ord = Seq(col("v"), col("id"))
      val viaRn = ScaleRank.withGlobalRowNumber(df, ord, "rn", nParts = 4)
        .crossJoin(broadcast(df.agg(count(lit(1)).as("n"))))
        .withColumn("bucket", ScaleRank.ntileFromRowNumber(col("rn"), col("n"), k))
        .select("v", "id", "bucket")
      val native = df.withColumn("bucket", ntile(k).over(Window.orderBy(ord: _*)))
        .select("v", "id", "bucket")
      assert(viaRn.exceptAll(native).isEmpty && native.exceptAll(viaRn).isEmpty,
        s"n=$n k=$k")
    }
  }

  test("empty and single-row inputs") {
    import spark.implicits._
    val empty = Seq.empty[(Int, Long)].toDF("v", "id")
    assert(ScaleRank.withGlobalRowNumber(empty, Seq(col("v"), col("id")), "rn").count() == 0)
    val one = Seq((5, 1L)).toDF("v", "id")
    val r = ScaleRank.withGlobalRowNumber(one, Seq(col("v"), col("id")), "rn")
      .select("rn").as[Long].collect()
    assert(r.toSeq == Seq(1L))
  }

  test("withGlobalRunningSums: N sums in one pass equal N naive windows") {
    val df = sampleDf(300)
    val ord = Seq(col("v"), col("id"))
    val fast = ScaleRank.withGlobalRunningSums(df, ord,
      Seq(col("v") -> "c1", (col("v") * 2 + 1) -> "c2"), nParts = 8)
    val w = Window.orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val slow = df
      .withColumn("c1", sum(col("v").cast("bigint")).over(w))
      .withColumn("c2", sum((col("v") * 2 + 1).cast("bigint")).over(w))
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
  }

  test("withGlobalRankAndSum equals separate rank + running sum") {
    val df = sampleDf(300)
    val ord = Seq(col("v").desc, col("id"))
    val fast = ScaleRank.withGlobalRankAndSum(df, ord, col("v"), "rn", "cum", nParts = 8)
    val w = Window.orderBy(ord: _*)
    val slow = df
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .withColumn("cum", sum(col("v").cast("bigint")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
  }

  test("withGlobalNtile equals Spark's global ntile") {
    val df = sampleDf(137)
    val ord = Seq(col("v"), col("id"))
    val fast = ScaleRank.withGlobalNtile(df, ord, 10, "b", nParts = 8)
      .select(col("id"), col("b"))
    val slow = df.withColumn("b", ntile(10).over(Window.orderBy(ord: _*)))
      .select(col("id"), col("b"))
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
  }

  test("quantileDisc equals rank-selected percentile_disc, ties included") {
    import spark.implicits._
    // heavy ties: values 0..9 each repeated
    val df = (0 until 200).map(i => (i % 10, i.toLong)).toDF("v", "id")
    for ((num, den) <- Seq((1, 2), (95, 100), (1, 100), (99, 100), (1, 1))) {
      val fast = ScaleRank.quantileDisc(df, col("v"), num, den, "q", nParts = 4)
        .head().getInt(0)
      val slow = df
        .withColumn("rn", row_number().over(Window.orderBy("v", "id")))
        .crossJoin(broadcast(df.agg(count(lit(1)).as("n"))))
        .where(col("rn") * den >= col("n") * num)
        .agg(min("v")).head().getInt(0)
      assert(fast == slow, s"num=$num den=$den fast=$fast slow=$slow")
    }
  }

  test("withTotals broadcasts grand aggregates") {
    import spark.implicits._
    val df = sampleDf(100)
    val out = ScaleRank.withTotals(df, Seq(count(lit(1)).as("n"), sum("v").cast("bigint").as("tot")))
    val row = out.select("n", "tot").distinct().collect()
    assert(row.length == 1 && row.head.getLong(0) == 100L)
  }
}
