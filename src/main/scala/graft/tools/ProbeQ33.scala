package graft.tools

import graft.GraftSession
import graft.Tables.t
import graft.dedup.Dedup
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only: per-stage wall-clock of q33's pipeline (shingle build, df
  * rank, rung-1 candidates, verify) to aim the optimization. */
object ProbeQ33 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val s = GraftSession.get("probe-q33")
    def tm[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = t(s, dir, "documents")
      .filter(length(col("text")) >= 3)
      .select(col("lang"), expr("n_chars DIV 50").as("blk"), col("doc_id"),
        Dedup.shingleSetHash(col("text"), 3).as("g"))
      .withColumn("sz", size(col("g")).cast("bigint"))
      .cache()
    tm("docs build")(docs.count())
    val rk = docs.select(explode(col("g")).as("h"))
      .groupBy("h").agg(count(lit(1)).as("df"))
    tm("rk census")(println("  rk rows=" + rk.count()))
    val ranked = docs
      .select(col("lang"), col("blk"), col("doc_id"), col("sz"),
        explode(col("g")).as("h"))
      .join(broadcast(rk), "h")
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy("df", "h")))
      .select("lang", "blk", "doc_id", "sz", "h", "rn")
      .cache()
    tm("ranked build")(ranked.count())
    val (p, q) = (9L, 10L)
    val pre = ranked.where(
      col("rn") <= col("sz") - expr(s"($p*sz + ${q - 1}) DIV $q") + 1)
    val cand = pre.as("a").join(pre.as("b"),
        col("a.lang") === col("b.lang") && col("a.blk") === col("b.blk") &&
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
          col("b.sz") * q >= col("a.sz") * p &&
          col("a.sz") * q >= col("b.sz") * p &&
          (lit(1L) + least(col("a.sz") - col("a.rn"),
            col("b.sz") - col("b.rn"))) * (p + q) >=
            (col("a.sz") + col("b.sz")) * p)
      .select(col("a.lang").as("lang"), col("a.doc_id").as("id_a"),
        col("b.doc_id").as("id_b"))
      .distinct().cache()
    tm("rung1 candidates")(println("  cand rows=" + cand.count()))
    val ver = cand
      .join(docs.select(col("doc_id").as("id_a"), col("g").as("g_a"),
        col("sz").as("sz_a")), Seq("id_a"))
      .join(docs.select(col("doc_id").as("id_b"), col("g").as("g_b"),
        col("sz").as("sz_b")), Seq("id_b"))
      .withColumn("inter", Dedup.sortedIntersectCount("g_a", "g_b"))
      .where(col("inter") * (p + q) >= (col("sz_a") + col("sz_b")) * p)
    tm("verify")(println("  pass rows=" + ver.count()))
    s.stop()
  }
}
