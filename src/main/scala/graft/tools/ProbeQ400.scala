package graft.tools

import graft.GraftSession
import graft.Tables.t
import org.apache.spark.sql.functions._

/** Dev-only: stage timings of q400's basket pipeline. */
object ProbeQ400 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val s = GraftSession.get("probe-q400")
    def tm[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val baskets = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_orderkey").as("ok"))
      .agg(sort_array(collect_set(col("p_brand"))).as("bs"))
      .cache()
    tm("baskets build")(baskets.count())
    tm("pairs agg")(baskets.select(explode(expr(
      """flatten(transform(bs, (x, i) ->
         transform(slice(bs, i + 2, size(bs)), y -> struct(x AS ba, y AS bb))))"""))
      .as("pr"))
      .groupBy(col("pr.ba"), col("pr.bb")).agg(count(lit(1))).count())
    tm("triples agg")(baskets.select(explode(expr(
      """flatten(transform(bs, (x, i) ->
         flatten(transform(slice(bs, i + 2, size(bs)), (y, j) ->
           transform(slice(bs, i + j + 3, size(bs)),
             z -> struct(x AS ta, y AS tb, z AS tc))))))"""))
      .as("tr"))
      .groupBy(col("tr.ta"), col("tr.tb"), col("tr.tc")).agg(count(lit(1))).count())
    s.stop()
  }
}
