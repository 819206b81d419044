package graft.queries

import graft.Tables.t
import graft.dedup.Components
import graft.functions.PortableHash
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 69 — graph structure census and
  * deterministic sampling designs:
  *
  *  - q300: connected-component SIZE HISTOGRAM of the part co-purchase
  *    graph (pair support ≥ 2) — Components.connectedComponents (one-
  *    task union-find while the support-filtered edge census is bounded,
  *    pointer-jumping label propagation above the threshold) on the
  *    Spark side, recursive-closure oracle; the shape report behind
  *    q35/q216's clustering (how fragmented is the graph, is there a
  *    giant component).
  *  - q301: systematic PPS sampling — k=20 probability-proportional-
  *    to-size draws over the part revenue curve: a part is drawn once
  *    per multiple of tot/k its cumulative interval covers, decided by
  *    exact integer floor((cum·k)/tot) − floor(((cum−v)·k)/tot). The
  *    classic survey-sampling design, one sorted scan, zero RNG.
  *  - q302: bottom-k sample sketch per market segment — the k=10
  *    customers with the smallest portable hash: a uniform
  *    without-replacement sample that is MERGEABLE (union = bottom-k of
  *    bottoms), the scale-path sampler behind q86's rate-based split.
  *
  * Reference analog: co-visibility graph fragmentation; budget-bounded
  * listing audits proportional to revenue; reproducible per-area spot
  * samples.
  */
object QueriesBX extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q300
    QDef("q300_cc_size_histogram",
      (s, dir) => {
        val edges = t(s, dir, "lineitem")
          // basket-array pair build (q140/q390 pattern): one collect_set
          // shuffle, pairs map-side from the <=7-part sorted basket
          .groupBy(col("l_orderkey"))
          .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
          .select(explode(expr(
            """flatten(transform(ps, (x, i) ->
               transform(slice(ps, i + 2, size(ps)), y -> struct(x AS id_a, y AS id_b))))"""))
            .as("pr"))
          .select(col("pr.id_a").as("id_a"), col("pr.id_b").as("id_b"))
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("c"))
          .where(col("c") >= 2)
          .select("id_a", "id_b")
        Components.connectedComponents(edges, "id_a", "id_b")
          .groupBy("lbl").agg(count(lit(1)).as("sz"))
          .groupBy(col("sz").as("component_size"))
          .agg(count(lit(1)).as("n_components"), min("lbl").as("min_label"))
          .orderBy("component_size")
      },
      Some {
        val edgesSql = """
          SELECT a.l_partkey AS id_a, b.l_partkey AS id_b
          FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
          JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= 2"""
        s"""
        WITH comp AS (${Components.labelPropagationSql(edgesSql)}),
        cl AS (SELECT lbl, count(*) AS sz FROM comp GROUP BY 1)
        SELECT sz AS component_size, count(*) AS n_components,
               min(lbl) AS min_label
        FROM cl GROUP BY 1 ORDER BY component_size"""
      }),

    // --------------------------------------------------------------- q301
    QDef("q301_pps_sample",
      (s, dir) => {
        val k = 20L
        val revExpr =
          "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))"
        val perPart = t(s, dir, "lineitem")
          .selectExpr("l_partkey", s"$revExpr AS rev")
          .groupBy("l_partkey").agg(sum("rev").cast("bigint").as("v"))
        val SR = graft.operators.ScaleRank
        SR.withTotals(
            SR.withGlobalRunningSum(perPart,
              Seq(col("v").desc, col("l_partkey")), col("v"), "cum"),
            Seq(sum("v").cast("bigint").as("tot")))
          .withColumn("n_draws",
            expr(s"(cum * $k) DIV tot - ((cum - v) * $k) DIV tot"))
          .where(col("n_draws") >= 1)
          .selectExpr("l_partkey AS partkey", "v AS v_cp", "cum AS cum_cp",
            "n_draws", "v * 10000 DIV tot AS weight_bp")
          .orderBy("cum_cp")
      },
      Some("""
        WITH per_part AS (
          SELECT l_partkey,
                 CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                   * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
                   AS BIGINT) AS v
          FROM lineitem GROUP BY 1),
        curve AS (
          SELECT l_partkey, v,
                 sum(v) OVER (ORDER BY v DESC, l_partkey
                              ROWS UNBOUNDED PRECEDING) AS cum,
                 sum(v) OVER () AS tot
          FROM per_part)
        SELECT l_partkey AS partkey, v AS v_cp, CAST(cum AS BIGINT) AS cum_cp,
               CAST((cum * 20) // tot - ((cum - v) * 20) // tot AS BIGINT) AS n_draws,
               CAST(v * 10000 // tot AS BIGINT) AS weight_bp
        FROM curve
        WHERE (cum * 20) // tot - ((cum - v) * 20) // tot >= 1
        ORDER BY cum_cp""")),

    // --------------------------------------------------------------- q302
    QDef("q302_bottomk_sample",
      (s, dir) => {
        val h = PortableHash.md5Long(concat(lit("bk_"), col("c_custkey")))
        val w = Window.partitionBy("c_mktsegment").orderBy("h", "c_custkey")
        t(s, dir, "customer")
          .select(col("c_mktsegment"), col("c_custkey"), h.as("h"))
          .withColumn("rk", row_number().over(w))
          .where(col("rk") <= 10)
          .selectExpr("c_mktsegment", "CAST(rk AS BIGINT) AS rk", "c_custkey", "h")
          .orderBy("c_mktsegment", "rk")
      },
      Some {
        val hSql = PortableHash.md5LongSql("'bk_' || c_custkey")
        s"""
        WITH x AS (
          SELECT c_mktsegment, c_custkey, $hSql AS h
          FROM customer),
        r AS (
          SELECT c_mktsegment, c_custkey, h,
                 CAST(row_number() OVER (PARTITION BY c_mktsegment
                   ORDER BY h, c_custkey) AS BIGINT) AS rk
          FROM x)
        SELECT c_mktsegment, rk, c_custkey, h
        FROM r WHERE rk <= 10 ORDER BY c_mktsegment, rk"""
      })
  )
}
