package graft.queries

import graft.Tables.t
import graft.functions.TextFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 76 — community quality, index
  * construction, inventory matching, fair division:
  *
  *  - q327: graph modularity of the nation partition over the weighted
  *    supplier co-supply graph — per-community contribution
  *    (4m·e_c − d_c²)/4m² with every count exact BIGINT; "are nations
  *    real communities in the trade graph" (q184's assortativity is the
  *    degree-mixing view, this is the partition-quality view).
  *  - q328: inverted-index construction — per (lang, word) document
  *    frequency, collection frequency, and the head of the sorted
  *    posting list (string-encoded so both engines canonicalize
  *    identically); the index-build step behind q266/q167 retrieval.
  *  - q329: FIFO lot matching — supply lots vs demand draws per part as
  *    overlapping cumulative-quantity intervals ([cum_prev, cum) ×
  *    [cum_prev, cum) overlap join), allocation count/quantity and
  *    split-lot accounting; the inventory-costing interval algebra
  *    (q28/q213 union/census, this is the MATCHING).
  *  - q330: max-min fair (water-filling) allocation — nation order
  *    counts as demands against a half-total capacity: largest fully-
  *    served prefix k by exact monotone condition p_k+(n−k)·d_k ≤ C,
  *    integer level + remainder so Σalloc == C exactly.
  *
  * Reference analog: are AOIs natural clusters of the listing graph;
  * keyword index over review text; matching scrape capacity to queued
  * work in arrival order; fair scan-budget split across AOIs.
  */
object QueriesCE extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q327
    QDef("q327_modularity",
      (s, dir) => {
        // r11: NO pair materialization. Every modularity term is a
        // per-order census sum — with b = |suppliers of order o| and
        // b_n = |suppliers of nation n in order o|:
        //   m   = Σ_o C(b,2)          (every co-occurrence pair, with
        //                              multiplicity w, = Σ_c d_c / 2)
        //   d_c = Σ_{(o,n=c)} b_n·(b−1)   (deg(sk) = Σ_{o∋sk} (b−1))
        //   e_c = Σ_{(o,n=c)} C(b_n,2)    (same-nation pair incidences)
        // so ONE countDistinct aggregate to (ok, nation, b_n), a per-ok
        // window for b, and a ≤|nation| rollup replace the os self-join
        // + the (sa,sb) pair shuffle — the quadratic edge build this
        // query was exempt-adjacent for (6.1 s = 1.94x at sf1). The
        // b >= 2 filter keeps exactly the nations whose suppliers
        // co-occur at least once (the old deg-table key set).
        // (r10's basket-array pair build was a measured negative result
        // — 2.6 vs 1.8 s sf0.1 — but this form drops the pair DOMAIN,
        // not just its build.)
        val perOkNat = t(s, dir, "lineitem")
          .join(broadcast(t(s, dir, "supplier")
            .select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("l_orderkey").as("ok"), col("s_nationkey"))
          .agg(countDistinct(col("l_suppkey")).cast("long").as("bn"))
        val wOk = Window.partitionBy("ok")
        perOkNat
          .withColumn("b", sum("bn").over(wOk).cast("long"))
          .where(col("b") >= 2)
          .groupBy("s_nationkey")
          .agg(sum(col("bn") * (col("b") - 1)).cast("bigint").as("d_c"),
            expr("CAST(sum(bn * (bn - 1) DIV 2) AS BIGINT)").as("e_c"))
          .withColumn("m",
            expr("CAST(sum(d_c) OVER () DIV 2 AS BIGINT)"))
          .selectExpr("s_nationkey", "e_c", "d_c",
            """CAST(floor(CAST(4 * m * e_c - d_c * d_c AS DOUBLE)
               / CAST(4 * m * m AS DOUBLE) * 1000000) AS BIGINT)
               AS contrib_micro""")
          .orderBy("s_nationkey")
      },
      Some("""
        WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
                    FROM lineitem),
        edges AS (
          SELECT a.sk AS sa, b.sk AS sb, count(*) AS w
          FROM os a JOIN os b ON a.ok = b.ok AND a.sk < b.sk
          GROUP BY 1, 2),
        m AS (SELECT CAST(sum(w) AS BIGINT) AS m FROM edges),
        deg AS (
          SELECT sk, CAST(sum(w) AS BIGINT) AS d FROM (
            SELECT sa AS sk, w FROM edges
            UNION ALL SELECT sb AS sk, w FROM edges)
          GROUP BY 1),
        dc AS (
          SELECT s_nationkey, CAST(sum(d) AS BIGINT) AS d_c
          FROM deg JOIN supplier ON sk = s_suppkey GROUP BY 1),
        ec AS (
          SELECT na.s_nationkey, CAST(sum(e.w) AS BIGINT) AS e_c
          FROM edges e
          JOIN supplier na ON e.sa = na.s_suppkey
          JOIN supplier nb ON e.sb = nb.s_suppkey
          WHERE na.s_nationkey = nb.s_nationkey
          GROUP BY 1)
        SELECT dc.s_nationkey, coalesce(ec.e_c, 0) AS e_c, dc.d_c,
               CAST(floor(CAST(4 * m.m * coalesce(ec.e_c, 0)
                 - dc.d_c * dc.d_c AS DOUBLE)
                 / CAST(4 * m.m * m.m AS DOUBLE) * 1000000) AS BIGINT)
                 AS contrib_micro
        FROM dc LEFT JOIN ec ON dc.s_nationkey = ec.s_nationkey, m
        ORDER BY dc.s_nationkey""")),

    // --------------------------------------------------------------- q328
    QDef("q328_inverted_index",
      (s, dir) => {
        t(s, dir, "documents")
          .withColumn("w", TextFunctions.words(col("text")))
          .select(col("lang"), col("doc_id"), explode(col("w")).as("word"))
          .groupBy("lang", "word")
          .agg(countDistinct("doc_id").as("df"),
            count(lit(1)).as("cf"),
            expr("concat_ws(',', transform(slice(sort_array(collect_set(doc_id)), 1, 5), x -> CAST(x AS STRING)))")
              .as("postings_head"))
          .orderBy(col("df").desc, col("cf").desc, col("lang"), col("word"))
          .limit(25)
      },
      Some(s"""
        WITH toks AS (
          SELECT lang, doc_id, unnest(${TextFunctions.wordsSql("text")}) AS word
          FROM documents)
        SELECT lang, word, count(DISTINCT doc_id) AS df, count(*) AS cf,
               array_to_string(list_transform(
                 list_slice(list_sort(list(DISTINCT doc_id)), 1, 5),
                 x -> CAST(x AS VARCHAR)), ',') AS postings_head
        FROM toks GROUP BY 1, 2
        ORDER BY df DESC, cf DESC, lang, word LIMIT 25""")),

    // --------------------------------------------------------------- q329
    QDef("q329_fifo_match",
      (s, dir) => {
        val li = t(s, dir, "lineitem").selectExpr("l_partkey", "l_orderkey",
          "l_linenumber", "l_returnflag",
          "CAST(floor(l_quantity) AS BIGINT) AS qty",
          "unix_millis(CAST(l_shipdate AS TIMESTAMP)) DIV 86400000 AS d")
        def stream(flt: org.apache.spark.sql.Column, a: String, b: String) = {
          val w = Window.partitionBy("l_partkey")
            .orderBy("d", "l_orderkey", "l_linenumber")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          li.where(flt)
            .withColumn(b, sum("qty").over(w))
            .withColumn(a, col(b) - col("qty"))
        }
        val lots = stream(col("l_returnflag") =!= "R", "l0", "l1")
          .select(col("l_partkey"), col("l0"), col("l1"))
        val sales = stream(col("l_returnflag") === "R", "s0", "s1")
          .select(col("l_partkey").as("pk"), col("s0"), col("s1"))
        val allocs = lots.join(sales, col("l_partkey") === col("pk"))
          .withColumn("aq",
            least(col("l1"), col("s1")) - greatest(col("l0"), col("s0")))
          .where(col("aq") > 0)
        val perLot = allocs.groupBy("l_partkey", "l0")
          .agg(count(lit(1)).as("n_sales_for_lot"))
        allocs.groupBy(col("l_partkey") % 10 as "bucket")
          .agg(count(lit(1)).as("n_allocs"),
            sum("aq").cast("bigint").as("alloc_qty"),
            countDistinct(col("l_partkey")).as("n_parts"))
          .join(perLot.where(col("n_sales_for_lot") >= 2)
            .groupBy(col("l_partkey") % 10 as "bucket")
            .agg(count(lit(1)).as("n_split_lots")), Seq("bucket"), "left")
          .na.fill(0L, Seq("n_split_lots"))
          .orderBy("bucket")
      },
      Some("""
        WITH li AS (
          SELECT l_partkey, l_orderkey, l_linenumber, l_returnflag,
                 CAST(floor(l_quantity) AS BIGINT) AS qty,
                 epoch_ms(l_shipdate) // 86400000 AS d
          FROM lineitem),
        lots AS (
          SELECT l_partkey,
                 sum(qty) OVER w - qty AS l0, sum(qty) OVER w AS l1
          FROM li WHERE l_returnflag <> 'R'
          WINDOW w AS (PARTITION BY l_partkey
            ORDER BY d, l_orderkey, l_linenumber ROWS UNBOUNDED PRECEDING)),
        sales AS (
          SELECT l_partkey AS pk,
                 sum(qty) OVER w - qty AS s0, sum(qty) OVER w AS s1
          FROM li WHERE l_returnflag = 'R'
          WINDOW w AS (PARTITION BY l_partkey
            ORDER BY d, l_orderkey, l_linenumber ROWS UNBOUNDED PRECEDING)),
        allocs AS (
          SELECT l_partkey, l0,
                 least(l1, s1) - greatest(l0, s0) AS aq
          FROM lots JOIN sales ON l_partkey = pk
          WHERE least(l1, s1) - greatest(l0, s0) > 0),
        per_lot AS (
          SELECT l_partkey, l0, count(*) AS n_sales_for_lot
          FROM allocs GROUP BY 1, 2),
        main AS (
          SELECT l_partkey % 10 AS bucket, count(*) AS n_allocs,
                 CAST(sum(aq) AS BIGINT) AS alloc_qty,
                 count(DISTINCT l_partkey) AS n_parts
          FROM allocs GROUP BY 1),
        split AS (
          SELECT l_partkey % 10 AS bucket, count(*) AS n_split_lots
          FROM per_lot WHERE n_sales_for_lot >= 2 GROUP BY 1)
        SELECT bucket, n_allocs, alloc_qty, n_parts,
               coalesce(n_split_lots, 0) AS n_split_lots
        FROM main LEFT JOIN split USING (bucket)
        ORDER BY bucket""")),

    // --------------------------------------------------------------- q330
    QDef("q330_fair_share",
      (s, dir) => {
        val dem = t(s, dir, "orders")
          .join(t(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey")).agg(count(lit(1)).as("d"))
        val wOrd = Window.orderBy(col("d"), col("c_nationkey"))
        val wAll = Window.partitionBy(lit(1))
        val base = dem
          .withColumn("i", row_number().over(wOrd).cast("long"))
          .withColumn("p", sum("d").over(
            wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("n", count(lit(1)).over(wAll))
          .withColumn("cap", (sum("d").over(wAll) / lit(2)).cast("long"))
        val k = base.where(col("p") + (col("n") - col("i")) * col("d") <= col("cap"))
          .agg(coalesce(max("i"), lit(0L)).as("k"),
            coalesce(max("p"), lit(0L)).as("p_k"))
        base.crossJoin(broadcast(k))
          .selectExpr("c_nationkey", "d", "i", "cap",
            "CASE WHEN i <= k THEN d ELSE (cap - p_k) DIV (n - k) + " +
              "(CASE WHEN i - k <= (cap - p_k) % (n - k) THEN 1 ELSE 0 END) END AS alloc")
          .selectExpr("c_nationkey", "d", "alloc",
            "CASE WHEN alloc >= d THEN 1 ELSE 0 END AS fully_served")
          .orderBy("c_nationkey")
      },
      Some("""
        WITH dem AS (
          SELECT c_nationkey, count(*) AS d
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY 1),
        base AS (
          SELECT c_nationkey, d,
                 CAST(row_number() OVER (ORDER BY d, c_nationkey) AS BIGINT) AS i,
                 CAST(sum(d) OVER (ORDER BY d, c_nationkey
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p,
                 count(*) OVER () AS n,
                 CAST(sum(d) OVER () AS BIGINT) // 2 AS cap
          FROM dem),
        kk AS (
          SELECT coalesce(max(i), 0) AS k,
                 coalesce(max(CASE WHEN ok THEN p END), 0) AS p_k
          FROM (SELECT i, p, true AS ok FROM base
                WHERE p + (n - i) * d <= cap))
        SELECT c_nationkey, d,
               CASE WHEN i <= k THEN d
                    ELSE (cap - p_k) // (n - k)
                       + (CASE WHEN i - k <= (cap - p_k) % (n - k)
                          THEN 1 ELSE 0 END) END AS alloc,
               CASE WHEN (CASE WHEN i <= k THEN d
                    ELSE (cap - p_k) // (n - k)
                       + (CASE WHEN i - k <= (cap - p_k) % (n - k)
                          THEN 1 ELSE 0 END) END) >= d
                    THEN 1 ELSE 0 END AS fully_served
        FROM base, kk ORDER BY c_nationkey"""))
  )
}
