package graft.queries

import graft.Tables.t
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 128 — corpus growth laws, ordered
  * dose-response testing, greedy routing, smoothed language models:
  *
  *  - q526: Heaps'-law vocabulary-growth fit V(T) ≈ K·T^β — docs are
  *    bucketed into 20 id-range checkpoints, cumulative tokens come
  *    from per-bucket sums and cumulative vocabulary from each word's
  *    FIRST bucket (min doc_id) — both one aggregation + a 20-row
  *    prefix sum, never a per-checkpoint rescan. β/α by OLS on
  *    integer-micro log-log points (exact component sums). The
  *    "how much new vocab does 10× data buy" corpus-planning curve.
  *  - q527: Cochran–Armitage trend test: ordered dose = order-priority
  *    digit (1..5), outcome = status 'F'; the trend statistic and its
  *    variance stay in exact int64 (U = N·Σtr − R·Σtn), z floor-milli.
  *    The ordered-alternative complement of q133's 2×2 chi-square.
  *  - q528: nearest-neighbor harvest route over the 25 nation
  *    centroids (integer milli-cell coordinates from distributed
  *    sums): 24 greedy legs from nation 0, squared-distance argmin
  *    with smallest-nationkey ties. Spark = one bounded task; oracle =
  *    recursive CTE over (visited LIST, per-candidate distance LIST)
  *    with list_min/list_position (q519's machine, min-side).
  *  - q529: interpolated Kneser–Ney bigram LM (discount 3/4): bigram/
  *    context/continuation counts in one pass over exploded bigrams,
  *    p_KN = [(4c₂−3)·N_B + 3·N1f(w1)·N1b(w2)] / (4·c₁·N_B) — EXACT
  *    integer ppm (discount cleared by 4), top-25 bigrams. The
  *    real smoothing used by n-gram LMs (q57's MLE upgraded).
  *
  * Scale shapes: q526/q529 are hash aggregations over words/bigrams
  * (fully distributed) with bounded tails; q527 is one conditional-sum
  * pass; q528's quadratic is 25×25 after distributed centroid sums.
  */
object QueriesEE extends QueryPack {
  import Q._

  // NOT private: Spark's generated (de)serializer code must access these.
  case class NnNode(nationkey: Long, cx: Long, cy: Long)
  case class NnOut(step: Long, nationkey: Long, leg_dist2: Long, cum_dist2: Long)

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q526
    QDef("q526_heaps_law",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .where(col("text").isNotNull)
          .select(col("doc_id"), words(col("text")).as("w"))
        val mx = docs.agg(max("doc_id").as("maxid")).where(col("maxid") > 0)
        val bucketed = docs.crossJoin(broadcast(mx))
          .selectExpr("doc_id", "w",
            "greatest(1L, (doc_id * 20 + maxid - 1) DIV maxid) AS b")
        // cumulative tokens: per-bucket token sums → 20-row prefix sum
        val toks = bucketed.selectExpr("b", "size(w) AS wc")
          .groupBy("b").agg(sum("wc").cast("long").as("tk"))
        // cumulative vocab: each word's FIRST bucket → 20-row prefix sum
        val firsts = bucketed
          .select(col("b"), explode(col("w")).as("word"))
          .groupBy("word").agg(min("b").as("fb"))
          .groupBy("fb").agg(count(lit(1)).as("nv"))
        val w20 = org.apache.spark.sql.expressions.Window.orderBy("b")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        val pts = toks.join(firsts, col("b") === col("fb"), "left")
          .selectExpr("b", "tk", "coalesce(nv, 0L) AS nv")
          .withColumn("T", sum("tk").over(w20).cast("long"))
          .withColumn("V", sum("nv").over(w20).cast("long"))
          .where(expr("T > 1 AND V > 1"))
          .selectExpr(
            "CAST(floor(ln(CAST(T AS DOUBLE)) * 1e6) AS BIGINT) AS x",
            "CAST(floor(ln(CAST(V AS DOUBLE)) * 1e6) AS BIGINT) AS y",
            "T", "V", "b")
        val tail = pts.orderBy(col("b").desc).limit(1)
          .selectExpr("T AS total_tokens", "V AS total_vocab")
        pts.agg(count(lit(1)).as("n"),
            sum("x").cast("long").as("sx"), sum("y").cast("long").as("sy"),
            sum(expr("x*y")).cast("long").as("sxy"),
            sum(expr("x*x")).cast("long").as("sxx"))
          .where(expr("n > 1 AND n*sxx > sx*sx"))
          .crossJoin(broadcast(tail))
          .selectExpr("n AS n_points", "total_tokens", "total_vocab",
            """CAST(floor(CAST(n*sxy - sx*sy AS DOUBLE)
                 / CAST(n*sxx - sx*sx AS DOUBLE) * 1000) AS BIGINT)
               AS beta_milli""",
            """CAST(floor((CAST(sy AS DOUBLE) - CAST(n*sxy - sx*sy AS DOUBLE)
                 / CAST(n*sxx - sx*sx AS DOUBLE) * sx) / n / 1000) AS BIGINT)
               AS alpha_milli""")
      },
      Some(s"""
        WITH docs AS (
          SELECT doc_id, ${wordsSql("text")} AS w
          FROM documents WHERE text IS NOT NULL),
        mx AS (SELECT CAST(max(doc_id) AS BIGINT) AS maxid FROM docs
               WHERE (SELECT max(doc_id) FROM docs) > 0),
        bucketed AS (
          SELECT doc_id, w,
                 greatest(1, (doc_id * 20 + maxid - 1) // maxid) AS b
          FROM docs, mx),
        toks AS (
          SELECT b, CAST(sum(len(w)) AS BIGINT) AS tk
          FROM bucketed GROUP BY b),
        firsts AS (
          SELECT fb, CAST(count(*) AS BIGINT) AS nv FROM (
            SELECT word, min(b) AS fb
            FROM (SELECT b, unnest(w) AS word FROM bucketed)
            GROUP BY word)
          GROUP BY fb),
        pts AS (
          SELECT b,
                 CAST(floor(ln(CAST(T AS DOUBLE)) * 1e6) AS BIGINT) AS x,
                 CAST(floor(ln(CAST(V AS DOUBLE)) * 1e6) AS BIGINT) AS y,
                 T, V
          FROM (
            SELECT t.b, CAST(sum(t.tk) OVER (ORDER BY t.b) AS BIGINT) AS T,
                   CAST(sum(coalesce(f.nv, 0)) OVER (ORDER BY t.b)
                     AS BIGINT) AS V
            FROM toks t LEFT JOIN firsts f ON t.b = f.fb)
          WHERE T > 1 AND V > 1),
        tail AS (
          SELECT T AS total_tokens, V AS total_vocab
          FROM pts ORDER BY b DESC LIMIT 1),
        c AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x*y) AS BIGINT) AS sxy,
                 CAST(sum(x*x) AS BIGINT) AS sxx
          FROM pts)
        SELECT n AS n_points, total_tokens, total_vocab,
               CAST(floor(CAST(n*sxy - sx*sy AS DOUBLE)
                 / CAST(n*sxx - sx*sx AS DOUBLE) * 1000) AS BIGINT)
                 AS beta_milli,
               CAST(floor((CAST(sy AS DOUBLE) - CAST(n*sxy - sx*sy AS DOUBLE)
                 / CAST(n*sxx - sx*sx AS DOUBLE) * sx) / n / 1000) AS BIGINT)
                 AS alpha_milli
        FROM c, tail WHERE n > 1 AND n*sxx > sx*sx""")),

    // --------------------------------------------------------------- q527
    QDef("q527_cochran_armitage",
      (s, dir) => {
        t(s, dir, "orders")
          .selectExpr(
            "CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS dose",
            "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y")
          .agg(count(lit(1)).as("n"),
            sum("y").cast("long").as("r"),
            sum(expr("dose * y")).cast("long").as("str"),
            sum("dose").cast("long").as("stn"),
            sum(expr("dose * dose")).cast("long").as("sttn"))
          .where(expr("n > 1 AND r > 0 AND r < n AND n*sttn > stn*stn"))
          .selectExpr("n", "r",
            "n*str - r*stn AS u_stat",
            "n*sttn - stn*stn AS sxx18")
          .selectExpr("n", "r", "u_stat",
            """CAST(floor(CAST(u_stat AS DOUBLE)
                 / sqrt(CAST(r AS DOUBLE) * (n - r) * sxx18 / n) * 1000)
                 AS BIGINT) AS z_milli""")
      },
      Some("""
        WITH o AS (
          SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS dose,
                 CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
          FROM orders),
        c AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(y) AS BIGINT) AS r,
                 CAST(sum(dose * y) AS BIGINT) AS str,
                 CAST(sum(dose) AS BIGINT) AS stn,
                 CAST(sum(dose * dose) AS BIGINT) AS sttn
          FROM o),
        v AS (
          SELECT n, r, n*str - r*stn AS u_stat, n*sttn - stn*stn AS sxx18
          FROM c WHERE n > 1 AND r > 0 AND r < n AND n*sttn > stn*stn)
        SELECT n, r, u_stat,
               CAST(floor(CAST(u_stat AS DOUBLE)
                 / sqrt(CAST(r AS DOUBLE) * (n - r) * sxx18 / n) * 1000)
                 AS BIGINT) AS z_milli
        FROM v""")),

    // --------------------------------------------------------------- q528
    QDef("q528_nn_route",
      (s, dir) => {
        import s.implicits._
        val cent = t(s, dir, "customer")
          .selectExpr("c_nationkey AS nationkey",
            "CAST((c_custkey * 37) % 1000 AS BIGINT) DIV 25 AS x",
            "CAST((c_custkey * 61) % 800 AS BIGINT) DIV 25 AS y")
          .groupBy("nationkey").agg(
            sum("x").cast("long").as("sx"), sum("y").cast("long").as("sy"),
            count(lit(1)).as("nc"))
          .selectExpr("nationkey", "sx * 1000 DIV nc AS cx",
            "sy * 1000 DIV nc AS cy")
          .as[NnNode]
        cent.coalesce(1).sortWithinPartitions("nationkey")
          .mapPartitions { it =>
            val nodes = it.toArray
            if (nodes.isEmpty) Iterator.empty
            else {
              val visited = scala.collection.mutable.Set[Long]()
              var cur = nodes.head // smallest nationkey
              visited += cur.nationkey
              var cum = 0L
              val out = scala.collection.mutable.ArrayBuffer(
                NnOut(0L, cur.nationkey, 0L, 0L))
              var step = 1L
              while (visited.size < nodes.length) {
                var best: NnNode = null; var bestD = Long.MaxValue
                nodes.foreach { nd =>
                  if (!visited(nd.nationkey)) {
                    val d = (nd.cx - cur.cx) * (nd.cx - cur.cx) +
                      (nd.cy - cur.cy) * (nd.cy - cur.cy)
                    if (d < bestD) { bestD = d; best = nd }
                  }
                }
                cum += bestD
                out += NnOut(step, best.nationkey, bestD, cum)
                visited += best.nationkey; cur = best; step += 1
              }
              out.iterator
            }
          }
          .toDF()
          .orderBy("step")
      },
      Some("""
        WITH RECURSIVE cent AS (
          SELECT c_nationkey AS nationkey,
                 CAST(sum(CAST((c_custkey * 37) % 1000 AS BIGINT) // 25)
                   AS BIGINT) * 1000
                   // CAST(count(*) AS BIGINT) AS cx,
                 CAST(sum(CAST((c_custkey * 61) % 800 AS BIGINT) // 25)
                   AS BIGINT) * 1000
                   // CAST(count(*) AS BIGINT) AS cy
          FROM customer GROUP BY 1),
        idx AS (SELECT nationkey, cx, cy,
                       row_number() OVER (ORDER BY nationkey) AS k
                FROM cent),
        lists AS (
          SELECT list(nationkey ORDER BY k) AS ids,
                 list(cx ORDER BY k) AS xs, list(cy ORDER BY k) AS ys,
                 CAST(count(*) AS BIGINT) AS m
          FROM idx),
        rec AS (
          SELECT CAST(0 AS BIGINT) AS step, CAST(1 AS BIGINT) AS cur,
                 [CAST(1 AS BIGINT)] AS visited,
                 CAST(0 AS BIGINT) AS leg, CAST(0 AS BIGINT) AS cum
          FROM lists WHERE m >= 1
          UNION ALL
          SELECT step + 1, bi, list_append(visited, bi), d, cum + d
          FROM (
            SELECT q.step, q.visited, q.cum,
                   CAST(list_position(q.dists, list_min(q.dists))
                     AS BIGINT) AS bi,
                   list_min(q.dists) AS d
            FROM (
              SELECT r.step, r.visited, r.cum,
                     list_transform(range(1, l.m + 1), k ->
                       CASE WHEN list_contains(r.visited, k) THEN NULL
                         ELSE (l.xs[k] - l.xs[r.cur]) * (l.xs[k] - l.xs[r.cur])
                            + (l.ys[k] - l.ys[r.cur]) * (l.ys[k] - l.ys[r.cur])
                       END) AS dists
              FROM rec r, lists l
              WHERE r.step < l.m - 1) q
            WHERE list_position(q.dists, list_min(q.dists)) IS NOT NULL) z)
        SELECT r.step, l.ids[r.cur] AS nationkey, r.leg AS leg_dist2,
               r.cum AS cum_dist2
        FROM rec r, lists l
        ORDER BY r.step""")),

    // --------------------------------------------------------------- q529
    QDef("q529_kneser_ney",
      (s, dir) => {
        val ex = t(s, dir, "documents")
          .withColumn("w", words(col("text")))
          .filter(size(col("w")) >= 2)
          .select(col("w"), explode(sequence(lit(0), size(col("w")) - 2)).as("i"))
          .select(expr("w[i]").as("w1"), expr("w[i+1]").as("w2"))
        val big = ex.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
        big.cache(); big.count()
        val ctx = big.groupBy("w1").agg(
          sum("c2").cast("long").as("c1"), count(lit(1)).as("n1f"))
        val cont = big.groupBy("w2").agg(count(lit(1)).as("n1b"))
        val nb = big.agg(count(lit(1)).as("nbig"))
        big.join(ctx, "w1").join(cont, "w2").crossJoin(broadcast(nb))
          .selectExpr("w1", "w2", "c2", "c1", "n1f", "n1b",
            """((4*c2 - 3) * nbig + 3 * n1f * n1b) * 1000000
               DIV (4 * c1 * nbig) AS p_ppm""")
          .orderBy(col("c2").desc, col("w1"), col("w2"))
          .limit(25)
      },
      Some(s"""
        WITH d AS (SELECT ${wordsSql("text")} AS w FROM documents),
        ex AS (SELECT w[i] AS w1, w[i + 1] AS w2
               FROM d, unnest(range(1, len(w))) AS t(i)
               WHERE len(w) >= 2),
        big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
                FROM ex GROUP BY 1, 2),
        ctx AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1,
                       CAST(count(*) AS BIGINT) AS n1f
                FROM big GROUP BY 1),
        cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1b
                 FROM big GROUP BY 1),
        nb AS (SELECT CAST(count(*) AS BIGINT) AS nbig FROM big)
        SELECT b.w1 AS w1, b.w2 AS w2, c2, c1, n1f, n1b,
               ((4*c2 - 3) * nbig + 3 * n1f * n1b) * 1000000
                 // (4 * c1 * nbig) AS p_ppm
        FROM big b JOIN ctx x ON b.w1 = x.w1
        JOIN cont c ON b.w2 = c.w2, nb
        ORDER BY c2 DESC, w1, w2
        LIMIT 25"""))
  )
}
