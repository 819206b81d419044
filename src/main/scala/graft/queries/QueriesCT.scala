package graft.queries

import graft.Tables.t
import graft.functions.{PortableHash, TextFunctions, VectorOps}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 91 — dimensionality reduction,
  * auction economics, phonetic blocking, graph cohesion:
  *
  *  - q387: Johnson–Lindenstrauss distance preservation — 64-dim float
  *    embeddings projected onto 16 deterministic ±1 hyperplanes (pure
  *    integer key arithmetic, same literals in both engines); squared
  *    pairwise distances before/after over a hash-sampled vector subset,
  *    distortion ratio stats in floor-micro. The sample-then-pair shape
  *    (sample VECTORS, not pairs) is the 100 TB path: candidate pairs
  *    grow quadratically only inside the fixed-size sample.
  *  - q388: second-price auction clearing — (day, key) cells as
  *    auctions, rank bids, first- vs second-price daily revenue and
  *    ratio; the ad-exchange revenue simulation (exact cents).
  *  - q389: phonetic blocking — a soundex-style key (single translate
  *    through the letter→digit map, run-collapse without regex
  *    backreferences — RE2 has none — then vowel-marker removal) over
  *    the document vocabulary; top keys by colliding distinct words.
  *    The entity-resolution blocking partitioner (pairs with q214).
  *  - q390: k-truss support — triangle support per co-purchase edge
  *    (parts bought together ≥2 times), support histogram + 3/4-truss
  *    edge survival. Support via three-role union over one triangle
  *    enumeration (edges thresholded first so the wedge join stays
  *    small at scale).
  *
  * Reference analog: embedding-based listing similarity at reduced
  * cost, booking-quote competition, fuzzy host/listing-name blocking,
  * cohesive listing clusters in co-review graphs.
  */
object QueriesCT extends QueryPack {
  import Q._

  /** JL sign in {−1,+1} from pure key arithmetic (emitted as literals). */
  private def jlSign(j: Int, i: Int): Int = ((j * 97 + i * 61) % 2) * 2 - 1
  private val JlK = 16
  private val Dim = 64

  /** Σ_j (paj − pbj)², left-assoc + so both engines sum in one order. */
  private val YDist2: String = (0 until JlK)
    .map(j => s"(pa$j - pb$j) * (pa$j - pb$j)").mkString(" + ")

  /** Soundex-style key; `ext` spells each dialect's regexp_replace. */
  private def phoneticSql(word: String,
      rr: (String, String, String) => String): String = {
    val digits = s"translate(upper($word), " +
      "'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '01230120022455012623010202')"
    val collapsed = (0 to 6).foldLeft(digits)((acc, k) => rr(acc, s"$k+", s"$k"))
    s"substr(substr(upper($word), 1, 1) || " +
      s"replace(substr($collapsed, 2), '0', '') || '000', 1, 4)"
  }
  private val phoneticSpark =
    phoneticSql("word", (s, p, r) => s"regexp_replace($s, '$p', '$r')")
  private val phoneticDuck =
    phoneticSql("word", (s, p, r) => s"regexp_replace($s, '$p', '$r', 'g')")

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q387
    QDef("q387_jl_distortion",
      (s, dir) => {
        val projCols = (0 until JlK).map(j =>
          VectorOps.dotLit("embedding", (0 until Dim).map(i => jlSign(j, i)))
            .as(s"p$j"))
        val base = t(s, dir, "embeddings")
          .where(PortableHash.md5Long(col("vec_id"), salt = "jl~") % 97 === 0)
          .select(Seq(col("vec_id"), col("embedding"),
            VectorOps.dot("embedding", "embedding").as("n2")) ++ projCols: _*)
        val a = base.toDF(base.columns.map(c =>
          if (c == "vec_id") "ia" else if (c == "embedding") "va"
          else if (c == "n2") "na2" else c.replace("p", "pa")): _*)
        val b = base.toDF(base.columns.map(c =>
          if (c == "vec_id") "ib" else if (c == "embedding") "vb"
          else if (c == "n2") "nb2" else c.replace("p", "pb")): _*)
        val pairs = a.join(b, col("ia") < col("ib"))
          .withColumn("xd2",
            col("na2") + col("nb2") - lit(2.0) * VectorOps.dot("va", "vb"))
          .where(col("xd2") > 0.0)
          .selectExpr(
            s"CAST(floor(($YDist2) / (16.0 * xd2) * 1000000) AS BIGINT)" +
              " AS ratio_micro")
        pairs.agg(
          count(lit(1)).as("n_pairs"),
          min("ratio_micro").as("min_ratio_micro"),
          max("ratio_micro").as("max_ratio_micro"),
          expr("CAST(sum(ratio_micro) DIV count(*) AS BIGINT)")
            .as("mean_ratio_micro"),
          expr("CAST(sum(CASE WHEN ratio_micro BETWEEN 700000 AND 1300000" +
            " THEN 1 ELSE 0 END) * 10000 DIV count(*) AS BIGINT)")
            .as("within_30pct_bp"))
      },
      Some {
        val h = PortableHash.md5LongSql("CAST(vec_id AS VARCHAR)", salt = "jl~")
        val projs = (0 until JlK).map(j =>
          s"${VectorOps.dotLitSql("embedding",
            (0 until Dim).map(i => jlSign(j, i)))} AS p$j").mkString(", ")
        val renameA = (0 until JlK).map(j => s"p$j AS pa$j").mkString(", ")
        val renameB = (0 until JlK).map(j => s"p$j AS pb$j").mkString(", ")
        s"""
        WITH base AS (
          SELECT vec_id, embedding,
                 ${VectorOps.dotSql("embedding", "embedding")} AS n2, $projs
          FROM embeddings WHERE $h % 97 = 0),
        pairs AS (
          SELECT a.n2 + b.n2
                   - 2.0 * ${VectorOps.dotSql("a.embedding", "b.embedding")}
                   AS xd2,
                 ${(0 until JlK).map(j =>
                   s"a.p$j AS pa$j, b.p$j AS pb$j").mkString(", ")}
          FROM base a JOIN base b ON a.vec_id < b.vec_id),
        ratios AS (
          SELECT CAST(floor(($YDist2) / (16.0 * xd2) * 1000000) AS BIGINT)
                   AS ratio_micro
          FROM pairs WHERE xd2 > 0.0)
        SELECT count(*) AS n_pairs,
               min(ratio_micro) AS min_ratio_micro,
               max(ratio_micro) AS max_ratio_micro,
               CAST(sum(ratio_micro) // count(*) AS BIGINT)
                 AS mean_ratio_micro,
               CAST(sum(CASE WHEN ratio_micro BETWEEN 700000 AND 1300000
                 THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT)
                 AS within_30pct_bp
        FROM ratios"""
      }),

    // --------------------------------------------------------------- q388
    QDef("q388_second_price",
      (s, dir) => {
        val bids = t(s, dir, "events").where(col("value").isNotNull)
          .selectExpr("event_id", s"($tsMs) DIV 86400000 AS d",
            "CAST(get_json_object(props, '$.k') AS BIGINT) AS kb",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents")
        val rk = Window.partitionBy("d", "kb")
          .orderBy(col("cents").desc, col("event_id"))
        val auctions = bids.withColumn("rk", row_number().over(rk))
          .groupBy("d", "kb")
          .agg(count(lit(1)).as("n_bids"),
            max(when(col("rk") === 1, col("cents"))).as("p1"),
            max(when(col("rk") === 2, col("cents"))).as("p2"))
          .where(col("n_bids") >= 2)
        auctions.groupBy("d")
          .agg(count(lit(1)).as("n_auctions"),
            sum("p1").cast("bigint").as("rev_first_cents"),
            sum("p2").cast("bigint").as("rev_second_cents"))
          .selectExpr("d", "n_auctions", "rev_first_cents",
            "rev_second_cents",
            "rev_second_cents * 10000 DIV rev_first_cents AS ratio_bp")
          .orderBy("d")
      },
      Some("""
        WITH bids AS (
          SELECT event_id, epoch_ms(ts) // 86400000 AS d,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) AS kb,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events WHERE value IS NOT NULL),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY d, kb
                   ORDER BY cents DESC, event_id) AS rk
          FROM bids),
        auctions AS (
          SELECT d, kb, count(*) AS n_bids,
                 max(CASE WHEN rk = 1 THEN cents END) AS p1,
                 max(CASE WHEN rk = 2 THEN cents END) AS p2
          FROM ranked GROUP BY 1, 2 HAVING count(*) >= 2)
        SELECT d, count(*) AS n_auctions,
               CAST(sum(p1) AS BIGINT) AS rev_first_cents,
               CAST(sum(p2) AS BIGINT) AS rev_second_cents,
               CAST(sum(p2) AS BIGINT) * 10000 // CAST(sum(p1) AS BIGINT)
                 AS ratio_bp
        FROM auctions GROUP BY 1 ORDER BY d""")),

    // --------------------------------------------------------------- q389
    QDef("q389_phonetic_block",
      (s, dir) => {
        // census-first (r11, the q383 recipe): the phonetic key is a pure
        // function of the word, so the regexp_replace chain runs once per
        // DISTINCT word (vocab-bounded) instead of once per occurrence,
        // and countDistinct(word) collapses to a plain count over the
        // already-unique census rows. Occurrences partially aggregate
        // map-side before the only wide exchange.
        val census = t(s, dir, "documents")
          .select(explode(TextFunctions.words(col("text"))).as("word"))
          .where(length(col("word")) >= 2)
          .groupBy("word").agg(count(lit(1)).as("cnt"))
        census.selectExpr("word", "cnt", s"$phoneticSpark AS pkey")
          .groupBy("pkey")
          .agg(count(lit(1)).as("n_words"),
            sum("cnt").cast("bigint").as("n_occ"),
            min("word").as("first_word"), max("word").as("last_word"))
          .orderBy(col("n_words").desc, col("pkey"))
          .limit(20)
      },
      Some(s"""
        WITH words AS (
          SELECT word FROM (
            SELECT unnest(${TextFunctions.wordsSql("text")}) AS word
            FROM documents) WHERE length(word) >= 2),
        keyed AS (SELECT word, $phoneticDuck AS pkey FROM words)
        SELECT pkey, count(DISTINCT word) AS n_words, count(*) AS n_occ,
               min(word) AS first_word, max(word) AS last_word
        FROM keyed GROUP BY 1
        ORDER BY n_words DESC, pkey LIMIT 20""")),

    // --------------------------------------------------------------- q390
    QDef("q390_ktruss_support",
      (s, dir) => {
        // basket-array pair build (q140 pattern): one collect_set shuffle,
        // pairs map-side from the ≤7-part sorted basket; and e CACHED —
        // the r9 form recomputed the whole distinct+self-join+groupBy
        // pipeline for each of its FOUR references (12.6s at sf1)
        val e = t(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
          .select(explode(expr(
            """flatten(transform(ps, (x, i) ->
               transform(slice(ps, i + 2, size(ps)), y -> struct(x AS pa, y AS pb))))"""))
            .as("pr"))
          .select(col("pr.pa").as("pa"), col("pr.pb").as("pb"))
          .groupBy("pa", "pb")
          .agg(count(lit(1)).as("c")).where(col("c") >= 2)
          .select("pa", "pb")
          .cache()
        val nEdges = e.count() // eager: e1/e2/e3 and the support join all read it
        // r11-advice gate: the driver loop enumerates oriented a→b→c
        // paths (wedge-bounded work, not edge-bounded), so a dense census
        // under the 2M-edge gate must still fall back to the distributed
        // self-joins — compute the wedge bound from the degree census
        // before entering the loop (same gate as q185).
        val driverHalf = if (nEdges <= 2000000L)
          Some(e.collect().map(r => (r.getLong(0), r.getLong(1))))
        else None
        val driverWedges = driverHalf.map { half =>
          (half.map(_._1) ++ half.map(_._2))
            .groupMapReduce(identity)(_ => 1L)(_ + _)
            .valuesIterator.map(d => d * (d - 1) / 2).sum
        }
        if (driverWedges.exists(_ <= 100000000L)) {
          // dual-path (the q457/q225 recipe, r11): triangle enumeration,
          // per-edge support, the bucket rollup and the truss summary all
          // run driver-side over the collected repeat-pair census — one
          // job instead of the 2 triangle self-joins + support join +
          // rollup. Edges are oriented pa<pb by the sorted-basket build,
          // so each triangle a<b<c is found exactly once, as in the
          // e1⋈e2⋈e3 frames below.
          val half = driverHalf.get
          val eset = half.toSet
          val byA = half.groupMap(_._1)(_._2)
          val sup = scala.collection.mutable.HashMap
            .empty[(Long, Long), Long].withDefaultValue(0L)
          for ((a, b) <- half;
               c <- byA.getOrElse(b, Array.empty[Long]) if eset((a, c))) {
            sup((a, b)) += 1; sup((b, c)) += 1; sup((a, c)) += 1
          }
          val sups = half.map(p => sup(p))
          val t3 = sups.count(_ >= 1).toLong
          val t4 = sups.count(_ >= 2).toLong
          val sc2 = s
          import sc2.implicits._
          sups.groupMapReduce(v => math.min(v, 5L))(_ => 1L)(_ + _)
            .toSeq.sortBy(_._1)
            .map { case (bk, n) => (bk, n, t3, t4) }
            .toDF("support_bucket", "n_edges", "truss3_edges", "truss4_edges")
        } else {
        val e1 = e.selectExpr("pa AS a", "pb AS b")
        val e2 = e.selectExpr("pa AS b", "pb AS c2")
        val e3 = e.selectExpr("pa AS a", "pb AS c2")
        val tri = e1.join(e2, Seq("b")).join(e3, Seq("a", "c2"))
        val roles = tri.selectExpr("a AS x", "b AS y")
          .unionAll(tri.selectExpr("b AS x", "c2 AS y"))
          .unionAll(tri.selectExpr("a AS x", "c2 AS y"))
        val support = e.join(
          roles.groupBy(col("x").as("pa"), col("y").as("pb"))
            .agg(count(lit(1)).as("sup")),
          Seq("pa", "pb"), "left")
          .withColumn("sup", coalesce(col("sup"), lit(0L)))
          .cache()
        support.count() // eager: bucket rollup + the truss summary
        support
          .selectExpr("least(sup, 5) AS support_bucket")
          .groupBy("support_bucket").agg(count(lit(1)).as("n_edges"))
          .crossJoin(broadcast(support.agg(
            sum(when(col("sup") >= 1, 1L).otherwise(0L))
              .cast("bigint").as("truss3_edges"),
            sum(when(col("sup") >= 2, 1L).otherwise(0L))
              .cast("bigint").as("truss4_edges"))))
          .selectExpr("support_bucket", "n_edges", "truss3_edges",
            "truss4_edges")
          .orderBy("support_bucket")
        }
      },
      Some("""
        WITH li AS (
          SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e AS (
          SELECT a.l_partkey AS pa, b.l_partkey AS pb
          FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
            AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= 2),
        tri AS (
          SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c2
          FROM e e1 JOIN e e2 ON e1.pb = e2.pa
          JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb),
        roles AS (
          SELECT a AS x, b AS y FROM tri
          UNION ALL SELECT b, c2 FROM tri
          UNION ALL SELECT a, c2 FROM tri),
        support AS (
          SELECT e.pa, e.pb, coalesce(r.sup, 0) AS sup
          FROM e LEFT JOIN (
            SELECT x AS pa, y AS pb, count(*) AS sup
            FROM roles GROUP BY 1, 2) r USING (pa, pb)),
        summary AS (
          SELECT CAST(sum(CASE WHEN sup >= 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS truss3_edges,
                 CAST(sum(CASE WHEN sup >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS truss4_edges
          FROM support)
        SELECT least(sup, 5) AS support_bucket, count(*) AS n_edges,
               truss3_edges, truss4_edges
        FROM support CROSS JOIN summary
        GROUP BY 1, 3, 4 ORDER BY support_bucket"""))
  )
}
