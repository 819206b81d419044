package graft.queries

import graft.Tables.t
import graft.functions.{PortableHash, TextFunctions}
import graft.geo.SyntheticGeo
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 2:
  *
  *  - §2E text: C4-style segment-level dedup (q58) and Gopher repetition
  *    signals (q59) — the two standard pre-training corpus filters the
  *    earlier doc-level queries don't cover.
  *  - §2B geospatial: TRUE point-in-polygon via ray casting (q83) — the
  *    reference's AOIs are multipolygons (`AOIShape.geom`), not bboxes;
  *    q20/q25 cover the bbox fast path, this covers the exact predicate
  *    (`managers.py:200` `for_purpose` ST_Contains).
  *  - §2A relational: deterministic stratified sampling by portable-hash
  *    range with per-stratum rates (q86) and incremental partial-aggregate
  *    merge old+delta == full (q87), the nightly-ETL reuse pattern.
  *
  * All outputs follow SURVEY §4's OUTPUT-TYPE RULE.
  */
object QueriesI extends QueryPack {
  import Q._

  private val wSql = TextFunctions.wordsSql("text")

  def defs: Seq[QDef] = Seq(
    // ---------------------------------------------------------------- q58
    // Segment-level exact dedup (C4/RefinedWeb line-dedup shape, applied
    // to fixed 5-word segments since the corpus has no newlines): chunk →
    // ONE hash-aggregate on the segment → duplicated segments report. At
    // 100 TB this is a single shuffle on the segment key (or its 64-bit
    // hash — the string key is kept here for a readable report).
    QDef("q58_segment_dedup",
      (s, dir) => {
        val segs = t(s, dir, "documents")
          .withColumn("w", TextFunctions.words(col("text")))
          .filter(size(col("w")) >= 5)
          .select(col("doc_id"), col("w"),
            explode(expr("sequence(0, size(w) DIV 5 - 1)")).as("i"))
          .select(col("doc_id"),
            concat_ws(" ", (0 until 5).map(j => expr(s"w[i*5 + $j]")): _*).as("seg"))
        segs.groupBy("seg")
          .agg(count(lit(1)).as("n_occ"),
            countDistinct(col("doc_id")).as("n_docs"),
            min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
          .filter(col("n_occ") > 1)
          .orderBy(col("n_occ").desc, col("seg"))
          .limit(25)
      },
      Some(s"""
        WITH d AS (SELECT doc_id, $wSql AS w FROM documents),
        segs AS (
          SELECT doc_id,
                 concat_ws(' ', w[i*5+1], w[i*5+2], w[i*5+3], w[i*5+4], w[i*5+5]) AS seg
          FROM d, unnest(range(0, len(w) // 5)) AS tt(i)
          WHERE len(w) >= 5)
        SELECT seg, count(*) AS n_occ,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM segs
        GROUP BY seg HAVING count(*) > 1
        ORDER BY n_occ DESC, seg
        LIMIT 25""")),

    // ---------------------------------------------------------------- q59
    // Gopher-style repetition signals per document: duplicate-word
    // fraction, most-frequent-word fraction, top-bigram fraction,
    // duplicate-trigram fraction — all integer basis points. Shape at
    // scale: one explode per n-gram order feeding two-level hash
    // aggregation (partial combine on (doc, gram), then per-doc rollup);
    // no array is ever exploded (positions are), no driver collection.
    QDef("q59_repetition",
      (s, dir) => {
        val base = t(s, dir, "documents")
          .select(col("doc_id"), TextFunctions.words(col("text")).as("w"))
          .filter(size(col("w")) > 0)

        def gramStats(n: Int, pfx: String): DataFrame = {
          val withPos = base.filter(size(col("w")) >= n)
            .select(col("doc_id"), col("w"),
              explode(sequence(lit(0), size(col("w")) - n)).as("i"))
            .select(col("doc_id"),
              concat_ws(" ", (0 until n).map(j => expr(s"w[i + $j]")): _*).as("g"))
          withPos.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
            .groupBy("doc_id")
            .agg(sum(col("c")).cast("bigint").as(s"${pfx}_total"),
              count(lit(1)).as(s"${pfx}_distinct"),
              max(col("c")).cast("bigint").as(s"${pfx}_top"))
        }

        gramStats(1, "w")
          .join(gramStats(2, "bi"), Seq("doc_id"), "left_outer")
          .join(gramStats(3, "tri"), Seq("doc_id"), "left_outer")
          .select(col("doc_id"), col("w_total").as("n_words"),
            expr("(w_total - w_distinct) * 10000 DIV w_total").as("dup_word_bp"),
            expr("w_top * 10000 DIV w_total").as("top_word_bp"),
            coalesce(expr("bi_top * 10000 DIV bi_total"), lit(0L)).as("top_bigram_bp"),
            coalesce(expr("(tri_total - tri_distinct) * 10000 DIV tri_total"), lit(0L))
              .as("dup_trigram_bp"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH d AS (SELECT doc_id, $wSql AS w FROM documents),
        base AS (SELECT doc_id, w FROM d WHERE len(w) > 0),
        w1 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS w_total,
                      count(*) AS w_distinct, CAST(max(c) AS BIGINT) AS w_top
               FROM (SELECT doc_id, g, count(*) AS c
                     FROM (SELECT doc_id, unnest(w) AS g FROM base) GROUP BY 1, 2)
               GROUP BY 1),
        w2 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS bi_total,
                      CAST(max(c) AS BIGINT) AS bi_top
               FROM (SELECT doc_id, g, count(*) AS c
                     FROM (SELECT doc_id, unnest(${TextFunctions.wordNgramsSql("w", 2)}) AS g
                           FROM base WHERE len(w) >= 2) GROUP BY 1, 2)
               GROUP BY 1),
        w3 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS tri_total,
                      count(*) AS tri_distinct
               FROM (SELECT doc_id, g, count(*) AS c
                     FROM (SELECT doc_id, unnest(${TextFunctions.wordNgramsSql("w", 3)}) AS g
                           FROM base WHERE len(w) >= 3) GROUP BY 1, 2)
               GROUP BY 1)
        SELECT w1.doc_id AS doc_id, w_total AS n_words,
               (w_total - w_distinct) * 10000 // w_total AS dup_word_bp,
               w_top * 10000 // w_total AS top_word_bp,
               CAST(coalesce(bi_top * 10000 // bi_total, 0) AS BIGINT) AS top_bigram_bp,
               CAST(coalesce((tri_total - tri_distinct) * 10000 // tri_total, 0) AS BIGINT)
                 AS dup_trigram_bp
        FROM w1 LEFT JOIN w2 ON w1.doc_id = w2.doc_id
                LEFT JOIN w3 ON w1.doc_id = w3.doc_id
        ORDER BY doc_id""")),

    // ---------------------------------------------------------------- q83
    // TRUE point-in-polygon via ray casting (ST_Contains, managers.py:200):
    // per-region convex pentagon with integer-offset vertices (exact
    // doubles, no trig — cross-engine bit-identical), points from the
    // synthetic geography. A rightward ray from the point crosses edge
    // (x1,y1)-(x2,y2) iff the edge straddles the point's latitude and the
    // intersection lies to the right; odd crossing count = inside. The
    // edge table is |regions|×5 rows → broadcast: points never shuffle
    // until the final tiny per-region rollup.
    QDef("q83_point_in_polygon",
      (s, dir) => {
        val offs = Seq((-30, -40, 20, -35), (20, -35, 32, 10), (32, 10, 5, 45),
          (5, 45, -25, 20), (-25, 20, -30, -40))
        import s.implicits._
        val offsDf = offs.toDF("dx1", "dy1", "dx2", "dy2")
        val edges = t(s, dir, "region")
          .select(col("r_regionkey"), col("r_name"),
            (col("r_regionkey") * 72 - 144).cast("double").as("cx"))
          .crossJoin(offsDf)
          .select(col("r_regionkey"), col("r_name"),
            (col("cx") + col("dx1")).as("x1"), col("dy1").cast("double").as("y1"),
            (col("cx") + col("dx2")).as("x2"), col("dy2").cast("double").as("y2"))
        val pts = t(s, dir, "events")
          .withColumn("lng", SyntheticGeo.lng).withColumn("lat", SyntheticGeo.lat)
        val crossings = pts.join(broadcast(edges),
            ((col("y1") > col("lat")) =!= (col("y2") > col("lat"))) &&
              col("lng") < col("x1") +
                (col("lat") - col("y1")) * (col("x2") - col("x1")) / (col("y2") - col("y1")))
          .groupBy("event_id", "r_regionkey", "r_name")
          .agg(count(lit(1)).as("n_cross"), first(col("value")).as("value"))
          .filter(col("n_cross") % 2 === 1)
        crossings.groupBy("r_name")
          .agg(count(lit(1)).as("n_inside"), dec38(sum(dec(col("value")))).as("sum_value"))
          .orderBy("r_name")
      },
      Some {
        val offsValues = Seq((-30, -40, 20, -35), (20, -35, 32, 10), (32, 10, 5, 45),
          (5, 45, -25, 20), (-25, 20, -30, -40))
          .map { case (ax, ay, bx, by) => s"($ax, $ay, $bx, $by)" }.mkString(", ")
        s"""
        WITH offs(dx1, dy1, dx2, dy2) AS (VALUES $offsValues),
        edges AS (
          SELECT r_regionkey, r_name,
                 CAST(r_regionkey*72 - 144 AS DOUBLE) + dx1 AS x1, CAST(dy1 AS DOUBLE) AS y1,
                 CAST(r_regionkey*72 - 144 AS DOUBLE) + dx2 AS x2, CAST(dy2 AS DOUBLE) AS y2
          FROM region CROSS JOIN offs),
        p AS (SELECT event_id, value, ${SyntheticGeo.lngSql} AS lng, ${SyntheticGeo.latSql} AS lat
              FROM events),
        inside AS (
          SELECT event_id, r_regionkey, r_name, any_value(value) AS value,
                 count(*) AS n_cross
          FROM p JOIN edges
            ON ((y1 > lat) <> (y2 > lat))
           AND lng < x1 + (lat - y1) * (x2 - x1) / (y2 - y1)
          GROUP BY 1, 2, 3
          HAVING count(*) % 2 = 1)
        SELECT r_name, count(*) AS n_inside,
               CAST(sum(CAST(value AS $decSql)) AS $dec38Sql) AS sum_value
        FROM inside
        GROUP BY r_name
        ORDER BY r_name"""
      }),

    // ---------------------------------------------------------------- q86
    // Deterministic stratified sampling: per-stratum rates applied as a
    // portable-hash range test on the row key — reproducible on any
    // cluster layout (no RNG, no partition dependence), the sampling
    // primitive behind q55's split. Filter is a pure row-local predicate:
    // full scan, zero shuffle before the tiny per-stratum rollup.
    QDef("q86_stratified_sample",
      (s, dir) => {
        val rate = expr(
          "CASE l_returnflag WHEN 'A' THEN 1000 WHEN 'N' THEN 500 ELSE 2500 END")
        t(s, dir, "lineitem")
          .withColumn("h",
            pmod(PortableHash.md5Long(
              concat_ws("~", col("l_orderkey"), col("l_linenumber")), salt = "strat~"),
              lit(10000L)))
          .withColumn("sampled", (col("h") < rate).cast("int"))
          .groupBy(col("l_returnflag").as("stratum"))
          .agg(count(lit(1)).as("n_total"),
            sum(col("sampled")).cast("bigint").as("n_sample"),
            dec38(sum(when(col("sampled") === 1, dec(col("l_quantity")))
              .otherwise(lit(null)))).as("sum_qty_sample"))
          .withColumn("achieved_bp", expr("n_sample * 10000 DIV n_total"))
          .orderBy("stratum")
      },
      Some(s"""
        WITH l AS (
          SELECT l_returnflag, l_quantity,
                 ${PortableHash.md5LongSql("l_orderkey || '~' || l_linenumber", salt = "strat~")}
                   % 10000 AS h,
                 CASE l_returnflag WHEN 'A' THEN 1000 WHEN 'N' THEN 500 ELSE 2500 END AS rate
          FROM lineitem)
        SELECT l_returnflag AS stratum, count(*) AS n_total,
               CAST(count(CASE WHEN h < rate THEN 1 END) AS BIGINT) AS n_sample,
               CAST(sum(CASE WHEN h < rate THEN CAST(l_quantity AS $decSql) END) AS $dec38Sql)
                 AS sum_qty_sample,
               count(CASE WHEN h < rate THEN 1 END) * 10000 // count(*) AS achieved_bp
        FROM l
        GROUP BY 1
        ORDER BY stratum""")),

    // ---------------------------------------------------------------- q87
    // Incremental aggregation: partial aggregates for the OLD epoch and
    // the DELTA epoch merge by re-aggregation into exactly the full-scan
    // result (counts add; decimal sums add exactly) — the nightly-ETL
    // pattern where yesterday's rollup is reused instead of rescanned.
    // At 100 TB only the delta partition is read per refresh; the proof
    // column pins merged == full on the oracle side too.
    QDef("q87_incremental_agg",
      (s, dir) => {
        val o = t(s, dir, "orders")
        def part(pred: org.apache.spark.sql.Column, pfx: String): DataFrame =
          o.filter(pred).groupBy(col("o_orderpriority").as("priority"))
            .agg(count(lit(1)).as(s"${pfx}_n"),
              sum(dec(col("o_totalprice"))).as(s"${pfx}_sum"))
        val old = part(col("o_orderdate") < "1997-01-01", "old")
        val delta = part(col("o_orderdate") >= "1997-01-01", "delta")
        val full = o.groupBy(col("o_orderpriority").as("priority"))
          .agg(count(lit(1)).as("full_n"), sum(dec(col("o_totalprice"))).as("full_sum"))
        old.join(delta, Seq("priority"), "full_outer")
          .select(col("priority"),
            (coalesce(col("old_n"), lit(0L)) + coalesce(col("delta_n"), lit(0L)))
              .as("merged_n"),
            (coalesce(col("old_sum"), dec(lit(0))) + coalesce(col("delta_sum"), dec(lit(0))))
              .as("merged_sum"))
          .join(full, "priority")
          .select(col("priority"), col("merged_n"), dec38(col("merged_sum")).as("merged_sum"),
            (col("merged_n") === col("full_n") &&
              col("merged_sum") === col("full_sum")).as("matches_full"))
          .orderBy("priority")
      },
      Some(s"""
        WITH old AS (SELECT o_orderpriority AS priority, count(*) AS old_n,
                            sum(CAST(o_totalprice AS $decSql)) AS old_sum
                     FROM orders WHERE o_orderdate < DATE '1997-01-01' GROUP BY 1),
        delta AS (SELECT o_orderpriority AS priority, count(*) AS delta_n,
                         sum(CAST(o_totalprice AS $decSql)) AS delta_sum
                  FROM orders WHERE o_orderdate >= DATE '1997-01-01' GROUP BY 1),
        fullagg AS (SELECT o_orderpriority AS priority, count(*) AS full_n,
                        sum(CAST(o_totalprice AS $decSql)) AS full_sum
                 FROM orders GROUP BY 1),
        merged AS (
          SELECT coalesce(old.priority, delta.priority) AS priority,
                 coalesce(old_n, 0) + coalesce(delta_n, 0) AS merged_n,
                 coalesce(old_sum, 0) + coalesce(delta_sum, 0) AS merged_sum
          FROM old FULL OUTER JOIN delta ON old.priority = delta.priority)
        SELECT m.priority AS priority, CAST(merged_n AS BIGINT) AS merged_n,
               CAST(merged_sum AS $dec38Sql) AS merged_sum,
               (merged_n = full_n AND merged_sum = full_sum) AS matches_full
        FROM merged m JOIN fullagg f ON m.priority = f.priority
        ORDER BY priority"""))
  )
}
