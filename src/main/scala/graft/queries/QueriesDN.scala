package graft.queries

import graft.Tables.t
import graft.functions.PortableHash
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 111 — collaborative filtering,
  * ML-hygiene audits, storage-engine economics:
  *
  *  - q463: rank-1 ALS half-sweep — ratings r(customer, brand) = order
  *    counts; brand factors hash-initialized (milli), user factors
  *    solved in closed form u = Σrv / Σv² (exact BIGINT sums, one
  *    integer division), then the brand-side update v' = Σru / Σu² and
  *    exact fit error Σ(r·1e6 − u·v)² DIV 1e6 before/after, both read
  *    off ONE per-brand sufficient-statistics pass (Σr², Σru, Σu²) and
  *    finished driver-side in BigInt. Rank-1 ALS is power iteration on
  *    the rating matrix — each half-sweep is one groupBy per side, the
  *    distributed-CF shape (full-rank ALS adds a k×k solve per key,
  *    same shuffles).
  *  - q464: item-item collaborative filtering — brand-brand cosine
  *    n_ab/√(n_a·n_b) over distinct customer incidence (bounded brand
  *    domain ⇒ pair table is tiny even at 100 TB; the heavy lifting is
  *    the distinct-incidence aggregation), top-3 neighbors per brand.
  *  - q465: label-leakage audit — temporal split at T: "naive" features
  *    computed over ALL time vs leak-free features restricted to < T;
  *    users whose click features differ are exactly the
  *    leakage-contaminated rows. Per label class: contamination rate
  *    and mean feature inflation. The train-data hygiene gate beside
  *    q187 (contamination) and q220 (leakage-safe encoding).
  *  - q466: LSM write-amplification economics — per type, ingested
  *    payload bytes; levels from a decimal-digits capacity model,
  *    leveled WA×2 = 2 + 11·L vs tiered WA×2 = 2 + 2·L, projected
  *    bytes written per policy. The storage-planning table beside
  *    q136 (compaction) and q391 (bit packing).
  *
  * Reference analog: listing-recommendation factors, similar-listing
  * shelves, training-table leakage checks, response-store compaction
  * planning.
  */
object QueriesDN extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q463
    // Fit error decomposes per brand: with e = r·1e6 − u·v_b exact,
    // Σe² = 1e12·Σr² − 2e6·v_b·Σru + v_b²·Σu², so ONE groupBy(brand)
    // pass over ratings⋈users yields sufficient statistics
    // (Σr², Σru, Σu²) for v1, sse_before AND sse_after — the v-update
    // and both error sums finish driver-side in BigInt over the ≤|brand|
    // collected rows (r7 verdict #2/#4: was an eager count + 5 chained
    // agg/join jobs; r10 verdict #1 folded the v0-init job too — v is a
    // pure function of brand computed inline; r12 folded the user solve
    // into a per-cust basket aggregation, deleting the users⋈ratings
    // re-shuffle and the cache — ONE job, 3 exchanges, same shape you'd
    // run at 100 TB).
    QDef("q463_als_rank1",
      (s, dir) => {
        val sc = s
        import sc.implicits._
        // r12: the whole per-customer side — ratings r(cust, brand), the
        // hash-init factor v(brand), and the closed-form user solve — is
        // a reduction over that customer's ≤|brand| ratings, so fold it
        // ALL into ONE cust-keyed basket aggregation (collect_list +
        // array lambdas): the old plan's (cust, brand) pre-aggregation
        // and the users⋈ratings join-back re-shuffled the ratings table
        // twice and forced a cache with two racing consumers. Exact same
        // integer math: r = per-brand occurrence count, v = 1000 +
        // md5(brand) % 500, u = (Σ r·v · 1e6) DIV (Σ v²) — BIGINT sums,
        // order-free.
        val vSql = s"CAST(1000 AS BIGINT) + pmod(${
          PortableHash.md5LongSparkSql("b", "als~")}, CAST(500 AS BIGINT))"
        val perCust = t(s, dir, "lineitem")
          .join(broadcast(t(s, dir, "part")
            .select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .join(t(s, dir, "orders")
            .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("cust"), col("p_brand").as("brand"))
          // collect_list ships every row regardless, so pre-partitioning
          // by cust costs no extra bytes and lifts the list build + the
          // per-cust lambda work off the single-row-group scan task onto
          // the full width (the QueriesC.shingled idiom)
          .repartition(col("cust"))
          .groupBy("cust")
          .agg(collect_list(col("brand")).as("bl"))
          .withColumn("arr", expr(s"""
            transform(array_distinct(bl), b -> struct(
              b AS brand,
              CAST(size(filter(bl, x -> x = b)) AS BIGINT) AS r,
              $vSql AS v))"""))
          .withColumn("u", expr(
            """aggregate(arr, CAST(0 AS BIGINT), (a, x) -> a + x.r * x.v)
               * 1000000 DIV
               aggregate(arr, CAST(0 AS BIGINT), (a, x) -> a + x.v * x.v)"""))
        // THE job: the single sufficient-statistics pass (decimal sums —
        // Σu² crosses int64 at 100×)
        val pb = perCust
          .select(col("u"), explode(col("arr")).as("x"))
          .select(col("x.brand").as("brand"), col("x.r").as("r"),
            col("x.v").as("v"), col("u"))
          .groupBy("brand").agg(
            count(lit(1)).cast("long").as("n_raters"),
            max(col("v")).as("v"), // constant per brand
            sum(expr("CAST(r AS DECIMAL(38,0)) * r")).as("srr"),
            sum(expr("CAST(r AS DECIMAL(38,0)) * u")).as("sru"),
            sum(expr("CAST(u AS DECIMAL(38,0)) * u")).as("suu"))
          .collect() // bounded: one row per brand
        def big(r: org.apache.spark.sql.Row, c: String): BigInt =
          BigInt(r.getAs[java.math.BigDecimal](c).toBigInteger)
        val M6 = BigInt(1000000); val M12 = M6 * M6
        var sse0 = BigInt(0); var sse1 = BigInt(0)
        val out = pb.map { r =>
          val brand = r.getAs[String]("brand")
          val (srr, sru, suu) = (big(r, "srr"), big(r, "sru"), big(r, "suu"))
          val vb = BigInt(r.getAs[Long]("v"))
          val v1b = if (suu > 0) sru * M6 / suu else BigInt(0)
          sse0 += M12 * srr - 2 * M6 * vb * sru + vb * vb * suu
          sse1 += M12 * srr - 2 * M6 * v1b * sru + v1b * v1b * suu
          (brand, r.getAs[Long]("n_raters"), vb.toLong, v1b.toLong)
        }
        out.map { case (brand, n, v, v1) =>
          (brand, n, v, v1, (sse0 / M6).toLong, (sse1 / M6).toLong)
        }.toSeq.sortBy(_._1)
          .toDF("brand", "n_raters", "v0_milli", "v1_milli",
            "sse_before", "sse_after")
      },
      Some(s"""
        WITH ratings AS MATERIALIZED (
          SELECT o_custkey AS cust, p_brand AS brand, count(*) AS r
          FROM lineitem
          JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey
          GROUP BY 1, 2),
        v0 AS MATERIALIZED (
          SELECT brand,
                 1000 + ${PortableHash.md5LongSql("brand", "als~")} % 500 AS v
          FROM (SELECT DISTINCT brand FROM ratings)),
        users AS MATERIALIZED (
          SELECT cust, sum(r * v) * 1000000 // sum(v * v) AS u
          FROM ratings JOIN v0 USING (brand) GROUP BY 1),
        pb AS MATERIALIZED (
          SELECT brand, CAST(count(*) AS BIGINT) AS n_raters,
                 CAST(sum(CAST(r AS HUGEINT) * r) AS HUGEINT) AS srr,
                 CAST(sum(CAST(r AS HUGEINT) * u) AS HUGEINT) AS sru,
                 CAST(sum(CAST(u AS HUGEINT) * u) AS HUGEINT) AS suu
          FROM ratings JOIN users USING (cust) GROUP BY 1),
        pbv AS MATERIALIZED (
          SELECT pb.*, CAST(v0.v AS HUGEINT) AS v,
                 CASE WHEN suu > 0
                   THEN sru * 1000000 // suu ELSE CAST(0 AS HUGEINT) END AS v1
          FROM pb JOIN v0 USING (brand)),
        sse AS (
          SELECT sum(CAST(1000000 AS HUGEINT) * 1000000 * srr
                     - 2 * 1000000 * v * sru + v * v * suu)
                   // 1000000 AS sse_before,
                 sum(CAST(1000000 AS HUGEINT) * 1000000 * srr
                     - 2 * 1000000 * v1 * sru + v1 * v1 * suu)
                   // 1000000 AS sse_after
          FROM pbv)
        SELECT brand, n_raters, CAST(v AS BIGINT) AS v0_milli,
               CAST(v1 AS BIGINT) AS v1_milli,
               CAST(sse.sse_before AS BIGINT) AS sse_before,
               CAST(sse.sse_after AS BIGINT) AS sse_after
        FROM pbv, sse
        ORDER BY brand""")),

    // --------------------------------------------------------------- q464
    QDef("q464_item_item_cf",
      (s, dir) => {
        // one shuffle instead of distinct + self-join: collect_set(brand)
        // per cust dedups map-side AND replaces the cust-keyed self-join —
        // per-cust pair generation is local O(b²) with b ≤ |brand| (25),
        // so the only wide exchanges are the cust agg and the tiny
        // (≤ brand²)-row pair rollup. At 100 TB the self-join's edge-list
        // shuffle is the bottleneck this removes.
        // r12 ONE-JOB CENSUS (the q400 shape): the per-brand degrees AND
        // the per-pair co-incidence counts both come from the same
        // kind-tagged enumeration over the ≤25-element sorted brand
        // baskets, partially aggregated into ≤ 25 + C(25,2) keys —
        // bounded BY CONSTRUCTION at any scale, so the cosine scoring
        // and the top-3-per-brand ranking finish on the driver. Replaces
        // cache + deg collect + pairs/sym/deg-joins/window (2 jobs, one
        // of them the whole byCust pipeline twice-consumed) with 1 job,
        // no cache. Same IEEE op order: floor(nab/sqrt(na·nb)·1e6).
        val sc = s
        import sc.implicits._
        val census = t(s, dir, "lineitem")
          .join(broadcast(t(s, dir, "part")
            .select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .join(t(s, dir, "orders")
            .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("cust"), col("p_brand").as("brand"))
          // collect_set ships every row; pre-partitioning by cust costs no
          // extra bytes and runs the set build + enumeration at full width
          .repartition(col("cust"))
          .groupBy("cust")
          .agg(sort_array(collect_set(col("brand"))).as("brands"))
          .select(explode(expr("""
            flatten(array(
              transform(brands, x -> struct(x AS ba, CAST(NULL AS STRING) AS bb)),
              flatten(transform(brands, (x, i) ->
                transform(slice(brands, i + 2, size(brands)),
                  y -> struct(x AS ba, y AS bb))))
            ))""")).as("e"))
          .groupBy(col("e.ba").as("ba"), col("e.bb").as("bb"))
          .agg(count(lit(1)).cast("bigint").as("c"))
          .collect()
        val deg = census.iterator.filter(_.isNullAt(1))
          .map(r => r.getString(0) -> r.getLong(2)).toMap
        val pairs = census.iterator.filter(!_.isNullAt(1))
          .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
        pairs.flatMap { case (a, b, nab) => Seq((a, b, nab), (b, a, nab)) }
          .groupBy(_._1).toSeq.flatMap { case (ba, g) =>
            g.map { case (_, bb, nab) =>
              (bb, nab, math.floor(nab.toDouble /
                math.sqrt(deg(ba).toDouble * deg(bb).toDouble) * 1e6).toLong)
            }.sortBy { case (bb, _, cm) => (-cm, bb) }
              .take(3).zipWithIndex
              .map { case ((bb, nab, cm), k) =>
                (ba, (k + 1).toLong, bb, nab, cm) }
          }
          .sortBy { case (ba, rk, _, _, _) => (ba, rk) }
          .toDF("brand", "rk", "neighbor", "nab", "cos_micro")
      },
      Some("""
        WITH inc AS MATERIALIZED (
          SELECT DISTINCT o_custkey AS cust, p_brand AS brand
          FROM lineitem
          JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey),
        deg AS (SELECT brand, count(*) AS n FROM inc GROUP BY 1),
        pairs AS (
          SELECT x.brand AS ba, y.brand AS bb, count(*) AS nab
          FROM inc x JOIN inc y
            ON x.cust = y.cust AND x.brand < y.brand
          GROUP BY 1, 2),
        sym AS (
          SELECT ba, bb, nab FROM pairs
          UNION ALL SELECT bb, ba, nab FROM pairs),
        scored AS (
          SELECT ba, bb, nab,
                 CAST(floor(CAST(nab AS DOUBLE)
                   / sqrt(CAST(da.n AS DOUBLE) * CAST(db.n AS DOUBLE)) * 1e6)
                   AS BIGINT) AS cos_micro
          FROM sym
          JOIN deg da ON sym.ba = da.brand
          JOIN deg db ON sym.bb = db.brand),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY ba
            ORDER BY cos_micro DESC, bb) AS rk
          FROM scored)
        SELECT ba AS brand, CAST(rk AS BIGINT) AS rk, bb AS neighbor,
               CAST(nab AS BIGINT) AS nab, cos_micro
        FROM ranked WHERE rk <= 3
        ORDER BY brand, rk""")),

    // --------------------------------------------------------------- q465
    QDef("q465_leakage_audit",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .selectExpr("user_id", "event_type", s"($tsMs) DIV 86400000 AS d")
        val tcut = ev.agg((min("d") + 21).as("t0"))
        val base = ev.crossJoin(broadcast(tcut))
        val feats = base.groupBy("user_id").agg(
          max(when(col("event_type") === "purchase" &&
            col("d") >= col("t0") && col("d") < col("t0") + 2, 1L)
            .otherwise(0L)).as("label"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .cast("bigint").as("naive_clicks"),
          sum(when(col("event_type") === "click" && col("d") < col("t0"), 1L)
            .otherwise(0L)).cast("bigint").as("clean_clicks"))
        feats.groupBy("label").agg(
          count(lit(1)).cast("long").as("users"),
          sum(when(col("naive_clicks") =!= col("clean_clicks"), 1L)
            .otherwise(0L)).cast("bigint").as("leaked_users"),
          sum("naive_clicks").cast("bigint").as("naive_total"),
          sum("clean_clicks").cast("bigint").as("clean_total"))
          .selectExpr("label", "users", "leaked_users",
            "leaked_users * 10000 DIV users AS leak_bp",
            "naive_total", "clean_total",
            "(naive_total - clean_total) * 1000 DIV users AS inflation_milli")
          .orderBy("label")
      },
      Some("""
        WITH ev AS (
          SELECT user_id, event_type, epoch_ms(ts) // 86400000 AS d
          FROM events),
        tcut AS (SELECT min(d) + 21 AS t0 FROM ev),
        feats AS (
          SELECT user_id,
                 max(CASE WHEN event_type = 'purchase' AND d >= t0
                          AND d < t0 + 2 THEN 1 ELSE 0 END) AS label,
                 sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   AS naive_clicks,
                 sum(CASE WHEN event_type = 'click' AND d < t0
                     THEN 1 ELSE 0 END) AS clean_clicks
          FROM ev, tcut GROUP BY 1)
        SELECT CAST(label AS BIGINT) AS label,
               CAST(count(*) AS BIGINT) AS users,
               CAST(sum(CASE WHEN naive_clicks <> clean_clicks
                 THEN 1 ELSE 0 END) AS BIGINT) AS leaked_users,
               CAST(sum(CASE WHEN naive_clicks <> clean_clicks
                 THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT) AS leak_bp,
               CAST(sum(naive_clicks) AS BIGINT) AS naive_total,
               CAST(sum(clean_clicks) AS BIGINT) AS clean_total,
               CAST((sum(naive_clicks) - sum(clean_clicks)) * 1000
                 // count(*) AS BIGINT) AS inflation_milli
        FROM feats GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q466
    QDef("q466_lsm_wa",
      (s, dir) => {
        val ingest = t(s, dir, "events")
          .groupBy("event_type")
          .agg(sum(length(col("props"))).cast("bigint").as("bytes"))
        ingest
          .selectExpr("event_type", "bytes",
            "greatest(bytes DIV 1048576, 1) AS mb")
          .selectExpr("event_type", "bytes", "mb",
            "CAST(length(CAST(mb AS STRING)) AS BIGINT) AS levels")
          .selectExpr("event_type", "bytes", "mb", "levels",
            "2 + 11 * levels AS wa_leveled_x2",
            "2 + 2 * levels AS wa_tiered_x2",
            "(bytes * (2 + 11 * levels)) DIV 2 AS written_leveled",
            "(bytes * (2 + 2 * levels)) DIV 2 AS written_tiered")
          .orderBy("event_type")
      },
      Some("""
        WITH ingest AS (
          SELECT event_type, CAST(sum(length(props)) AS BIGINT) AS bytes
          FROM events GROUP BY 1),
        lv AS (
          SELECT event_type, bytes, greatest(bytes // 1048576, 1) AS mb
          FROM ingest),
        lv2 AS (
          SELECT event_type, bytes, mb,
                 CAST(length(CAST(mb AS VARCHAR)) AS BIGINT) AS levels
          FROM lv)
        SELECT event_type, bytes, CAST(mb AS BIGINT) AS mb, levels,
               CAST(2 + 11 * levels AS BIGINT) AS wa_leveled_x2,
               CAST(2 + 2 * levels AS BIGINT) AS wa_tiered_x2,
               CAST((bytes * (2 + 11 * levels)) // 2 AS BIGINT)
                 AS written_leveled,
               CAST((bytes * (2 + 2 * levels)) // 2 AS BIGINT)
                 AS written_tiered
        FROM lv2 ORDER BY event_type"""))
  )
}
