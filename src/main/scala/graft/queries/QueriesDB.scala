package graft.queries

import graft.Tables.t
import graft.functions.TextFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 99 — panel econometrics, rank
  * aggregation, stylometry, submodular corpus selection:
  *
  *  - q419: two-way fixed-effects panel regression on the (type × day)
  *    panel — daily revenue cents on daily event count, both
  *    within-transformed (x − x̄_i − x̄_t + x̄): means from exact BIGINT
  *    sums (one division each), demeaned values floor-quantized to unit
  *    grain per cell so the slope's Σx̃ỹ / Σx̃² is exact integer
  *    arithmetic with no BIGINT overflow at any tested SF;
  *    per-type fixed effect α_i = ȳ_i − β·x̄_i. The panel upgrade of
  *    q239's DiD (which is the 2×2 special case).
  *  - q420: Borda rank aggregation — parts ranked by three independent
  *    metrics (revenue, quantity, distinct orders; deterministic
  *    tiebreaks), Borda score Σ(n − rank), consensus top-15. The
  *    ensemble-leaderboard shape: three window ranks + one sum, no
  *    pairwise comparisons (Kemeny is NP-hard; Borda is its one-shuffle
  *    5-approximation cousin).
  *  - q421: Burrows' Delta stylometry between sources — top-30 corpus
  *    marker words, per-source relative frequencies (ppm, exact DIV),
  *    per-word z-scores across sources (sd from exact integer moments,
  *    one sqrt + one division, floor-milli), Delta(s₁,s₂) = mean |z₁−z₂|
  *    over markers in exact integer milli. The authorship/template
  *    attribution operator beside q212's boilerplate detector.
  *  - q422: greedy max-coverage corpus selection — three rounds of
  *    "pick the source adding the most unseen distinct word-trigrams"
  *    (the classic (1−1/e) submodular-maximization greedy): each round
  *    is one anti-join + one distinct-count + one argmax, entirely
  *    declarative (the one-row winner joins forward, nothing collects
  *    to the driver). The data-mixing selector that complements q217's
  *    rare-coverage shares and q320's temperature weights.
  *
  * Reference analog: scheduling-policy effects net of area and time,
  * hot-listing consensus across metrics, host-template attribution,
  * which survey areas to scrape first for maximum vocabulary coverage.
  */
object QueriesDB extends QueryPack {
  import Q._

  private val wSql = TextFunctions.wordsSql("text")

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q419
    QDef("q419_fixed_effects",
      (s, dir) => {
        val panel = t(s, dir, "events")
          .selectExpr("event_type", s"($tsMs) DIV 86400000 AS d",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents")
          .groupBy("event_type", "d")
          .agg(count(lit(1)).cast("long").as("x"),
            sum("cents").cast("bigint").as("y"))
        val mi = panel.groupBy("event_type").agg(
          sum("x").cast("bigint").as("sxi"), sum("y").cast("bigint").as("syi"),
          count(lit(1)).cast("long").as("ni"))
        val mt = panel.groupBy("d").agg(
          sum("x").cast("bigint").as("sxt"), sum("y").cast("bigint").as("syt"),
          count(lit(1)).cast("long").as("nt"))
        val g = panel.agg(sum("x").cast("bigint").as("sx"),
          sum("y").cast("bigint").as("sy"), count(lit(1)).cast("long").as("n"))
        val dm = panel.join(broadcast(mi), "event_type")
          .join(broadcast(mt), "d").crossJoin(broadcast(g))
          .selectExpr("event_type",
            "CAST(floor((CAST(x AS DOUBLE) - CAST(sxi AS DOUBLE)/CAST(ni AS DOUBLE) - CAST(sxt AS DOUBLE)/CAST(nt AS DOUBLE) + CAST(sx AS DOUBLE)/CAST(n AS DOUBLE))) AS BIGINT) AS xt",
            "CAST(floor((CAST(y AS DOUBLE) - CAST(syi AS DOUBLE)/CAST(ni AS DOUBLE) - CAST(syt AS DOUBLE)/CAST(nt AS DOUBLE) + CAST(sy AS DOUBLE)/CAST(n AS DOUBLE))) AS BIGINT) AS yt")
        val beta = dm.agg(sum(col("xt") * col("yt")).cast("bigint").as("sxy"),
          sum(col("xt") * col("xt")).cast("bigint").as("sxx"))
          .selectExpr("sxy", "sxx",
            "CASE WHEN sxx > 0 THEN sxy * 1000000 DIV sxx ELSE 0 END AS beta_micro")
        mi.crossJoin(broadcast(beta))
          .selectExpr("event_type", "ni AS n_days",
            "sxi * 1000 DIV ni AS xbar_milli",
            "syi * 1000 DIV ni AS ybar_milli",
            "beta_micro",
            "(syi * 1000 DIV ni) - ((beta_micro * (sxi * 1000 DIV ni)) DIV 1000000) AS alpha_milli")
          .orderBy("event_type")
      },
      Some("""
        WITH panel AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS d,
                 count(*) AS x,
                 sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS y
          FROM events GROUP BY 1, 2),
        mi AS (SELECT event_type, sum(x) AS sxi, sum(y) AS syi,
                      count(*) AS ni FROM panel GROUP BY 1),
        mt AS (SELECT d, sum(x) AS sxt, sum(y) AS syt, count(*) AS nt
               FROM panel GROUP BY 1),
        g AS (SELECT sum(x) AS sx, sum(y) AS sy, count(*) AS n FROM panel),
        dm AS (
          SELECT panel.event_type,
                 CAST(floor((CAST(x AS DOUBLE) - CAST(sxi AS DOUBLE)/CAST(ni AS DOUBLE)
                   - CAST(sxt AS DOUBLE)/CAST(nt AS DOUBLE)
                   + CAST(sx AS DOUBLE)/CAST(n AS DOUBLE))) AS BIGINT) AS xt,
                 CAST(floor((CAST(y AS DOUBLE) - CAST(syi AS DOUBLE)/CAST(ni AS DOUBLE)
                   - CAST(syt AS DOUBLE)/CAST(nt AS DOUBLE)
                   + CAST(sy AS DOUBLE)/CAST(n AS DOUBLE))) AS BIGINT) AS yt
          FROM panel JOIN mi ON panel.event_type = mi.event_type
                     JOIN mt ON panel.d = mt.d, g),
        beta AS (
          SELECT CASE WHEN sum(xt * xt) > 0
                 THEN sum(xt * yt) * 1000000 // sum(xt * xt)
                 ELSE 0 END AS beta_micro
          FROM dm)
        SELECT event_type, CAST(ni AS BIGINT) AS n_days,
               CAST(sxi * 1000 // ni AS BIGINT) AS xbar_milli,
               CAST(syi * 1000 // ni AS BIGINT) AS ybar_milli,
               CAST(beta_micro AS BIGINT) AS beta_micro,
               CAST((syi * 1000 // ni)
                 - ((beta_micro * (sxi * 1000 // ni)) // 1000000)
                 AS BIGINT) AS alpha_milli
        FROM mi, beta ORDER BY event_type""")),

    // --------------------------------------------------------------- q420
    QDef("q420_borda",
      (s, dir) => {
        val m = t(s, dir, "lineitem")
          .selectExpr("l_partkey", "l_orderkey",
            "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents",
            "CAST(l_quantity AS BIGINT) AS q")
          .groupBy("l_partkey").agg(
            sum("cents").cast("bigint").as("rev"),
            sum("q").cast("bigint").as("qty"),
            countDistinct("l_orderkey").cast("long").as("nord"))
        // three exact global ranks. Dual path (the q195/q205 pattern):
        // the part census is a DIMENSION aggregate — when it fits a
        // bounded threshold, three plain windows over the aggregate run
        // in one job; above it, the exact ScaleRank two-phase chain
        // (rank values identical — spec-asserted). The unguarded
        // 3-frame chain cost three checkpoint pins (~2.4 s of job
        // overhead at sf0.1, DuckDB 0.17 s).
        m.cache()
        val nParts = m.count()
        val SR = graft.operators.ScaleRank
        val ranked = if (nParts <= 2000000L) {
          import org.apache.spark.sql.expressions.Window
          m.withColumn("r_rev", row_number().over(
              Window.orderBy(col("rev").desc, col("l_partkey"))).cast("bigint"))
            .withColumn("r_qty", row_number().over(
              Window.orderBy(col("qty").desc, col("l_partkey"))).cast("bigint"))
            .withColumn("r_ord", row_number().over(
              Window.orderBy(col("nord").desc, col("l_partkey"))).cast("bigint"))
            .withColumn("n", lit(nParts))
        } else {
          SR.withTotals(
            SR.withGlobalRowNumber(
              SR.withGlobalRowNumber(
                SR.withGlobalRowNumber(m,
                  Seq(col("rev").desc, col("l_partkey")), "r_rev"),
                Seq(col("qty").desc, col("l_partkey")), "r_qty"),
              Seq(col("nord").desc, col("l_partkey")), "r_ord"),
            Seq(count(lit(1)).cast("long").as("n")))
        }
        ranked.selectExpr("l_partkey", "r_rev", "r_qty", "r_ord",
          "(n - r_rev) + (n - r_qty) + (n - r_ord) AS borda")
          .orderBy(col("borda").desc, col("l_partkey"))
          .limit(15)
      },
      Some("""
        WITH m AS (
          SELECT l_partkey,
                 sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS rev,
                 sum(CAST(l_quantity AS BIGINT)) AS qty,
                 count(DISTINCT l_orderkey) AS nord
          FROM lineitem GROUP BY 1),
        rk AS (
          SELECT l_partkey,
                 row_number() OVER (ORDER BY rev DESC, l_partkey) AS r_rev,
                 row_number() OVER (ORDER BY qty DESC, l_partkey) AS r_qty,
                 row_number() OVER (ORDER BY nord DESC, l_partkey) AS r_ord,
                 count(*) OVER () AS n
          FROM m)
        SELECT l_partkey, CAST(r_rev AS BIGINT) AS r_rev,
               CAST(r_qty AS BIGINT) AS r_qty,
               CAST(r_ord AS BIGINT) AS r_ord,
               CAST((n - r_rev) + (n - r_qty) + (n - r_ord) AS BIGINT) AS borda
        FROM rk ORDER BY borda DESC, l_partkey LIMIT 15""")),

    // --------------------------------------------------------------- q421
    QDef("q421_burrows_delta",
      (s, dir) => {
        val toks = t(s, dir, "documents")
          .select(col("source"),
            explode(TextFunctions.words(col("text"))).as("tok"))
        val srcTot = toks.groupBy("source")
          .agg(count(lit(1)).cast("bigint").as("stot"))
        val markers = toks.groupBy("tok")
          .agg(count(lit(1)).as("tf"))
          .orderBy(col("tf").desc, col("tok")).limit(30)
          .select("tok")
        val f = toks.join(broadcast(markers), "tok")
          .groupBy("source", "tok").agg(count(lit(1)).cast("bigint").as("c"))
          .join(srcTot, "source")
          .selectExpr("source", "tok", "c * 1000000 DIV stot AS ppm")
        val stats = f.groupBy("tok").agg(
          count(lit(1)).cast("long").as("ns"),
          sum("ppm").cast("bigint").as("s1"),
          sum(col("ppm") * col("ppm")).cast("bigint").as("s2"))
          .where(col("ns") * col("s2") - col("s1") * col("s1") > 0)
        val z = f.join(stats, "tok")
          .selectExpr("source", "tok",
            "CAST(floor((CAST(ppm AS DOUBLE) - CAST(s1 AS DOUBLE)/CAST(ns AS DOUBLE)) / (sqrt(CAST(ns * s2 - s1 * s1 AS DOUBLE)) / CAST(ns AS DOUBLE)) * 1000) AS BIGINT) AS z")
        z.as("a").join(z.as("b"),
            col("a.tok") === col("b.tok") && col("a.source") < col("b.source"))
          .select(col("a.source").as("sa"), col("b.source").as("sb"),
            abs(col("a.z") - col("b.z")).as("dz"))
          .groupBy("sa", "sb")
          .agg(count(lit(1)).cast("long").as("n_markers"),
            expr("sum(dz) DIV count(*)").cast("long").as("delta_milli"))
          .orderBy("sa", "sb")
      },
      Some(s"""
        WITH toks AS (
          SELECT source, unnest($wSql) AS tok FROM documents),
        stot AS (SELECT source, count(*) AS stot FROM toks GROUP BY 1),
        markers AS (
          SELECT tok FROM (SELECT tok, count(*) AS tf FROM toks GROUP BY 1)
          ORDER BY tf DESC, tok LIMIT 30),
        f AS (
          SELECT t.source, t.tok, count(*) * 1000000 // max(stot.stot) AS ppm
          FROM toks t JOIN markers ON t.tok = markers.tok
                      JOIN stot ON t.source = stot.source
          GROUP BY 1, 2),
        stats AS (
          SELECT tok, count(*) AS ns, sum(ppm) AS s1, sum(ppm * ppm) AS s2
          FROM f GROUP BY 1
          HAVING count(*) * sum(ppm * ppm) - sum(ppm) * sum(ppm) > 0),
        z AS (
          SELECT source, f.tok,
                 CAST(floor((CAST(ppm AS DOUBLE) - CAST(s1 AS DOUBLE)/CAST(ns AS DOUBLE))
                   / (sqrt(CAST(ns * s2 - s1 * s1 AS DOUBLE)) / CAST(ns AS DOUBLE))
                   * 1000) AS BIGINT) AS z
          FROM f JOIN stats ON f.tok = stats.tok)
        SELECT a.source AS sa, b.source AS sb,
               CAST(count(*) AS BIGINT) AS n_markers,
               CAST(sum(abs(a.z - b.z)) // count(*) AS BIGINT) AS delta_milli
        FROM z a JOIN z b ON a.tok = b.tok AND a.source < b.source
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // --------------------------------------------------------------- q422
    QDef("q422_greedy_coverage",
      (s, dir) => {
        // DRIVER COMPACTION over the bounded census (r10): the distinct
        // (source, trigram) table is |sources| × vocab³-bounded (20 × ~30k
        // here), so the greedy runs in Scala over collected per-source
        // sets. The r9 form re-ran the explode+distinct pipeline ~6×
        // (uncached tg referenced twice per step) and ~20 jobs — 16s at
        // sf1 for what is one aggregation of work.
        val sc3 = s
        import sc3.implicits._
        val tg = t(s, dir, "documents")
          // single-file scan = ONE partition; fan out before the gram work
          .repartition(col("doc_id"))
          .withColumn("w", TextFunctions.words(col("text")))
          .where(size(col("w")) >= 3)
          // native per-doc distinct gram set, built in its OWN projection:
          // a generator child is re-evaluated per OUTPUT row, so the set
          // must be a materialized column before the explode
          .select(col("source"), TextFunctions.wordNgramSet(col("w"), 3).as("gs"))
          .select(col("source"), explode(col("gs")).as("g"))
          .distinct()
          .collect().map(r => (r.getString(0), r.getString(1)))
        val bySrc = tg.groupBy(_._1).map { case (src, rs) =>
          src -> rs.map(_._2).toSet
        }
        val covered = scala.collection.mutable.HashSet[String]()
        val excluded = scala.collection.mutable.HashSet[String]()
        var cum = 0L
        // fewer sources than steps (or an empty corpus): the oracle's
        // s2/s3 CTEs simply go empty, so emit no row for that step
        val out = (1 to 3).flatMap { step =>
          val cands = bySrc.view
            .filterNot { case (k, _) => excluded(k) }
            .map { case (k, gs) => (k, gs.count(g => !covered(g)).toLong) }
          if (cands.isEmpty) None
          else {
            val (src, gain) = cands.minBy { case (k, gn) =>
              (-gn, k != null, if (k == null) "" else k) // nulls-first ties
            }
            covered ++= bySrc(src)
            excluded += src
            cum += gain
            Some((step.toLong, src, gain, cum))
          }
        }
        out.toDF("step", "source", "gain", "cum")
      },
      Some(s"""
        WITH d AS (SELECT source, $wSql AS w FROM documents),
        tg AS (
          SELECT DISTINCT source, g
          FROM (SELECT source,
                  unnest(${TextFunctions.wordNgramsSql("w", 3)}) AS g
                FROM d WHERE len(w) >= 3)),
        c1 AS (SELECT source, count(DISTINCT g) AS gain FROM tg GROUP BY 1),
        s1 AS (SELECT source, gain FROM c1 ORDER BY gain DESC, source LIMIT 1),
        cov1 AS (SELECT DISTINCT g FROM tg JOIN s1 USING (source)),
        c2 AS (
          SELECT t.source, count(DISTINCT t.g) AS gain FROM tg t
          WHERE t.source NOT IN (SELECT source FROM s1)
            AND t.g NOT IN (SELECT g FROM cov1)
          GROUP BY 1),
        s2 AS (SELECT source, gain FROM c2 ORDER BY gain DESC, source LIMIT 1),
        cov2 AS (SELECT g FROM cov1
                 UNION SELECT g FROM tg JOIN s2 USING (source)),
        c3 AS (
          SELECT t.source, count(DISTINCT t.g) AS gain FROM tg t
          WHERE t.source NOT IN (SELECT source FROM s1)
            AND t.source NOT IN (SELECT source FROM s2)
            AND t.g NOT IN (SELECT g FROM cov2)
          GROUP BY 1),
        s3 AS (SELECT source, gain FROM c3 ORDER BY gain DESC, source LIMIT 1)
        SELECT CAST(1 AS BIGINT) AS step, source, CAST(gain AS BIGINT) AS gain,
               CAST((SELECT gain FROM s1) AS BIGINT) AS cum FROM s1
        UNION ALL
        SELECT 2, source, CAST(gain AS BIGINT),
               CAST((SELECT gain FROM s1) + (SELECT gain FROM s2) AS BIGINT)
        FROM s2
        UNION ALL
        SELECT 3, source, CAST(gain AS BIGINT),
               CAST((SELECT gain FROM s1) + (SELECT gain FROM s2)
                    + (SELECT gain FROM s3) AS BIGINT)
        FROM s3
        ORDER BY step"""))
  )
}
