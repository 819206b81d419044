package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 46 — forecasting, curation-filter
  * attribution, boilerplate detection, temporal relations, fuzzy blocking:
  *
  *  - q210: Holt linear smoothing (level+trend double-exponential) over
  *    per-type daily harvest counts — a COUPLED two-state recurrence
  *    (EWMA q179 carries one state), run on the secondary-sort
  *    mapPartitions scale path in exact integer milli; recursive-CTE
  *    oracle recomputes the same truncating arithmetic. Reports the
  *    one-step-ahead backtest error (SAE) and the next-day forecast.
  *  - q211: curation filter cascade — C4/Gopher-style doc filters in a
  *    fixed order (too-short, too-few-words, no-stopwords, top-word
  *    dominance); each doc attributed to its FIRST failing rule, counts
  *    per (lang, rule). The drop-accounting report every corpus curation
  *    run ships with.
  *  - q212: boilerplate shingle detection — 5-gram word shingles
  *    appearing in ≥3 distinct docs are corpus boilerplate; per-doc
  *    boilerplate fraction (bp over its distinct shingles), rolled up
  *    per source (mean/max/heavy-doc count). The cross-document
  *    template-text detector that complements within-doc repetition
  *    (q59) and near-dup pairs (q31/q33).
  *  - q213: temporal relation census — consecutive 7-day order windows
  *    per customer classified same-start/overlap/meet/gap (the
  *    equal-length fragment of Allen's interval algebra), counted per
  *    market segment. One window lag, one aggregate.
  *  - q214: blocked fuzzy match — Levenshtein ≤4 part-name pairs inside
  *    (brand, size) blocks: pair count, exact-name-dup count, min
  *    distance per brand. Blocking bounds the candidate set (the
  *    record-linkage scale pattern: never all-pairs, always
  *    block-then-compare); edit distance is exact integers both engines.
  *
  * Reference analog: Holt = calendar/listing-volume forecasting for
  * survey scheduling; cascade = response-quality gating before parse;
  * boilerplate = repeated host-template text across listing pages;
  * intervals = survey-window adjacency accounting; fuzzy blocks =
  * listing-title near-duplicate linkage within a grid cell.
  */
object QueriesBA extends QueryPack {
  import Q._

  // NOT private: Spark's generated (de)serializer code must access these.
  case class HtIn(event_type: String, day: Long, y: Long)
  case class HtOut(event_type: String, n_days: Long, level_milli: Long,
      trend_milli: Long, forecast_milli: Long, sae_milli: Long)

  private val StopWords = Seq("the", "a", "of", "and", "to", "in")

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q210
    QDef("q210_holt",
      (s, dir) => {
        import s.implicits._
        val daily = t(s, dir, "events")
          .selectExpr("event_type", s"($tsMs) DIV 86400000 AS day")
          .groupBy("event_type", "day").agg(count(lit(1)).as("y"))
          .as[HtIn]
        daily.repartition(col("event_type"))
          .sortWithinPartitions("event_type", "day")
          .mapPartitions { it =>
            new Iterator[HtOut] {
              private var pending: Option[HtOut] = None
              private var cur: String = null
              private var lv = 0L; private var tr = 0L
              private var sae = 0L; private var n = 0L
              private def flush(): HtOut = {
                val r = HtOut(cur, n, lv, tr, lv + tr, sae)
                cur = null; r
              }
              private def roll(): Unit = {
                while (pending.isEmpty && it.hasNext) {
                  val e = it.next()
                  if (e.event_type != cur) {
                    if (cur != null) pending = Some(flush())
                    cur = e.event_type
                    lv = e.y * 1000L; tr = 0L; sae = 0L; n = 1L
                  } else {
                    val f = lv + tr
                    sae += math.abs(e.y * 1000L - f)
                    // Long `/` truncates toward zero == DuckDB `//`
                    val nl = (300L * e.y * 1000L + 700L * f) / 1000L
                    tr = (200L * (nl - lv) + 800L * tr) / 1000L
                    lv = nl
                    n += 1L
                  }
                }
                if (pending.isEmpty && cur != null) pending = Some(flush())
              }
              def hasNext: Boolean = { roll(); pending.isDefined }
              def next(): HtOut = { roll(); val r = pending.get; pending = None; r }
            }
          }
          .toDF()
          .orderBy("event_type")
      },
      Some("""
        WITH RECURSIVE d AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS day, count(*) AS y
          FROM events GROUP BY 1, 2),
        r AS (
          SELECT event_type, y,
                 row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS cnt
          FROM d),
        h AS (
          SELECT event_type, rn, cnt, y * 1000 AS lv,
                 CAST(0 AS BIGINT) AS tr, CAST(0 AS BIGINT) AS sae
          FROM r WHERE rn = 1
          UNION ALL
          SELECT r.event_type, r.rn, r.cnt,
                 (300 * r.y * 1000 + 700 * (h.lv + h.tr)) // 1000,
                 (200 * ((300 * r.y * 1000 + 700 * (h.lv + h.tr)) // 1000 - h.lv)
                    + 800 * h.tr) // 1000,
                 h.sae + abs(r.y * 1000 - (h.lv + h.tr))
          FROM h JOIN r ON r.event_type = h.event_type AND r.rn = h.rn + 1)
        SELECT event_type, CAST(cnt AS BIGINT) AS n_days, lv AS level_milli,
               tr AS trend_milli, lv + tr AS forecast_milli, sae AS sae_milli
        FROM h WHERE rn = cnt ORDER BY event_type""")),

    // --------------------------------------------------------------- q211
    QDef("q211_filter_cascade",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"),
            split(col("text"), " ").as("ws"))
        val attrs = docs.select(col("doc_id"), col("lang"), col("n_chars"),
          size(col("ws")).cast("bigint").as("n_words"))
        val tw = docs
          .select(col("doc_id"), explode(col("ws")).as("word"))
          .groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
          .groupBy("doc_id")
          .agg(max("c").as("topc"),
            sum(when(col("word").isin(StopWords: _*), col("c")).otherwise(0L))
              .cast("bigint").as("stopc"))
        attrs.join(tw, "doc_id")
          .withColumn("rule", expr("""
            CASE WHEN n_chars < 100 THEN 'short'
                 WHEN n_words < 25 THEN 'few_words'
                 WHEN stopc = 0 THEN 'no_stopwords'
                 WHEN topc * 100 >= n_words * 15 THEN 'repetitive'
                 ELSE 'pass' END"""))
          .groupBy("lang", "rule").agg(count(lit(1)).as("n_docs"))
          .orderBy("lang", "rule")
      },
      Some(s"""
        WITH w AS (
          SELECT doc_id, lang, n_chars, string_split(text, ' ') AS ws
          FROM documents),
        attrs AS (
          SELECT doc_id, lang, n_chars, CAST(len(ws) AS BIGINT) AS n_words
          FROM w),
        tw AS (
          SELECT doc_id, max(c) AS topc,
                 CAST(sum(CASE WHEN word IN (${StopWords.map("'" + _ + "'").mkString(", ")})
                          THEN c ELSE 0 END) AS BIGINT) AS stopc
          FROM (SELECT doc_id, word, count(*) AS c
                FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                      FROM documents)
                GROUP BY 1, 2)
          GROUP BY 1)
        SELECT lang,
               CASE WHEN n_chars < 100 THEN 'short'
                    WHEN n_words < 25 THEN 'few_words'
                    WHEN stopc = 0 THEN 'no_stopwords'
                    WHEN topc * 100 >= n_words * 15 THEN 'repetitive'
                    ELSE 'pass' END AS rule,
               count(*) AS n_docs
        FROM attrs JOIN tw USING (doc_id)
        GROUP BY 1, 2 ORDER BY lang, rule""")),

    // --------------------------------------------------------------- q212
    QDef("q212_boilerplate",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          // single-file scan = ONE partition; fan out BEFORE the native
          // per-doc gram-set pass or it runs in one task (q478 pattern)
          .repartition(col("doc_id"))
          .select(col("doc_id"), col("source"), split(col("text"), " ").as("ws"))
          .where(size(col("ws")) >= 5)
        // r11 (the q217 recipe): the native per-doc distinct gram set
        // (WordNgramSet, one pass per row) replaces explode-positions +
        // concat_ws + the corpus-wide .distinct() — the wide shingle
        // strings now dedup INSIDE the row before anything shuffles, and
        // df collapses from countDistinct(doc_id) to a plain count
        // (each (sh, doc) pair exists exactly once by construction).
        // MEASURED NEGATIVE RESULT (r9, clearCache bench protocol):
        // caching sh (read by dfreq and the join-back) benched 6.7 s vs
        // 6.3 s for the uncached form at sf1 and was reverted — writing
        // the wide shingle strings to the cache costs as much as the
        // second derivation it saves; Catalyst already shares the
        // exchange where it can.
        val sh = docs
          .select(col("doc_id"), col("source"),
            explode(graft.functions.TextFunctions.wordNgramSet(col("ws"), 5))
              .as("sh"))
        val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
        sh.join(dfreq, "sh")
          .groupBy("doc_id", "source")
          .agg(count(lit(1)).as("n_sh"),
            sum(when(col("df") >= 3, 1L).otherwise(0L)).cast("bigint").as("n_boiler"))
          .withColumn("bp", expr("n_boiler * 10000 DIV n_sh"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            expr("CAST(sum(bp) AS BIGINT) DIV count(1)").as("mean_bp"),
            max("bp").as("max_bp"),
            sum(when(col("bp") >= 2000, 1L).otherwise(0L)).cast("bigint").as("n_heavy"))
          .orderBy("source")
      },
      Some("""
        WITH w AS (
          SELECT doc_id, source, string_split(text, ' ') AS ws
          FROM documents WHERE len(string_split(text, ' ')) >= 5),
        idx AS (
          SELECT doc_id, source, ws,
                 unnest(generate_series(1, CAST(len(ws) - 4 AS BIGINT))) AS i
          FROM w),
        sh AS (
          SELECT DISTINCT doc_id, source, array_to_string(ws[i:i+4], ' ') AS sh
          FROM idx),
        dfreq AS (SELECT sh, count(DISTINCT doc_id) AS df FROM sh GROUP BY 1),
        per AS (
          SELECT s.doc_id, s.source, count(*) AS n_sh,
                 CAST(sum(CASE WHEN d.df >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
          FROM sh s JOIN dfreq d USING (sh) GROUP BY 1, 2),
        pb AS (SELECT *, n_boiler * 10000 // n_sh AS bp FROM per)
        SELECT source, count(*) AS n_docs,
               CAST(sum(bp) AS BIGINT) // count(*) AS mean_bp,
               max(bp) AS max_bp,
               CAST(sum(CASE WHEN bp >= 2000 THEN 1 ELSE 0 END) AS BIGINT) AS n_heavy
        FROM pb GROUP BY 1 ORDER BY source""")),

    // --------------------------------------------------------------- q213
    QDef("q213_interval_census",
      (s, dir) => {
        val horizon = 7L * 86400000L
        val o = t(s, dir, "orders")
          .selectExpr("o_custkey",
            "unix_millis(CAST(o_orderdate AS TIMESTAMP)) AS start_ms", "o_orderkey")
        val wc = Window.partitionBy("o_custkey").orderBy("start_ms", "o_orderkey")
        val seg = t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment").as("seg"))
        o.withColumn("prev_start", lag("start_ms", 1).over(wc))
          .where(col("prev_start").isNotNull)
          .withColumn("rel", expr(s"""
            CASE WHEN start_ms = prev_start THEN 'same'
                 WHEN start_ms < prev_start + ${horizon}L THEN 'overlap'
                 WHEN start_ms = prev_start + ${horizon}L THEN 'meet'
                 ELSE 'gap' END"""))
          .join(broadcast(seg), col("o_custkey") === col("c_custkey"))
          .groupBy("seg", "rel").agg(count(lit(1)).as("n_pairs"))
          .orderBy("seg", "rel")
      },
      Some("""
        WITH o AS (
          SELECT o_custkey, epoch_ms(o_orderdate) AS start_ms, o_orderkey,
                 lag(epoch_ms(o_orderdate), 1) OVER (
                   PARTITION BY o_custkey
                   ORDER BY epoch_ms(o_orderdate), o_orderkey) AS prev_start
          FROM orders)
        SELECT c.c_mktsegment AS seg,
               CASE WHEN o.start_ms = o.prev_start THEN 'same'
                    WHEN o.start_ms < o.prev_start + 604800000 THEN 'overlap'
                    WHEN o.start_ms = o.prev_start + 604800000 THEN 'meet'
                    ELSE 'gap' END AS rel,
               count(*) AS n_pairs
        FROM o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.prev_start IS NOT NULL
        GROUP BY 1, 2 ORDER BY seg, rel""")),

    // --------------------------------------------------------------- q214
    QDef("q214_fuzzy_block_match",
      (s, dir) => {
        // The r8 row-level self-join was quadratic in BLOCK SIZE, which
        // grows linearly with data under the fixed (brand, size) domain —
        // the one genuine 100 TB smell the r8 verdict flagged (17.8 s at
        // sf1, 48x for 10x rows). Names repeat heavily (64 distinct
        // p_name values; 17,714 distinct (brand,size,name) cells,
        // CONSTANT from sf0.1 to sf1), so group to the cell census first
        // and pair DISTINCT cells only, weighting by c_a*c_b (cross-cell
        // unordered {a,b} pairs) and c*(c-1)/2 (same-name pairs, d=0).
        // Exact for any corpus; levenshtein now runs once per distinct
        // name pair instead of once per row pair. (The r8 negative
        // results stand: a per-pair |len| pregate and bounded levenshtein
        // both measured slower — this removes pairs BEFORE the join.)
        val census = t(s, dir, "part")
          .groupBy("p_brand", "p_size", "p_name")
          .agg(count(lit(1)).as("c"))
        census.cache(); census.count() // 3 subtrees of one job read it
        val x = census.toDF("p_brand", "p_size", "na", "ca")
        val y = census.toDF("p_brand", "p_size", "nb", "cb")
        val cross = x.join(y, Seq("p_brand", "p_size"))
          .where(col("na") < col("nb"))
          .withColumn("d", levenshtein(col("na"), col("nb")))
          .where(col("d") <= 4)
          .select(col("p_brand"), col("d"),
            (col("ca") * col("cb")).as("w"))
        val same = census.where(col("c") >= 2)
          .select(col("p_brand"), lit(0).as("d"),
            expr("c * (c - 1) DIV 2").as("w"))
        cross.union(same)
          .groupBy("p_brand")
          .agg(sum("w").as("n_pairs"),
            sum(when(col("d") === 0, col("w")).otherwise(0L))
              .cast("bigint").as("n_exact"),
            min("d").cast("bigint").as("min_d"))
          .orderBy("p_brand")
      },
      Some("""
        SELECT a.p_brand, count(*) AS n_pairs,
               CAST(sum(CASE WHEN levenshtein(a.p_name, b.p_name) = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
               CAST(min(levenshtein(a.p_name, b.p_name)) AS BIGINT) AS min_d
        FROM part a JOIN part b
          ON a.p_brand = b.p_brand AND a.p_size = b.p_size
         AND a.p_partkey < b.p_partkey
        WHERE levenshtein(a.p_name, b.p_name) <= 4
        GROUP BY 1 ORDER BY a.p_brand"""))
  )
}
