package graft.queries

import graft.Tables.t
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 130 — makespan scheduling, corpus
  * compressibility, training-batch economics, uplift readout:
  *
  *  - q534: LPT (longest-processing-time) scheduling of the 200
  *    part-group durations onto 4 workers: sort desc, assign each task
  *    to the least-loaded worker (ties → lowest worker id), report
  *    per-worker loads, makespan, the two classic lower bounds and the
  *    ratio (LPT guarantees ≤ 4/3·OPT). One bounded task in Spark;
  *    recursive CTE carrying the 4-element load LIST in DuckDB.
  *  - q535: corpus compressibility audit per source: character unigram
  *    entropy H0 vs bigram conditional entropy H1 in floor-micro nats
  *    (per-term quantization → exact integer sums over the bounded
  *    alphabet), compressibility = (H0−H1)/H0 bp. Positions are
  *    exploded from sequence() — never explode(substr-array) (the
  *    generator-inlining gotcha).
  *  - q536: attention padding-waste planner: fixed batches of 8 docs,
  *    padded cost n·Lmax² vs packed cost ΣL² (block-diagonal
  *    attention), token padding waste — the "why sequence packing
  *    matters" economics behind q321's packer.
  *  - q537: two-model uplift readout per market segment: treatment =
  *    customer-key parity, outcome = ordered within the last year of
  *    the data; uplift bp + pooled two-proportion z floor-milli.
  *
  * Scale shapes: q534 aggregates to the bounded 200-task domain before
  * the sequential assignment; q535/q536 are hash aggregations over
  * exploded positions / per-doc rows; q537 is join + conditional sums.
  */
object QueriesEG extends QueryPack {
  import Q._

  // NOT private: Spark's generated (de)serializer code must access these.
  case class LptTask(tid: Long, dur: Long)
  case class LptOut(worker: Long, n_tasks: Long, load: Long,
      makespan: Long, lower_bound: Long, ratio_bp: Long)

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q534
    QDef("q534_lpt_makespan",
      (s, dir) => {
        import s.implicits._
        val tasks = t(s, dir, "lineitem")
          .selectExpr("l_partkey % 200 AS tid",
            "CAST(floor(l_quantity + 0.5) AS BIGINT) AS q")
          .groupBy("tid").agg(sum("q").cast("long").as("dur"))
          .as[LptTask]
        tasks.coalesce(1)
          .sortWithinPartitions(col("dur").desc, col("tid"))
          .mapPartitions { it =>
            val arr = it.toArray
            if (arr.isEmpty) Iterator.empty
            else {
              val loads = Array.fill(4)(0L)
              val counts = Array.fill(4)(0L)
              arr.foreach { tk =>
                var w = 0
                for (k <- 1 until 4) if (loads(k) < loads(w)) w = k
                loads(w) += tk.dur; counts(w) += 1
              }
              val makespan = loads.max
              val total = arr.map(_.dur).sum
              val lb = math.max((total + 3) / 4, arr.map(_.dur).max)
              (0 until 4).iterator.map { w =>
                LptOut(w.toLong, counts(w), loads(w), makespan, lb,
                  makespan * 10000L / lb)
              }
            }
          }
          .toDF()
          .orderBy("worker")
      },
      Some("""
        WITH RECURSIVE tasks AS (
          SELECT l_partkey % 200 AS tid,
                 CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
                   AS dur
          FROM lineitem GROUP BY 1),
        r AS (
          SELECT tid, dur,
                 row_number() OVER (ORDER BY dur DESC, tid) AS rn,
                 count(*) OVER () AS cnt
          FROM tasks),
        b AS (
          SELECT 0 AS rn,
                 [CAST(0 AS BIGINT), 0, 0, 0] AS loads,
                 [CAST(0 AS BIGINT), 0, 0, 0] AS counts
          FROM (SELECT 1) WHERE (SELECT count(*) FROM tasks) > 0
          UNION ALL
          SELECT z.rn,
                 list_transform(range(1, 5), k ->
                   CASE WHEN k = z.wi THEN z.loads[k] + z.dur
                        ELSE z.loads[k] END),
                 list_transform(range(1, 5), k ->
                   CASE WHEN k = z.wi THEN z.counts[k] + 1
                        ELSE z.counts[k] END)
          FROM (
            SELECT r.rn, r.dur, b.loads, b.counts,
                   list_position(b.loads, list_min(b.loads)) AS wi
            FROM b JOIN r ON r.rn = b.rn + 1) z),
        fin AS (
          SELECT loads, counts FROM b
          WHERE rn = (SELECT max(rn) FROM b)),
        stats AS (
          SELECT CAST(list_max(f.loads) AS BIGINT) AS makespan,
                 greatest((SELECT (sum(dur) + 3) // 4 FROM tasks),
                          (SELECT max(dur) FROM tasks)) AS lb
          FROM fin f)
        SELECT CAST(t.k - 1 AS BIGINT) AS worker,
               CAST(f.counts[t.k] AS BIGINT) AS n_tasks,
               CAST(f.loads[t.k] AS BIGINT) AS load,
               s.makespan, CAST(s.lb AS BIGINT) AS lower_bound,
               CAST(s.makespan * 10000 // s.lb AS BIGINT) AS ratio_bp
        FROM fin f, stats s, (SELECT unnest(range(1, 5)) AS k) t
        ORDER BY worker""")),

    // --------------------------------------------------------------- q535
    QDef("q535_char_entropy",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .where(col("text").isNotNull && length(col("text")) >= 2)
          .select(col("source"), col("text"))
        // ONE O(len) pass per doc: zip the char array with its shift
        // (zip_with null-pads the shorter side, so every char appears
        // exactly once as c1, the doc's last char with c2 = NULL). The
        // aggregated (c1, c2) table is tiny (alphabet² × sources) and
        // yields unigram counts as its c1-marginals — the prior
        // explode(sequence)+substring(text,i,1) idiom re-scanned the
        // string per position (O(len²) per doc; r5 verdict weak-list #2)
        // the aggregated (source, c1, c2) census is tiny (alphabet² ×
        // sources) — collect it and finish both entropy passes driver-
        // side: per-row terms replicate the engine expression bit-for-bit
        // (same IEEE double ops in the same order, java.lang.Math.log =
        // Spark's ln), and the summed terms are already-floored integers,
        // so the finish is order-insensitive. One Spark job instead of an
        // eager count + a two-window assembly job (r7 verdict: q535 was
        // floor-bound on two bounded agg passes).
        val pairs = {
          // census generation: one imperative code-point pass per doc into
          // a per-partition hash map (map-side pre-aggregation — the
          // shuffle carries ≤ alphabet²×sources rows per partition). The
          // previous explode(zip_with(split(text,''), …)) build allocated
          // a struct per character position (r8: 10.9 s at sf1); same
          // census, same NULL-padded last char. codePointAt (not charAt)
          // so the census counts CHARACTERS like the oracle's split() —
          // charAt would split surrogate pairs on non-BMP text (r8
          // advice); identical on the ASCII corpus.
          val sc0 = s
          import sc0.implicits._
          d.select(col("source"), col("text")).as[(String, String)]
            .mapPartitions { it =>
              val m = scala.collection.mutable.HashMap
                .empty[(String, Int, Int), Long]
              it.foreach { case (src, text) =>
                var i = 0
                val n = text.length
                while (i < n) {
                  val cp = text.codePointAt(i)
                  val j = i + Character.charCount(cp)
                  val k = (src, cp, if (j < n) text.codePointAt(j) else -1)
                  m.update(k, m.getOrElse(k, 0L) + 1L)
                  i = j
                }
              }
              m.iterator.map { case ((src, a, b), cnt) =>
                (src, new String(Character.toChars(a)),
                  if (b < 0) null else new String(Character.toChars(b)), cnt)
              }
            }
            .toDF("source", "c1", "c2", "n12p")
            .groupBy("source", "c1", "c2")
            .agg(sum("n12p").cast("long").as("n12c"))
            .collect()
            .map(r => (r.getAs[String]("source"), r.getAs[String]("c1"),
              Option(r.getAs[String]("c2")), r.getAs[Long]("n12c")))
        }
        // StrictMath.log — Spark's Log expression delegates to it, and
        // Math.log may pick a platform intrinsic that differs by 1 ulp
        def term(n: Long, tot: Long, ctx: Long): Long =
          math.floor(n.toDouble / tot *
            StrictMath.log(ctx.toDouble / n) * 1000000).toLong
        val out = pairs.groupBy(_._1).toSeq.map { case (source, rows) =>
          // unigram marginals over c1 (the last char appears with c2=NULL,
          // so every char is counted exactly once)
          val uni = rows.groupBy(_._2).map { case (_, rs) => rs.map(_._4).sum }
          val tot = uni.sum
          val alpha = uni.size.toLong
          val h0 = uni.iterator.map(cnt => term(cnt, tot, tot)).sum
          val big = rows.filter(_._3.isDefined)
          val n1 = big.groupBy(_._2).map { case (c1, rs) =>
            c1 -> rs.map(_._4).sum }
          val totb = big.map(_._4).sum
          val h1 = big.iterator
            .map { case (_, c1, _, n12) => term(n12, totb, n1(c1)) }.sum
          (source, tot, alpha, h0, h1)
        }
        val sc = s
        import sc.implicits._
        out.filter(_._4 > 0)
          .map { case (source, tot, alpha, h0, h1) =>
            (source, tot, alpha, h0, h1, (h0 - h1) * 10000 / h0)
          }.sortBy(r => Option(r._1)) // null-safe: injected NULL source rows sort first (row order is cosmetic — the compare canonicalizes)
          .toDF("source", "n_chars", "alpha_size",
            "h0_micro", "h1_micro", "compress_bp")
      },
      Some("""
        WITH d AS (
          SELECT source, text FROM documents
          WHERE text IS NOT NULL AND length(text) >= 2),
        uni AS (
          SELECT source, substring(text, i, 1) AS c,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM d, unnest(range(1, length(text) + 1)) AS u(i)
          GROUP BY 1, 2),
        unitot AS (
          SELECT source, CAST(sum(cnt) AS BIGINT) AS tot,
                 CAST(count(*) AS BIGINT) AS alpha
          FROM uni GROUP BY 1),
        h0 AS (
          SELECT u.source, t.tot, t.alpha,
                 CAST(sum(CAST(floor(CAST(u.cnt AS DOUBLE) / t.tot
                   * ln(CAST(t.tot AS DOUBLE) / u.cnt) * 1000000)
                   AS BIGINT)) AS BIGINT) AS h0_micro
          FROM uni u JOIN unitot t ON u.source = t.source
          GROUP BY 1, 2, 3),
        big AS (
          SELECT source, substring(text, i, 1) AS c1,
                 substring(text, i + 1, 1) AS c2,
                 CAST(count(*) AS BIGINT) AS n12
          FROM d, unnest(range(1, length(text))) AS u(i)
          GROUP BY 1, 2, 3),
        ctx AS (
          SELECT source, c1, CAST(sum(n12) AS BIGINT) AS n1
          FROM big GROUP BY 1, 2),
        bigtot AS (
          SELECT source, CAST(sum(n12) AS BIGINT) AS totb
          FROM big GROUP BY 1),
        h1 AS (
          SELECT b.source,
                 CAST(sum(CAST(floor(CAST(b.n12 AS DOUBLE) / bt.totb
                   * ln(CAST(x.n1 AS DOUBLE) / b.n12) * 1000000)
                   AS BIGINT)) AS BIGINT) AS h1_micro
          FROM big b
          JOIN ctx x ON b.source = x.source AND b.c1 = x.c1
          JOIN bigtot bt ON b.source = bt.source
          GROUP BY 1)
        SELECT h0.source, h0.tot AS n_chars, h0.alpha AS alpha_size,
               h0.h0_micro, h1.h1_micro,
               (h0.h0_micro - h1.h1_micro) * 10000 // h0.h0_micro
                 AS compress_bp
        FROM h0 JOIN h1 ON h0.source = h1.source
        WHERE h0.h0_micro > 0
        ORDER BY h0.source""")),

    // --------------------------------------------------------------- q536
    QDef("q536_padding_waste",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .where(col("text").isNotNull)
          .withColumn("len", size(words(col("text"))))
          .where(col("len") >= 1)
          .selectExpr("doc_id DIV 8 AS batch", "len")
        val batches = docs.groupBy("batch").agg(
          count(lit(1)).as("n"),
          max("len").cast("long").as("lmax"),
          sum("len").cast("long").as("sl"),
          sum(expr("CAST(len AS BIGINT) * len")).cast("long").as("sl2"))
        batches.agg(
            count(lit(1)).as("n_batches"),
            sum(expr("n * lmax * lmax")).cast("long").as("pad_cost"),
            sum("sl2").cast("long").as("pack_cost"),
            sum(expr("n * lmax")).cast("long").as("pad_tokens"),
            sum("sl").cast("long").as("real_tokens"))
          .where(expr("pad_cost > 0 AND pad_tokens > 0"))
          .selectExpr("n_batches", "pad_cost", "pack_cost", "real_tokens",
            "(pad_cost - pack_cost) * 10000 DIV pad_cost AS attn_savings_bp",
            "(pad_tokens - real_tokens) * 10000 DIV pad_tokens AS token_waste_bp")
      },
      Some(s"""
        WITH docs AS (
          SELECT doc_id // 8 AS batch, len FROM (
            SELECT doc_id, len(${wordsSql("text")}) AS len
            FROM documents WHERE text IS NOT NULL)
          WHERE len >= 1),
        batches AS (
          SELECT batch, CAST(count(*) AS BIGINT) AS n,
                 CAST(max(len) AS BIGINT) AS lmax,
                 CAST(sum(len) AS BIGINT) AS sl,
                 CAST(sum(CAST(len AS BIGINT) * len) AS BIGINT) AS sl2
          FROM docs GROUP BY 1),
        c AS (
          SELECT CAST(count(*) AS BIGINT) AS n_batches,
                 CAST(sum(n * lmax * lmax) AS BIGINT) AS pad_cost,
                 CAST(sum(sl2) AS BIGINT) AS pack_cost,
                 CAST(sum(n * lmax) AS BIGINT) AS pad_tokens,
                 CAST(sum(sl) AS BIGINT) AS real_tokens
          FROM batches)
        SELECT n_batches, pad_cost, pack_cost, real_tokens,
               (pad_cost - pack_cost) * 10000 // pad_cost AS attn_savings_bp,
               (pad_tokens - real_tokens) * 10000 // pad_tokens
                 AS token_waste_bp
        FROM c WHERE pad_cost > 0 AND pad_tokens > 0""")),

    // --------------------------------------------------------------- q537
    QDef("q537_uplift_segments",
      (s, dir) => {
        val cutoff = t(s, dir, "orders").agg(
          (max(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))")) -
            lit(31536000000L)).as("cut"))
        val conv = t(s, dir, "orders")
          .crossJoin(broadcast(cutoff))
          .where(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) >= cut"))
          .select(col("o_custkey").as("ck")).distinct()
          .withColumn("conv", lit(1L))
        t(s, dir, "customer")
          .where(col("c_mktsegment").isNotNull)
          .join(conv, col("c_custkey") === col("ck"), "left")
          .selectExpr("c_mktsegment AS segment", "c_custkey % 2 AS g",
            "coalesce(conv, 0L) AS y")
          .groupBy("segment").agg(
            sum(when(col("g") === 1, 1L).otherwise(0L)).as("n1"),
            sum(when(col("g") === 1, col("y")).otherwise(0L)).cast("long").as("x1"),
            sum(when(col("g") === 0, 1L).otherwise(0L)).as("n0"),
            sum(when(col("g") === 0, col("y")).otherwise(0L)).cast("long").as("x0"))
          .where(expr("n1 > 0 AND n0 > 0 AND x1 + x0 > 0 AND x1 + x0 < n1 + n0"))
          .selectExpr("segment", "n1", "x1", "n0", "x0",
            "x1 * 10000 DIV n1 - x0 * 10000 DIV n0 AS uplift_bp",
            """CAST(floor((CAST(x1 AS DOUBLE) / n1 - CAST(x0 AS DOUBLE) / n0)
                 / sqrt(CAST(x1 + x0 AS DOUBLE) / (n1 + n0)
                   * (1 - CAST(x1 + x0 AS DOUBLE) / (n1 + n0))
                   * (1.0 / n1 + 1.0 / n0)) * 1000) AS BIGINT) AS z_milli""")
          .orderBy("segment")
      },
      Some("""
        WITH cutoff AS (
          SELECT max(epoch_ms(o_orderdate)) - 31536000000 AS cut FROM orders),
        conv AS (
          SELECT DISTINCT o_custkey AS ck FROM orders, cutoff
          WHERE epoch_ms(o_orderdate) >= cut),
        lab AS (
          SELECT c.c_mktsegment AS segment, c.c_custkey % 2 AS g,
                 CASE WHEN conv.ck IS NOT NULL THEN 1 ELSE 0 END AS y
          FROM customer c LEFT JOIN conv ON c.c_custkey = conv.ck
          WHERE c.c_mktsegment IS NOT NULL),
        agg AS (
          SELECT segment,
                 CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                 CAST(sum(CASE WHEN g = 1 THEN y ELSE 0 END) AS BIGINT) AS x1,
                 CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
                 CAST(sum(CASE WHEN g = 0 THEN y ELSE 0 END) AS BIGINT) AS x0
          FROM lab GROUP BY 1)
        SELECT segment, n1, x1, n0, x0,
               x1 * 10000 // n1 - x0 * 10000 // n0 AS uplift_bp,
               CAST(floor((CAST(x1 AS DOUBLE) / n1 - CAST(x0 AS DOUBLE) / n0)
                 / sqrt(CAST(x1 + x0 AS DOUBLE) / (n1 + n0)
                   * (1 - CAST(x1 + x0 AS DOUBLE) / (n1 + n0))
                   * (1.0 / n1 + 1.0 / n0)) * 1000) AS BIGINT) AS z_milli
        FROM agg
        WHERE n1 > 0 AND n0 > 0 AND x1 + x0 > 0 AND x1 + x0 < n1 + n0
        ORDER BY segment"""))
  )
}
