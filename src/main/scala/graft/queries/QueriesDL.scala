package graft.queries

import graft.Tables.t
import graft.functions.{PortableHash, TextFunctions}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 109 — watermark economics,
  * backpressure simulation, multi-source reachability, LM evaluation:
  *
  *  - q455: watermark drop table — q227's simulated ingest disorder
  *    (hash-jittered arrival order), each event's lateness = running-max
  *    event time at arrival minus its own; the DECISION table: events
  *    dropped at watermark 1/5/15 min, per type. One window pass, three
  *    conditional sums (q227 profiles the distribution; this prices the
  *    candidate watermarks).
  *  - q456: bounded-buffer backpressure simulation — per type, hourly
  *    arrival series against fixed service rate c with buffer cap
  *    B = 3c: b_t = min(B, max(0, b_{t−1} + a_t − c)), drops = overflow
  *    above B. Two-sided-clamped recurrence (q124's pattern) on the
  *    secondary-sort mapPartitions path; recursive-CTE oracle. The
  *    queue-sizing companion to q312/q338/q407.
  *  -  q457: multi-source BFS hop matrix — 3 bounded rounds expand ALL
  *    top-10 hubs at once over (src, node) keys (one shuffle per round
  *    regardless of source count — the Pregel multi-source trick);
  *    output the 10×10 hub-to-hub hop matrix with −1 = unreached.
  *  - q458: held-out bigram perplexity — add-one-smoothed bigram LM
  *    trained on the 80% hash split, evaluated on the 10% test split:
  *    per-bigram −ln p floor-micro (train lookup via left join, unseen
  *    history → uniform 1/V), exact integer NLL sums, one final exp for
  *    perplexity. The held-out upgrade of q143 (train==test) beside
  *    q409's NB classifier.
  *
  * Reference analog: withWatermark sizing with a price tag, scraper
  * ingest buffering, inter-hub co-visibility distances, corpus-quality
  * scoring with a proper train/test split.
  */
object QueriesDL extends QueryPack {
  import Q._

  // NOT private: Spark codegen accesses these.
  case class SlotRow(tp: String, rn: Long, a: Long, c: Long, cap: Long)
  case class QueueOut(tp: String, slots: Long, drops: Long, maxb: Long,
                      busy: Long)

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q455
    QDef("q455_watermark_drops",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .selectExpr("event_type", s"$tsMs AS ms", "event_id")
          .withColumn("jit",
            pmod(PortableHash.md5Long(col("event_id"), salt = "wm~"),
              lit(600000L)))
          .withColumn("arr", col("ms") + col("jit"))
        val w = Window.partitionBy("event_type").orderBy("arr", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        val late = ev
          .withColumn("hwm", max("ms").over(w))
          .selectExpr("event_type",
            "CASE WHEN hwm IS NULL THEN 0 ELSE greatest(hwm - ms, 0) END AS late_by")
        late.groupBy("event_type").agg(
          count(lit(1)).cast("long").as("events"),
          sum(when(col("late_by") > 60000L, 1L).otherwise(0L))
            .cast("bigint").as("drop_1m"),
          sum(when(col("late_by") > 300000L, 1L).otherwise(0L))
            .cast("bigint").as("drop_5m"),
          sum(when(col("late_by") > 900000L, 1L).otherwise(0L))
            .cast("bigint").as("drop_15m"))
          .selectExpr("event_type", "events", "drop_1m", "drop_5m", "drop_15m",
            "drop_1m * 10000 DIV events AS drop_1m_bp",
            "drop_5m * 10000 DIV events AS drop_5m_bp")
          .orderBy("event_type")
      },
      Some(s"""
        WITH ev AS (
          SELECT event_type, epoch_ms(ts) AS ms, event_id,
                 epoch_ms(ts) + ${PortableHash.md5LongSql("event_id", "wm~")}
                   % 600000 AS arr
          FROM events),
        late AS (
          SELECT event_type,
                 CASE WHEN max(ms) OVER (PARTITION BY event_type
                        ORDER BY arr, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                      IS NULL THEN 0
                      ELSE greatest(max(ms) OVER (PARTITION BY event_type
                        ORDER BY arr, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        - ms, 0) END AS late_by
          FROM ev)
        SELECT event_type, CAST(count(*) AS BIGINT) AS events,
               CAST(sum(CASE WHEN late_by > 60000 THEN 1 ELSE 0 END)
                 AS BIGINT) AS drop_1m,
               CAST(sum(CASE WHEN late_by > 300000 THEN 1 ELSE 0 END)
                 AS BIGINT) AS drop_5m,
               CAST(sum(CASE WHEN late_by > 900000 THEN 1 ELSE 0 END)
                 AS BIGINT) AS drop_15m,
               CAST(sum(CASE WHEN late_by > 60000 THEN 1 ELSE 0 END)
                 * 10000 // count(*) AS BIGINT) AS drop_1m_bp,
               CAST(sum(CASE WHEN late_by > 300000 THEN 1 ELSE 0 END)
                 * 10000 // count(*) AS BIGINT) AS drop_5m_bp
        FROM late GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q456
    QDef("q456_backpressure",
      (s, dir) => {
        import s.implicits._
        val hourly = t(s, dir, "events")
          .selectExpr("event_type AS tp", s"($tsMs) DIV 3600000 AS slot")
          .groupBy("tp", "slot").agg(count(lit(1)).cast("long").as("a"))
        val dom = hourly.groupBy("tp").agg(
          min("slot").as("lo"), max("slot").as("hi"),
          sum("a").cast("bigint").as("tot"))
          .selectExpr("tp", "lo", "hi",
            "(tot DIV (hi - lo + 1)) + 1 AS c")
          .select(col("tp"), col("c"),
            explode(sequence(col("lo"), col("hi"))).as("slot"))
        val series = dom.join(hourly, Seq("tp", "slot"), "left")
          .selectExpr("tp", "slot", "coalesce(a, 0) AS a", "c", "3 * c AS cap")
          .withColumn("rn", row_number().over(Window.partitionBy("tp")
            .orderBy("slot")).cast("long"))
          .select(col("tp"), col("rn"), col("a"), col("c"), col("cap"))
          .as[SlotRow]
        series.repartition(col("tp")).sortWithinPartitions("tp", "rn")
          .mapPartitions { it =>
            val out = scala.collection.mutable.ArrayBuffer.empty[QueueOut]
            var cur: String = null
            var b = 0L; var slots = 0L; var drops = 0L
            var maxb = 0L; var busy = 0L
            def flush(): Unit =
              if (cur != null) out += QueueOut(cur, slots, drops, maxb, busy)
            it.foreach { r =>
              if (r.tp != cur) {
                flush(); cur = r.tp
                b = 0; slots = 0; drops = 0; maxb = 0; busy = 0
              }
              slots += 1
              val raw = b + r.a - r.c
              val bounded = math.max(0L, raw)
              drops += math.max(0L, bounded - r.cap)
              b = math.min(r.cap, bounded)
              if (b > maxb) maxb = b
              if (b > 0) busy += 1
            }
            flush()
            out.iterator
          }.toDF()
          .selectExpr("tp AS event_type", "slots", "drops", "maxb AS max_buffer",
            "busy AS busy_slots")
          .orderBy("event_type")
      },
      Some("""
        WITH RECURSIVE hourly AS MATERIALIZED (
          SELECT event_type AS tp, epoch_ms(ts) // 3600000 AS slot,
                 CAST(count(*) AS BIGINT) AS a
          FROM events GROUP BY 1, 2),
        dom AS MATERIALIZED (
          SELECT tp, lo, hi, (tot // (hi - lo + 1)) + 1 AS c
          FROM (SELECT tp, min(slot) AS lo, max(slot) AS hi, sum(a) AS tot
                FROM hourly GROUP BY 1)),
        gs AS MATERIALIZED (
          SELECT unnest(range((SELECT min(lo) FROM dom),
                              (SELECT max(hi) FROM dom) + 1)) AS s),
        series AS MATERIALIZED (
          SELECT dom.tp, gs.s AS slot, coalesce(hourly.a, 0) AS a, c,
                 3 * c AS cap,
                 row_number() OVER (PARTITION BY dom.tp ORDER BY gs.s) AS rn
          FROM dom JOIN gs ON gs.s BETWEEN dom.lo AND dom.hi
          LEFT JOIN hourly ON hourly.tp = dom.tp AND hourly.slot = gs.s),
        maxs AS MATERIALIZED (SELECT tp, max(rn) AS ns FROM series GROUP BY 1),
        rec AS (
          SELECT tp, CAST(0 AS BIGINT) AS rn, CAST(0 AS BIGINT) AS b,
                 CAST(0 AS BIGINT) AS drops, CAST(0 AS BIGINT) AS maxb,
                 CAST(0 AS BIGINT) AS busy
          FROM maxs
          UNION ALL
          SELECT r.tp, r.rn + 1,
                 least(s.cap, greatest(0, r.b + s.a - s.c)) AS b,
                 r.drops + greatest(0,
                   greatest(0, r.b + s.a - s.c) - s.cap) AS drops,
                 greatest(r.maxb,
                   least(s.cap, greatest(0, r.b + s.a - s.c))) AS maxb,
                 r.busy + CASE WHEN
                   least(s.cap, greatest(0, r.b + s.a - s.c)) > 0
                   THEN 1 ELSE 0 END AS busy
          FROM rec r JOIN series s ON s.tp = r.tp AND s.rn = r.rn + 1)
        SELECT rec.tp AS event_type, CAST(rec.rn AS BIGINT) AS slots,
               CAST(drops AS BIGINT) AS drops,
               CAST(maxb AS BIGINT) AS max_buffer,
               CAST(busy AS BIGINT) AS busy_slots
        FROM rec JOIN maxs ON rec.tp = maxs.tp AND rec.rn = maxs.ns
        ORDER BY event_type""")),

    // --------------------------------------------------------------- q457
    QDef("q457_hub_matrix",
      (s, dir) => {
        val e = t(s, dir, "lineitem")
          // basket-array pair build (q140/q390 pattern): one collect_set
          // shuffle, pairs map-side from the <=7-part sorted basket
          .groupBy(col("l_orderkey"))
          .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
          .select(explode(expr(
            """flatten(transform(ps, (x, i) ->
               transform(slice(ps, i + 2, size(ps)), y -> struct(x AS a, y AS b))))"""))
            .as("pr"))
          .select(col("pr.a").as("a"), col("pr.b").as("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("cnt"))
          .where(col("cnt") >= 2).select("a", "b")
        e.cache()
        val nEdges = e.count()
        if (nEdges <= 2000000L) {
          // dual-path (the q428/q216 recipe, r10 verdict #6): the
          // repeat-pair census is orders of magnitude smaller than
          // lineitem, so hub selection AND all 10 3-hop BFS expansions
          // run driver-side over the collected edge list — one job
          // instead of 3 × (join + distinct + anti-join + checkpoint)
          // shuffle rounds of pure job floor. Output is exactly 100 rows.
          val half = e.collect().map(r => (r.getLong(0), r.getLong(1)))
          val adjM = (half ++ half.map(_.swap)).groupMap(_._1)(_._2)
          val hubs = adjM.toSeq.map { case (u, vs) => (u, vs.size) }
            .sortBy { case (u, d) => (-d, u) }.take(10).map(_._1)
          val hops: Map[Long, scala.collection.Map[Long, Long]] =
            hubs.map { src =>
              val hop = scala.collection.mutable.Map(src -> 0L)
              var frontier: Seq[Long] = Seq(src)
              for (h <- 1 to 3) {
                frontier = frontier
                  .flatMap(v => adjM.getOrElse(v, Array.empty[Long]))
                  .distinct.filterNot(v => hop.contains(v))
                frontier.foreach(v => hop(v) = h.toLong)
              }
              src -> hop
            }.toMap
          val sc2 = s
          import sc2.implicits._
          (for (src <- hubs; dst <- hubs)
            yield (src, dst, hops(src).getOrElse(dst, -1L)))
            .sortBy(t => (t._1, t._2))
            .toDF("src", "dst", "hop")
        } else {
          // scale fallback: the multi-source Pregel expansion (one
          // shuffle per round regardless of source count)
          val adj = e.select(col("a").as("u"), col("b").as("v"))
            .union(e.select(col("b").as("u"), col("a").as("v")))
          adj.cache(); adj.count()
          val hubs = adj.groupBy("u").agg(count(lit(1)).as("deg"))
            .orderBy(col("deg").desc, col("u")).limit(10)
            .select(col("u").as("h")).localCheckpoint()
          var dist = hubs.select(col("h").as("src"), col("h").as("node"),
            lit(0L).as("hop"))
          for (hp <- 1 to 3) {
            val nxt = dist.where(col("hop") === (hp - 1))
              .withColumnRenamed("node", "u").join(adj, Seq("u"))
              .select(col("src"), col("v").as("cand")).distinct()
              .join(dist.select(col("src").as("s2"), col("node")),
                col("src") === col("s2") && col("cand") === col("node"),
                "left_anti")
              .select(col("src"), col("cand").as("node"),
                lit(hp.toLong).as("hop"))
            dist = dist.union(nxt).localCheckpoint()
          }
          hubs.select(col("h").as("src"))
            .crossJoin(hubs.select(col("h").as("dst")))
            .join(dist.select(col("src").as("s3"), col("node"), col("hop")),
              col("src") === col("s3") && col("dst") === col("node"), "left")
            .selectExpr("src", "dst", "coalesce(hop, -1) AS hop")
            .orderBy("src", "dst")
        }
      },
      Some("""
        WITH lp AS MATERIALIZED (
          SELECT DISTINCT l_orderkey AS ok, l_partkey FROM lineitem),
        e AS MATERIALIZED (
          SELECT a.l_partkey AS a, b.l_partkey AS b
          FROM lp a JOIN lp b ON a.ok = b.ok AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= 2),
        adj AS MATERIALIZED (
          SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
        hubs AS MATERIALIZED (
          SELECT u AS h FROM (SELECT u, count(*) AS deg FROM adj GROUP BY 1)
          ORDER BY deg DESC, u LIMIT 10),
        d0 AS MATERIALIZED (
          SELECT h AS src, h AS node, CAST(0 AS BIGINT) AS hop FROM hubs),
        x1 AS MATERIALIZED (
          SELECT DISTINCT d.src, adj.v AS node FROM d0 d
          JOIN adj ON d.node = adj.u WHERE d.hop = 0),
        d1 AS MATERIALIZED (
          SELECT src, node, min(hop) AS hop FROM (
            SELECT src, node, hop FROM d0
            UNION ALL
            SELECT x1.src, x1.node, 1 FROM x1
            WHERE NOT EXISTS (SELECT 1 FROM d0
              WHERE d0.src = x1.src AND d0.node = x1.node))
          GROUP BY 1, 2),
        x2 AS MATERIALIZED (
          SELECT DISTINCT d.src, adj.v AS node FROM d1 d
          JOIN adj ON d.node = adj.u WHERE d.hop = 1),
        d2 AS MATERIALIZED (
          SELECT src, node, min(hop) AS hop FROM (
            SELECT src, node, hop FROM d1
            UNION ALL
            SELECT x2.src, x2.node, 2 FROM x2
            WHERE NOT EXISTS (SELECT 1 FROM d1
              WHERE d1.src = x2.src AND d1.node = x2.node))
          GROUP BY 1, 2),
        x3 AS MATERIALIZED (
          SELECT DISTINCT d.src, adj.v AS node FROM d2 d
          JOIN adj ON d.node = adj.u WHERE d.hop = 2),
        d3 AS MATERIALIZED (
          SELECT src, node, min(hop) AS hop FROM (
            SELECT src, node, hop FROM d2
            UNION ALL
            SELECT x3.src, x3.node, 3 FROM x3
            WHERE NOT EXISTS (SELECT 1 FROM d2
              WHERE d2.src = x3.src AND d2.node = x3.node))
          GROUP BY 1, 2)
        SELECT a.h AS src, b.h AS dst,
               CAST(coalesce(d3.hop, -1) AS BIGINT) AS hop
        FROM hubs a CROSS JOIN hubs b
        LEFT JOIN d3 ON d3.src = a.h AND d3.node = b.h
        ORDER BY src, dst""")),

    // --------------------------------------------------------------- q458
    QDef("q458_heldout_perplexity",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .withColumn("h", pmod(PortableHash.md5Long(col("doc_id"),
            salt = "split~"), lit(100L)))
        def bigrams(df: org.apache.spark.sql.DataFrame) = df
          .withColumn("w", TextFunctions.words(col("text")))
          .where(size(col("w")) >= 2)
          .select(col("lang"),
            explode(expr("transform(sequence(0, size(w) - 2), i -> struct(w[i] AS w1, w[i+1] AS w2))")).as("bg"))
          .select(col("lang"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        val train = bigrams(docs.where(col("h") < 80))
        val test = bigrams(docs.where(col("h") >= 90))
        val c2 = train.groupBy("lang", "w1", "w2")
          .agg(count(lit(1)).cast("bigint").as("c2"))
        val c1 = c2.groupBy("lang", "w1").agg(sum("c2").cast("bigint").as("c1"))
        val vocab = train.select(col("lang"), col("w2")).distinct()
          .groupBy("lang").agg(count(lit(1)).cast("bigint").as("v"))
        val scored = test
          .join(c2, Seq("lang", "w1", "w2"), "left")
          .join(c1, Seq("lang", "w1"), "left")
          .join(vocab, "lang")
          .selectExpr("lang",
            "CAST(floor(-ln((CAST(coalesce(c2, 0) + 1 AS DOUBLE)) / (CAST(coalesce(c1, 0) + v AS DOUBLE))) * 1e6) AS BIGINT) AS nll")
        scored.groupBy("lang").agg(
          count(lit(1)).cast("long").as("m"),
          sum("nll").cast("bigint").as("sum_nll_micro"))
          .selectExpr("lang", "m", "sum_nll_micro",
            "sum_nll_micro DIV m AS avg_nll_micro",
            "CAST(floor(exp(CAST(sum_nll_micro DIV m AS DOUBLE) / 1e6) * 1000) AS BIGINT) AS ppl_milli")
          .orderBy("lang")
      },
      Some(s"""
        WITH docs AS (
          SELECT doc_id, lang, text,
                 ${PortableHash.md5LongSql("doc_id", "split~")} % 100 AS h
          FROM documents),
        trw AS (SELECT lang, ${TextFunctions.wordsSql("text")} AS w
                FROM docs WHERE h < 80),
        tew AS (SELECT lang, ${TextFunctions.wordsSql("text")} AS w
                FROM docs WHERE h >= 90),
        train AS (
          SELECT lang, w[i] AS w1, w[i + 1] AS w2
          FROM trw, unnest(range(1, len(w))) AS t(i)
          WHERE len(w) >= 2),
        test AS (
          SELECT lang, w[i] AS w1, w[i + 1] AS w2
          FROM tew, unnest(range(1, len(w))) AS t(i)
          WHERE len(w) >= 2),
        c2 AS (SELECT lang, w1, w2, count(*) AS c2 FROM train GROUP BY 1, 2, 3),
        c1 AS (SELECT lang, w1, sum(c2) AS c1 FROM c2 GROUP BY 1, 2),
        vocab AS (SELECT lang, count(DISTINCT w2) AS v FROM train GROUP BY 1),
        scored AS (
          SELECT test.lang,
                 CAST(floor(-ln((CAST(coalesce(c2.c2, 0) + 1 AS DOUBLE))
                   / (CAST(coalesce(c1.c1, 0) + v AS DOUBLE))) * 1e6)
                   AS BIGINT) AS nll
          FROM test
          LEFT JOIN c2 ON test.lang = c2.lang AND test.w1 = c2.w1
                      AND test.w2 = c2.w2
          LEFT JOIN c1 ON test.lang = c1.lang AND test.w1 = c1.w1
          JOIN vocab ON test.lang = vocab.lang)
        SELECT lang, CAST(count(*) AS BIGINT) AS m,
               CAST(sum(nll) AS BIGINT) AS sum_nll_micro,
               CAST(sum(nll) // count(*) AS BIGINT) AS avg_nll_micro,
               CAST(floor(exp(CAST(sum(nll) // count(*) AS DOUBLE) / 1e6)
                 * 1000) AS BIGINT) AS ppl_milli
        FROM scored GROUP BY 1 ORDER BY 1"""))
  )
}
