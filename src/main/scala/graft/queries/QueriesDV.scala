package graft.queries

import graft.Tables.t
import graft.functions.PortableHash
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 119 — class balancing, process
  * entropy, tail-based trace sampling, CRDT convergence:
  *
  *  - q495: class-balanced downsampling — every language reduced to the
  *    minority class count by deterministic portable-hash rank (the
  *    reproducible undersampler): per-class kept/dropped accounting
  *    with the balance proven in-output. The class-imbalance side of
  *    q86/q302's samplers.
  *  - q496: Markov entropy rate — H = −Σᵢ πᵢ Σⱼ p_ij ln p_ij over the
  *    event-type transition matrix with π approximated by q417's third
  *    power step: per-state row entropies (floor-micro nats from
  *    integer-micro probabilities) and the π-weighted rate. How
  *    predictable is the scrape-surface stream.
  *  - q497: tail-based trace sampling — (user, day) traces kept when
  *    they contain an error OR their event count reaches the exact-rank
  *    p95, else a 10% hash sample: per-type event volume kept/dropped
  *    and the retention of error traces (always 100%). The
  *    observability-pipeline shape: head sampling loses the tail, this
  *    keeps it by construction.
  *  - q498: G-counter CRDT convergence — events hash to 4 counter
  *    nodes; 3 replicas hold stale per-node counts (hash-staggered sync
  *    horizons); the CRDT merge (elementwise MAX) dominates every
  *    replica and never exceeds truth: per-node truth, merged value,
  *    residual lag. The eventual-consistency algebra under q99's
  *    anti-entropy checksums.
  *
  * Reference analog: balanced review corpora, harvest-stream
  * predictability, scraper-log retention policy, distributed task
  * counters under gossip.
  */
object QueriesDV extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q495
    QDef("q495_class_balance",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .withColumn("hr", PortableHash.md5Long(col("doc_id"),
            salt = "bal~"))
        val minC = docs.groupBy("lang").agg(count(lit(1)).as("c"))
          .agg(min("c").cast("long").as("target"))
        docs.crossJoin(broadcast(minC))
          .withColumn("rk", row_number().over(Window.partitionBy("lang")
            .orderBy("hr", "doc_id")).cast("long"))
          .groupBy("lang").agg(
            count(lit(1)).cast("long").as("n"),
            max("target").as("target"),
            sum(when(col("rk") <= col("target"), 1L).otherwise(0L))
              .cast("bigint").as("kept"),
            sum(when(col("rk") <= col("target"),
              col("n_chars")).otherwise(0L)).cast("bigint").as("kept_chars"))
          .selectExpr("lang", "n", "target", "kept", "n - kept AS dropped",
            "kept_chars")
          .orderBy("lang")
      },
      Some(s"""
        WITH docs AS (
          SELECT doc_id, lang, n_chars,
                 ${PortableHash.md5LongSql("doc_id", "bal~")} AS hr
          FROM documents),
        minc AS (
          SELECT min(c) AS target FROM (
            SELECT lang, count(*) AS c FROM docs GROUP BY 1)),
        rk AS (
          SELECT lang, n_chars,
                 row_number() OVER (PARTITION BY lang ORDER BY hr, doc_id)
                   AS rk,
                 (SELECT target FROM minc) AS target
          FROM docs)
        SELECT lang, CAST(count(*) AS BIGINT) AS n,
               CAST(max(target) AS BIGINT) AS target,
               CAST(sum(CASE WHEN rk <= target THEN 1 ELSE 0 END) AS BIGINT)
                 AS kept,
               CAST(count(*) - sum(CASE WHEN rk <= target THEN 1 ELSE 0 END)
                 AS BIGINT) AS dropped,
               CAST(sum(CASE WHEN rk <= target THEN n_chars ELSE 0 END)
                 AS BIGINT) AS kept_chars
        FROM rk GROUP BY 1 ORDER BY lang""")),

    // --------------------------------------------------------------- q496
    QDef("q496_entropy_rate",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .selectExpr("user_id", s"$tsMs AS ms", "event_id", "event_type")
        val w = Window.partitionBy("user_id").orderBy("ms", "event_id")
        val trans = ev.withColumn("nxt", lead("event_type", 1).over(w))
          .where(col("nxt").isNotNull)
          .groupBy(col("event_type").as("f"), col("nxt").as("tt"))
          .agg(count(lit(1)).as("c"))
        val p = trans
          .withColumn("rs", sum("c").over(Window.partitionBy("f")))
          .selectExpr("f", "tt", "c * 1000000 DIV rs AS pr")
        // stationary approx: three power steps from uniform (q417)
        val states = p.select(col("f").as("st")).distinct()
        val nSt = broadcast(states.agg(count(lit(1)).as("ns")))
        var v = states.crossJoin(nSt).selectExpr("st", "1000000 DIV ns AS m")
        for (_ <- 1 to 3) {
          v = v.as("v").join(p.as("pp"), col("v.st") === col("pp.f"))
            .groupBy(col("pp.tt").as("stN"))
            .agg(sum(col("v.m") * col("pp.pr")).cast("bigint").as("num"))
            .selectExpr("stN AS st", "num DIV 1000000 AS m")
        }
        val rowH = p.where(col("pr") > 0)
          .selectExpr("f",
            "CAST(floor(-(CAST(pr AS DOUBLE) / 1e6) * ln(CAST(pr AS DOUBLE) / 1e6) * 1e6) AS BIGINT) AS term")
          .groupBy("f").agg(sum("term").cast("bigint").as("h_micro"))
        val joined = rowH.join(v.withColumnRenamed("st", "f"), "f")
        val rate = joined.agg(
          sum(expr("m * h_micro")).cast("bigint").as("num"))
          .selectExpr("num DIV 1000000 AS rate_micro")
        joined.crossJoin(broadcast(rate))
          .selectExpr("f", "h_micro", "m AS pi_micro", "rate_micro")
          .orderBy("f")
      },
      Some("""
        WITH ev AS (
          SELECT user_id, epoch_ms(ts) AS ms, event_id, event_type
          FROM events),
        tr AS (
          SELECT event_type AS f,
                 lead(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ms, event_id) AS tt
          FROM ev),
        c AS (SELECT f, tt, count(*) AS c FROM tr WHERE tt IS NOT NULL
              GROUP BY 1, 2),
        p AS (SELECT f, tt, c * 1000000 // sum(c) OVER (PARTITION BY f) AS pr
              FROM c),
        v0 AS (
          SELECT f AS st, 1000000 // (SELECT count(DISTINCT f) FROM p) AS m
          FROM (SELECT DISTINCT f FROM p)),
        v1 AS (SELECT tt AS st, sum(m * pr) // 1000000 AS m
               FROM v0 JOIN p ON v0.st = p.f GROUP BY 1),
        v2 AS (SELECT tt AS st, sum(m * pr) // 1000000 AS m
               FROM v1 JOIN p ON v1.st = p.f GROUP BY 1),
        v3 AS (SELECT tt AS st, sum(m * pr) // 1000000 AS m
               FROM v2 JOIN p ON v2.st = p.f GROUP BY 1),
        rowh AS (
          SELECT f, sum(CAST(floor(-(CAST(pr AS DOUBLE) / 1e6)
                 * ln(CAST(pr AS DOUBLE) / 1e6) * 1e6) AS BIGINT)) AS h_micro
          FROM p WHERE pr > 0 GROUP BY 1),
        joined AS (
          SELECT rowh.f, h_micro, v3.m AS pi_micro
          FROM rowh JOIN v3 ON rowh.f = v3.st),
        rate AS (
          SELECT sum(pi_micro * h_micro) // 1000000 AS rate_micro
          FROM joined)
        SELECT f, CAST(h_micro AS BIGINT) AS h_micro,
               CAST(pi_micro AS BIGINT) AS pi_micro,
               CAST(rate_micro AS BIGINT) AS rate_micro
        FROM joined, rate ORDER BY f""")),

    // --------------------------------------------------------------- q497
    QDef("q497_tail_sampling",
      (s, dir) => {
        val traces = t(s, dir, "events")
          .selectExpr("user_id", s"($tsMs) DIV 86400000 AS d", "event_type")
          .groupBy("user_id", "d").agg(
            count(lit(1)).cast("long").as("n_ev"),
            max(when(col("event_type") === "error", 1L).otherwise(0L))
              .as("has_err"))
        val p95 = graft.operators.ScaleRank.quantileDisc(
          traces, col("n_ev"), 95, 100, "p95")
        val tagged = traces.crossJoin(broadcast(p95))
          .withColumn("hkeep",
            pmod(PortableHash.md5Long(concat(col("user_id"), lit("|"),
              col("d")), salt = "ts~"), lit(10L)) === 0)
          .withColumn("keep",
            col("has_err") === 1 || col("n_ev") >= col("p95") || col("hkeep"))
        tagged.groupBy(lit(1L).as("one")).agg(
          count(lit(1)).cast("long").as("traces"),
          sum(when(col("keep"), 1L).otherwise(0L)).cast("bigint").as("kept"),
          sum("n_ev").cast("bigint").as("events"),
          sum(when(col("keep"), col("n_ev")).otherwise(0L))
            .cast("bigint").as("kept_events"),
          sum(col("has_err")).cast("bigint").as("err_traces"),
          sum(when(col("keep"), col("has_err")).otherwise(0L))
            .cast("bigint").as("kept_err_traces"))
          .selectExpr("traces", "kept", "events", "kept_events",
            "err_traces", "kept_err_traces",
            "kept * 10000 DIV traces AS keep_bp",
            "kept_events * 10000 DIV events AS volume_bp")
      },
      Some(s"""
        WITH traces AS (
          SELECT user_id, epoch_ms(ts) // 86400000 AS d,
                 count(*) AS n_ev,
                 max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                   AS has_err
          FROM events GROUP BY 1, 2),
        p95 AS (
          SELECT min(n_ev) AS p95 FROM (
            SELECT n_ev,
                   row_number() OVER (ORDER BY n_ev, user_id, d) AS rn,
                   count(*) OVER () AS n
            FROM traces)
          WHERE rn * 100 >= n * 95),
        tagged AS (
          SELECT traces.*,
                 (has_err = 1 OR n_ev >= (SELECT p95 FROM p95)
                  OR ${PortableHash.md5LongSql(
                    "CAST(user_id AS VARCHAR) || '|' || CAST(d AS VARCHAR)",
                    "ts~")} % 10 = 0) AS keep
          FROM traces)
        SELECT CAST(count(*) AS BIGINT) AS traces,
               CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS kept,
               CAST(sum(n_ev) AS BIGINT) AS events,
               CAST(sum(CASE WHEN keep THEN n_ev ELSE 0 END) AS BIGINT)
                 AS kept_events,
               CAST(sum(has_err) AS BIGINT) AS err_traces,
               CAST(sum(CASE WHEN keep THEN has_err ELSE 0 END) AS BIGINT)
                 AS kept_err_traces,
               CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) * 10000 // count(*)
                 AS BIGINT) AS keep_bp,
               CAST(sum(CASE WHEN keep THEN n_ev ELSE 0 END) * 10000
                 // sum(n_ev) AS BIGINT) AS volume_bp
        FROM tagged""")),

    // --------------------------------------------------------------- q498
    QDef("q498_gcounter_merge",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .selectExpr("event_id", s"$tsMs AS ms")
          .withColumn("node", pmod(PortableHash.md5Long(col("event_id"),
            salt = "nd~"), lit(4L)))
        val span = ev.agg(min("ms").as("lo"), max("ms").as("hi"))
        // replica r's sync horizon for node n: staggered fractions of
        // the timeline (deterministic): horizon = lo + (hi-lo) * frac
        val tagged = ev.crossJoin(broadcast(span))
          .selectExpr("event_id", "ms", "node", "lo", "hi")
        def replica(r: Int, fracBp: Int) = tagged
          .withColumn("syncf", (lit(fracBp.toLong) +
            pmod(PortableHash.md5Long(
              concat(lit(r.toString), lit("|"), col("node")), salt = "sy~"),
              lit(1500L))).cast("long"))
          .where(expr("ms <= lo + ((hi - lo) * syncf) DIV 10000"))
          .groupBy("node")
          .agg(count(lit(1)).cast("bigint").as(s"r$r"))
        val truth = ev.groupBy("node")
          .agg(count(lit(1)).cast("bigint").as("truth"))
        truth.join(replica(1, 7000), Seq("node"), "left")
          .join(replica(2, 8000), Seq("node"), "left")
          .join(replica(3, 8500), Seq("node"), "left")
          .selectExpr("node", "truth",
            "coalesce(r1, 0) AS r1", "coalesce(r2, 0) AS r2",
            "coalesce(r3, 0) AS r3",
            "greatest(coalesce(r1,0), coalesce(r2,0), coalesce(r3,0)) AS merged")
          .selectExpr("node", "truth", "r1", "r2", "r3", "merged",
            "truth - merged AS lag")
          .orderBy("node")
      },
      Some(s"""
        WITH ev AS (
          SELECT event_id, epoch_ms(ts) AS ms,
                 ${PortableHash.md5LongSql("event_id", "nd~")} % 4 AS node
          FROM events),
        span AS (SELECT min(ms) AS lo, max(ms) AS hi FROM ev),
        tagged AS (SELECT ev.*, lo, hi FROM ev, span),
        r1 AS (
          SELECT node, count(*) AS r1 FROM tagged
          WHERE ms <= lo + ((hi - lo) * (7000 + ${PortableHash.md5LongSql(
            "'1' || '|' || CAST(node AS VARCHAR)", "sy~")} % 1500)) // 10000
          GROUP BY 1),
        r2 AS (
          SELECT node, count(*) AS r2 FROM tagged
          WHERE ms <= lo + ((hi - lo) * (8000 + ${PortableHash.md5LongSql(
            "'2' || '|' || CAST(node AS VARCHAR)", "sy~")} % 1500)) // 10000
          GROUP BY 1),
        r3 AS (
          SELECT node, count(*) AS r3 FROM tagged
          WHERE ms <= lo + ((hi - lo) * (8500 + ${PortableHash.md5LongSql(
            "'3' || '|' || CAST(node AS VARCHAR)", "sy~")} % 1500)) // 10000
          GROUP BY 1),
        truth AS (SELECT node, count(*) AS truth FROM ev GROUP BY 1)
        SELECT truth.node AS node, CAST(truth AS BIGINT) AS truth,
               CAST(coalesce(r1, 0) AS BIGINT) AS r1,
               CAST(coalesce(r2, 0) AS BIGINT) AS r2,
               CAST(coalesce(r3, 0) AS BIGINT) AS r3,
               CAST(greatest(coalesce(r1,0), coalesce(r2,0), coalesce(r3,0))
                 AS BIGINT) AS merged,
               CAST(truth - greatest(coalesce(r1,0), coalesce(r2,0),
                 coalesce(r3,0)) AS BIGINT) AS lag
        FROM truth
        LEFT JOIN r1 ON truth.node = r1.node
        LEFT JOIN r2 ON truth.node = r2.node
        LEFT JOIN r3 ON truth.node = r3.node
        ORDER BY node"""))
  )
}
