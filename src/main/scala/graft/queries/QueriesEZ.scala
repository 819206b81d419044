package graft.queries

import graft.Tables.t
import graft.dedup.Dedup
import graft.functions.TextFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 coverage additions, part 149 — corpus dispersion, CDC
  * compaction, TPC-H Q22, and mergeable MinHash:
  *
  *  - q609: Church–Gale token over-dispersion (burstiness) per lang:
  *    tokens whose per-doc tf variance exceeds a Poisson-like mean
  *    (VMR > 2) are boilerplate/template candidates. The VMR test is
  *    exact integer cross-multiplication — n·S2 − S1² > 2·n·S1 — over
  *    the lang-bounded vocabulary census; no FP anywhere.
  *  - q610: CDC net-effect compaction (Delta-CDF-style): per key, the
  *    ordered change feed collapses to one of four net classes from
  *    (first op, last op); census of classes with op volumes. One
  *    key-partitioned window, no driver state.
  *  - q611: TPC-H Q22 shape (idle capital): customers above the global
  *    mean positive balance with no orders since a cutoff, per nation.
  *    The global mean is exact integer cents (Σ DIV n) broadcast to
  *    the filter; the "no recent orders" side is a left-anti join.
  *  - q612: mergeable MinHash shard sketches: per-shard 16-component
  *    signatures via plain min() aggregates (associative ⇒ the merge
  *    of shard sigs IS the corpus sig — the 100 TB sketch-union path,
  *    q599's quantile-merge sibling for resemblance); shard-pair
  *    resemblance estimated from matching components next to the
  *    exact vocab Jaccard from an 8-bit shard bitmask census.
  *
  * Scale shapes: q609/q612 are vocab-bounded censuses (one shuffle on
  * (lang, word) / word); q610 is one window per key partition; q611 is
  * a broadcast-scalar filter + anti-join, both shuffle-on-custkey.
  */
object QueriesEZ extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q609
    QDef("q609_token_dispersion",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .withColumn("w", TextFunctions.words(col("text")))
          .filter(size(col("w")) > 0)
        val nDocs = docs.groupBy("lang").agg(count(lit(1)).as("n"))
        val tf = docs
          .select(col("lang"), col("doc_id"), explode(col("w")).as("word"))
          .groupBy("lang", "doc_id", "word").agg(count(lit(1)).as("tf"))
        val tok = tf.groupBy("lang", "word").agg(
            count(lit(1)).as("df"),
            sum("tf").cast("long").as("s1"),
            sum(expr("tf * tf")).cast("decimal(38,0)").as("s2"))
          .where(col("df") >= 5)
          .join(broadcast(nDocs), "lang")
          // population VMR over all n docs in the lang (absent docs are
          // tf=0): VMR = (n·S2 − S1²)/(n·S1) — bursty ⟺ VMR > 2
          .withColumn("bursty", expr(
            """CAST(CASE WHEN CAST(n AS DECIMAL(38,0)) * s2 - CAST(s1 AS DECIMAL(38,0)) * s1
                 > CAST(2 AS DECIMAL(38,0)) * n * s1 THEN 1 ELSE 0 END AS BIGINT)"""))
        tok.groupBy("lang").agg(
            count(lit(1)).cast("long").as("vocab_audited"),
            sum("bursty").cast("long").as("n_bursty"),
            sum("s1").cast("long").as("occurrences"),
            sum(when(col("bursty") === 1L, col("s1")).otherwise(0L))
              .cast("long").as("bursty_occurrences"))
          .selectExpr("lang", "vocab_audited", "n_bursty",
            "n_bursty * 10000 DIV vocab_audited AS bursty_vocab_bp",
            "bursty_occurrences * 10000 DIV occurrences AS bursty_mass_bp",
            "occurrences", "bursty_occurrences")
          .orderBy("lang")
      },
      Some {
        val wSql = TextFunctions.wordsSql("text")
        s"""
        WITH d AS (SELECT lang, doc_id, $wSql AS w FROM documents),
        d2 AS (SELECT lang, doc_id, w FROM d WHERE len(w) > 0),
        n AS (SELECT lang, count(*) AS n FROM d2 GROUP BY 1),
        tf AS (
          SELECT lang, doc_id, unnest(w) AS word FROM d2),
        tf2 AS (
          SELECT lang, doc_id, word, count(*) AS tf FROM tf GROUP BY 1, 2, 3),
        tok AS (
          SELECT lang, word, count(*) AS df,
                 CAST(sum(tf) AS BIGINT) AS s1,
                 CAST(sum(tf * tf) AS HUGEINT) AS s2
          FROM tf2 GROUP BY 1, 2),
        b AS (
          SELECT t.lang, t.s1,
                 CASE WHEN CAST(n.n AS HUGEINT) * t.s2
                        - CAST(t.s1 AS HUGEINT) * t.s1
                      > CAST(2 AS HUGEINT) * n.n * t.s1
                   THEN 1 ELSE 0 END AS bursty
          FROM tok t JOIN n ON t.lang = n.lang
          WHERE t.df >= 5)
        SELECT lang, CAST(count(*) AS BIGINT) AS vocab_audited,
               CAST(sum(bursty) AS BIGINT) AS n_bursty,
               CAST(sum(bursty) AS BIGINT) * 10000 // count(*) AS bursty_vocab_bp,
               CAST(sum(CASE WHEN bursty = 1 THEN s1 ELSE 0 END) AS BIGINT)
                 * 10000 // CAST(sum(s1) AS BIGINT) AS bursty_mass_bp,
               CAST(sum(s1) AS BIGINT) AS occurrences,
               CAST(sum(CASE WHEN bursty = 1 THEN s1 ELSE 0 END) AS BIGINT)
                 AS bursty_occurrences
        FROM b GROUP BY 1 ORDER BY lang"""
      }),

    // --------------------------------------------------------------- q610
    QDef("q610_cdc_net_effect",
      (s, dir) => {
        val ops = t(s, dir, "events")
          .selectExpr("user_id", s"$tsMs AS ms", "event_id",
            """CASE WHEN event_type = 'signup' THEN 'I'
                    WHEN event_type = 'error' THEN 'D'
                    ELSE 'U' END AS op""")
        val w = Window.partitionBy("user_id").orderBy("ms", "event_id")
        val spans = ops
          .withColumn("rn", row_number().over(w))
          .withColumn("nn", count(lit(1)).over(
            Window.partitionBy("user_id")))
          .withColumn("first_op", first("op").over(w))
          .where(col("rn") === col("nn"))
          .selectExpr("user_id", "nn AS n_ops", "first_op", "op AS last_op")
        spans
          .selectExpr("n_ops",
            """CASE WHEN first_op = 'I' AND last_op = 'D' THEN 'transient'
                    WHEN first_op = 'I' THEN 'net_insert'
                    WHEN last_op = 'D' THEN 'net_delete'
                    ELSE 'net_update' END AS net_class""")
          .groupBy("net_class")
          .agg(count(lit(1)).cast("long").as("n_keys"),
            sum("n_ops").cast("long").as("n_ops"),
            max("n_ops").cast("long").as("max_ops"))
          .selectExpr("net_class", "n_keys", "n_ops", "max_ops",
            "n_ops DIV n_keys AS avg_ops")
          .orderBy("net_class")
      },
      Some(s"""
        WITH ops AS (
          SELECT user_id, epoch_ms(ts) AS ms, event_id,
                 CASE WHEN event_type = 'signup' THEN 'I'
                      WHEN event_type = 'error' THEN 'D'
                      ELSE 'U' END AS op
          FROM events),
        spans AS (
          -- composite scalar key: event_id < 10^10 on real testdata, so
          -- ms*10^10 + event_id in HUGEINT preserves (ms, event_id) order
          SELECT user_id, count(*) AS n_ops,
                 min_by(op, CAST(ms AS HUGEINT) * 10000000000 + event_id) AS first_op,
                 max_by(op, CAST(ms AS HUGEINT) * 10000000000 + event_id) AS last_op
          FROM ops GROUP BY 1),
        cls AS (
          SELECT n_ops,
                 CASE WHEN first_op = 'I' AND last_op = 'D' THEN 'transient'
                      WHEN first_op = 'I' THEN 'net_insert'
                      WHEN last_op = 'D' THEN 'net_delete'
                      ELSE 'net_update' END AS net_class
          FROM spans)
        SELECT net_class, CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(n_ops) AS BIGINT) AS n_ops,
               CAST(max(n_ops) AS BIGINT) AS max_ops,
               CAST(sum(n_ops) AS BIGINT) // count(*) AS avg_ops
        FROM cls GROUP BY 1 ORDER BY net_class""")),

    // --------------------------------------------------------------- q611
    QDef("q611_idle_capital",
      (s, dir) => {
        val cust = t(s, dir, "customer")
          .selectExpr("c_custkey", "c_nationkey",
            "CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_c")
        // exact integer mean of positive balances (Σ DIV n): no FP at
        // the comparison boundary in either engine
        val avg = cust.where(col("bal_c") > 0)
          .agg(sum("bal_c").cast("long").as("s"),
            count(lit(1)).as("n"))
          .selectExpr("s DIV n AS avg_c")
        val idle = cust.crossJoin(broadcast(avg))
          .where(col("bal_c") > col("avg_c"))
          .join(t(s, dir, "orders")
            .where(expr("o_orderdate >= DATE '2000-01-01'"))
            .select(col("o_custkey").as("c_custkey")),
            Seq("c_custkey"), "left_anti")
        idle.groupBy("c_nationkey").agg(
            count(lit(1)).cast("long").as("n_cust"),
            sum("bal_c").cast("long").as("idle_cents"))
          .orderBy("c_nationkey")
      },
      Some("""
        WITH cust AS (
          SELECT c_custkey, c_nationkey,
                 CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_c
          FROM customer),
        a AS (
          SELECT CAST(sum(bal_c) AS BIGINT) // count(*) AS avg_c
          FROM cust WHERE bal_c > 0)
        SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust,
               CAST(sum(bal_c) AS BIGINT) AS idle_cents
        FROM cust, a
        WHERE bal_c > avg_c
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= DATE '2000-01-01')
        GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q612
    QDef("q612_minhash_merge",
      (s, dir) => {
        val nH = 16
        val tok = t(s, dir, "documents")
          .withColumn("w", TextFunctions.words(col("text")))
          .filter(size(col("w")) > 0)
          .select(pmod(col("doc_id"), lit(8L)).as("shard"),
            explode(col("w")).as("word"))
          .select(col("shard"), Dedup.shingleHash(col("word")).as("h"))
        tok.cache(); tok.count() // eager: sig pass + bitmask pass
        // per-shard signature: 16 plain min() aggregates — associative,
        // so merging shard sigs (elementwise min) IS the corpus sig
        val sigs = tok.groupBy("shard")
          .agg(Dedup.minhashAggs(col("h"), nH).head,
            Dedup.minhashAggs(col("h"), nH).tail: _*)
        // exact vocab overlap per shard pair from an 8-bit mask census
        val masks = tok.groupBy("h")
          .agg(expr("bit_or(CAST(1 AS BIGINT) << CAST(shard AS INT))").as("m"))
        val sa = sigs.columns.filter(_.startsWith("_mh"))
        val pairs = sigs.as("a").crossJoin(sigs.as("b"))
          .where(col("a.shard") < col("b.shard"))
          .select((col("a.shard").as("shard_a") +: col("b.shard").as("shard_b") +:
            sa.map(c => (col(s"a.$c") === col(s"b.$c"))
              .cast("long").as(s"eq_$c")).toIndexedSeq): _*)
          .withColumn("est_matches",
            sa.map(c => col(s"eq_$c")).reduce(_ + _))
          .selectExpr("shard_a", "shard_b", "est_matches",
            s"est_matches * 10000 DIV $nH AS est_jac_bp")
        val exact = masks.crossJoin(
            broadcast(pairs.select("shard_a", "shard_b")))
          .groupBy("shard_a", "shard_b")
          .agg(
            sum(expr("CASE WHEN ((m >> CAST(shard_a AS INT)) % 2 = 1) AND ((m >> CAST(shard_b AS INT)) % 2 = 1) THEN 1 ELSE 0 END"))
              .cast("long").as("n_common"),
            sum(expr("CASE WHEN ((m >> CAST(shard_a AS INT)) % 2 = 1) OR ((m >> CAST(shard_b AS INT)) % 2 = 1) THEN 1 ELSE 0 END"))
              .cast("long").as("n_union"))
        pairs.join(exact, Seq("shard_a", "shard_b"))
          .selectExpr("shard_a", "shard_b", "est_matches", "est_jac_bp",
            "n_common * 10000 DIV n_union AS exact_jac_bp")
          .orderBy("shard_a", "shard_b")
      },
      Some {
        val wSql = TextFunctions.wordsSql("text")
        val hSql = s"${graft.functions.PortableHash.md5LongSql("word")} % 2147483647"
        val aggs = Dedup.minhashAggSqls("h", 16).zipWithIndex
          .map { case (a, j) => s"$a AS mh$j" }.mkString(", ")
        val eqs = (0 until 16)
          .map(j => s"CASE WHEN a.mh$j = b.mh$j THEN 1 ELSE 0 END")
          .mkString(" + ")
        s"""
        WITH d AS (SELECT doc_id, $wSql AS w FROM documents),
        tok0 AS (
          SELECT doc_id % 8 AS shard, unnest(w) AS word
          FROM d WHERE len(w) > 0),
        tok AS (SELECT shard, $hSql AS h FROM tok0),
        sigs AS (SELECT shard, $aggs FROM tok GROUP BY shard),
        masks AS (
          SELECT h, bit_or(CAST(1 AS BIGINT) << CAST(shard AS INT)) AS m
          FROM tok GROUP BY 1),
        pairs AS (
          SELECT a.shard AS shard_a, b.shard AS shard_b, $eqs AS est_matches
          FROM sigs a JOIN sigs b ON a.shard < b.shard),
        exact AS (
          SELECT p.shard_a, p.shard_b,
                 CAST(sum(CASE WHEN ((m >> CAST(p.shard_a AS INT)) % 2 = 1)
                            AND ((m >> CAST(p.shard_b AS INT)) % 2 = 1)
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
                 CAST(sum(CASE WHEN ((m >> CAST(p.shard_a AS INT)) % 2 = 1)
                            OR ((m >> CAST(p.shard_b AS INT)) % 2 = 1)
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_union
          FROM masks, pairs p GROUP BY 1, 2)
        SELECT p.shard_a, p.shard_b,
               CAST(p.est_matches AS BIGINT) AS est_matches,
               CAST(p.est_matches AS BIGINT) * 10000 // 16 AS est_jac_bp,
               e.n_common * 10000 // e.n_union AS exact_jac_bp
        FROM pairs p JOIN exact e
          ON p.shard_a = e.shard_a AND p.shard_b = e.shard_b
        ORDER BY p.shard_a, p.shard_b"""
      })
  )
}
