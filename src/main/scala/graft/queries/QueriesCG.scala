package graft.queries

import graft.Tables.t
import graft.functions.{PortableHash, TextFunctions}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 78 — privacy operations, timezone
  * semantics, feature engineering, queueing policy:
  *
  *  - q335: GDPR-erasure impact audit — the cascade a user-deletion
  *    request touches (customer → orders → lineitem → events), row and
  *    key counts per table plus a zero-orphan proof for the post-delete
  *    state; the right-to-be-forgotten planning query.
  *  - q336: timezone-local bucketing — events shifted to each user's
  *    nation offset (nationkey−12 hours) before day/hour bucketing:
  *    the peak LOCAL hour per nation (UTC bucketing is q261's heatmap;
  *    this is the civil-time variant).
  *  - q337: feature hashing (the hashing trick) — vocabulary hashed
  *    into 64 buckets per language with collision accounting; the
  *    fixed-width featurizer used when a full vocab is too large.
  *  - q338: shortest-job-first vs FIFO — total waiting time under both
  *    service orders per event-type queue from exact prefix sums; SJF
  *    optimality shows as ratio ≤ 10000 bp. The task-queue policy
  *    economics.
  *
  * Reference analog: user-deletion requests over harvested profiles,
  * listing-local calendar semantics, review-text featurization,
  * task-queue scheduling policy.
  */
object QueriesCG extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q335
    QDef("q335_erasure_audit",
      (s, dir) => {
        val victims = t(s, dir, "customer")
          .where(col("c_custkey") % 97 === 0).select(col("c_custkey")).cache()
        victims.count()
        val vOrders = t(s, dir, "orders")
          .join(broadcast(victims), col("o_custkey") === col("c_custkey"))
          .select("o_orderkey", "o_custkey").cache()
        vOrders.count()
        def row(tbl: String, df: org.apache.spark.sql.DataFrame,
            key: String) =
          df.agg(count(lit(1)).as("n_rows"),
            countDistinct(key).as("n_keys"))
            .select(lit(tbl).as("tbl"), col("n_rows"), col("n_keys"))
        val cu = row("1_customer", victims.toDF("c_custkey"), "c_custkey")
        val or = row("2_orders", vOrders, "o_custkey")
        val li = row("3_lineitem",
          t(s, dir, "lineitem").join(broadcast(vOrders),
            col("l_orderkey") === col("o_orderkey")), "o_custkey")
        val ev = row("4_events",
          t(s, dir, "events").join(broadcast(victims),
            col("user_id") === col("c_custkey")), "user_id")
        // post-delete orphan proof: lineitems whose order survives but
        // whose customer is erased must be exactly the cascade rows
        val orphan = t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(victims), col("o_custkey") === col("c_custkey"), "left_anti")
          .join(broadcast(vOrders.select(col("o_orderkey").as("vok"))),
            col("l_orderkey") === col("vok"), "left_semi")
          .agg(count(lit(1)).as("n_rows"))
          .select(lit("5_orphans_after").as("tbl"), col("n_rows"),
            lit(0L).as("n_keys"))
        cu.union(or).union(li).union(ev).union(orphan).orderBy("tbl")
      },
      Some("""
        WITH victims AS (
          SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
        vorders AS (
          SELECT o_orderkey, o_custkey FROM orders
          JOIN victims ON o_custkey = c_custkey)
        SELECT '1_customer' AS tbl, count(*) AS n_rows,
               count(DISTINCT c_custkey) AS n_keys FROM victims
        UNION ALL
        SELECT '2_orders', count(*), count(DISTINCT o_custkey) FROM vorders
        UNION ALL
        SELECT '3_lineitem', count(*), count(DISTINCT o_custkey)
        FROM lineitem JOIN vorders ON l_orderkey = o_orderkey
        UNION ALL
        SELECT '4_events', count(*), count(DISTINCT user_id)
        FROM events JOIN victims ON user_id = c_custkey
        UNION ALL
        SELECT '5_orphans_after', count(*), 0
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        WHERE o_custkey NOT IN (SELECT c_custkey FROM victims)
          AND l_orderkey IN (SELECT o_orderkey FROM vorders)
        ORDER BY tbl""")),

    // --------------------------------------------------------------- q336
    QDef("q336_tz_bucketing",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .selectExpr("user_id", s"($tsMs) AS ms")
          .join(t(s, dir, "customer")
            .select(col("c_custkey"), col("c_nationkey")),
            col("user_id") === col("c_custkey"))
          .selectExpr("c_nationkey",
            "(ms + (c_nationkey - 12) * 3600000) DIV 3600000 % 24 AS local_hour")
        val counts = ev.groupBy("c_nationkey", "local_hour")
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("c_nationkey")
          .orderBy(col("n").desc, col("local_hour"))
        counts
          .withColumn("rk", row_number().over(w))
          .withColumn("tot", sum("n").over(Window.partitionBy("c_nationkey")))
          .where(col("rk") === 1)
          .selectExpr("c_nationkey", "local_hour AS peak_hour",
            "n AS n_at_peak", "CAST(tot AS BIGINT) AS n_events")
          .orderBy("c_nationkey")
      },
      Some("""
        WITH ev AS (
          SELECT c_nationkey,
                 (epoch_ms(ts) + (c_nationkey - 12) * 3600000) // 3600000 % 24
                   AS local_hour
          FROM events JOIN customer ON user_id = c_custkey),
        counts AS (
          SELECT c_nationkey, local_hour, count(*) AS n
          FROM ev GROUP BY 1, 2),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY c_nationkey
                   ORDER BY n DESC, local_hour) AS rk,
                 sum(n) OVER (PARTITION BY c_nationkey) AS tot
          FROM counts)
        SELECT c_nationkey, local_hour AS peak_hour, n AS n_at_peak,
               CAST(tot AS BIGINT) AS n_events
        FROM ranked WHERE rk = 1 ORDER BY c_nationkey""")),

    // --------------------------------------------------------------- q337
    QDef("q337_feature_hashing",
      (s, dir) => {
        val vocab = t(s, dir, "documents")
          .withColumn("w", TextFunctions.words(col("text")))
          .select(col("lang"), explode(col("w")).as("word"))
          .distinct()
          .withColumn("bucket",
            PortableHash.md5Long(col("word"), salt = "feat~") % 64)
        vocab.groupBy("lang")
          .agg(count(lit(1)).as("n_words"),
            countDistinct("bucket").as("n_buckets_used"))
          .join(
            vocab.groupBy("lang", "bucket").agg(count(lit(1)).as("bw"))
              .groupBy("lang")
              .agg(expr("CAST(sum(CASE WHEN bw >= 2 THEN 1 ELSE 0 END) AS BIGINT)")
                .as("n_colliding_buckets"),
                max("bw").cast("bigint").as("max_bucket_words")),
            Seq("lang"))
          .selectExpr("lang", "n_words", "n_buckets_used",
            "n_colliding_buckets", "max_bucket_words",
            "(n_words - n_buckets_used) * 10000 DIV n_words AS collision_bp")
          .orderBy("lang")
      },
      Some {
        val h = PortableHash.md5LongSql("word", salt = "feat~")
        s"""
        WITH vocab AS (
          SELECT DISTINCT lang, word FROM (
            SELECT lang, unnest(${TextFunctions.wordsSql("text")}) AS word
            FROM documents)),
        vb AS (SELECT lang, word, $h % 64 AS bucket FROM vocab),
        per_bucket AS (
          SELECT lang, bucket, count(*) AS bw FROM vb GROUP BY 1, 2),
        a AS (
          SELECT lang, count(*) AS n_words,
                 count(DISTINCT bucket) AS n_buckets_used
          FROM vb GROUP BY 1),
        b AS (
          SELECT lang,
                 CAST(sum(CASE WHEN bw >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_colliding_buckets,
                 CAST(max(bw) AS BIGINT) AS max_bucket_words
          FROM per_bucket GROUP BY 1)
        SELECT lang, n_words, n_buckets_used, n_colliding_buckets,
               max_bucket_words,
               (n_words - n_buckets_used) * 10000 // n_words AS collision_bp
        FROM a JOIN b USING (lang) ORDER BY lang"""
      }),

    // --------------------------------------------------------------- q338
    QDef("q338_sjf_vs_fifo",
      (s, dir) => {
        val jobs = t(s, dir, "events")
          .where(col("value").isNotNull)
          .selectExpr("event_type", "event_id", s"($tsMs) AS ms",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS dur")
        def totalWait(ordCols: Seq[org.apache.spark.sql.Column], name: String) = {
          val w = Window.partitionBy("event_type").orderBy(ordCols: _*)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          jobs.withColumn("wait", sum("dur").over(w) - col("dur"))
            .groupBy("event_type")
            .agg(sum("wait").cast("bigint").as(name),
              count(lit(1)).as(s"n_$name"))
        }
        val fifo = totalWait(Seq(col("ms"), col("event_id")), "fifo_wait")
        val sjf = totalWait(Seq(col("dur"), col("ms"), col("event_id")), "sjf_wait")
        fifo.join(sjf, "event_type")
          .selectExpr("event_type", "n_fifo_wait AS n_jobs",
            "fifo_wait", "sjf_wait",
            "sjf_wait * 10000 DIV fifo_wait AS sjf_vs_fifo_bp")
          .orderBy("event_type")
      },
      Some("""
        WITH jobs AS (
          SELECT event_type, event_id, epoch_ms(ts) AS ms,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS dur
          FROM events WHERE value IS NOT NULL),
        fifo AS (
          SELECT event_type, count(*) AS n_jobs,
                 CAST(sum(cum - dur) AS BIGINT) AS fifo_wait
          FROM (SELECT event_type, dur,
                  sum(dur) OVER (PARTITION BY event_type
                    ORDER BY ms, event_id ROWS UNBOUNDED PRECEDING) AS cum
                FROM jobs)
          GROUP BY 1),
        sjf AS (
          SELECT event_type,
                 CAST(sum(cum - dur) AS BIGINT) AS sjf_wait
          FROM (SELECT event_type, dur,
                  sum(dur) OVER (PARTITION BY event_type
                    ORDER BY dur, ms, event_id ROWS UNBOUNDED PRECEDING) AS cum
                FROM jobs)
          GROUP BY 1)
        SELECT event_type, n_jobs, fifo_wait, sjf_wait,
               sjf_wait * 10000 // fifo_wait AS sjf_vs_fifo_bp
        FROM fifo JOIN sjf USING (event_type)
        ORDER BY event_type"""))
  )
}
