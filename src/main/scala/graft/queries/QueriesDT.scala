package graft.queries

import graft.Tables.t
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 117 — HMM decoding, two-sample
  * energy distance, revenue-management optimization, instrumental
  * variables:
  *
  *  - q487: 2-state Viterbi decoding — each type's daily series
  *    binarized at its exact-rank median, then the max-product
  *    recurrence over integer-micro log scores (all transition/emission
  *    log-probabilities inlined as shared literals): per-state best
  *    scores AND best-path strings carried through the recurrence (true
  *    Viterbi backtracking without a backward pass). Per-key sequential
  *    state on the mapPartitions path; the oracle carries (vA, vB,
  *    pathA, pathB) through a recursive CTE. The regime-labeling
  *    upgrade of q134/q180.
  *  - q488: two-sample energy distance between first/second-half daily
  *    counts per type — 2·Σ|x−y| /nm − Σ|x−x'|/n² − Σ|y−y'|/m² over the
  *    BOUNDED daily aggregate, kept exact via the n²m² common
  *    denominator. Completes the distribution-distance trio with q166
  *    (KS) and q325 (Wasserstein).
  *  - q489: overbooking optimizer — no-show probability from order
  *    status ('F' = fulfilled appears; others no-show per booking),
  *    binomial show-up distribution by the exact Pascal recurrence in
  *    fixed-order DOUBLE, expected profit (revenue per show minus
  *    bump penalty per oversale) enumerated for booking levels C..C+5
  *    over 20 seats; argmax level. The revenue-management classic.
  *  - q490: instrumental-variable Wald estimator — instrument Z (hash
  *    bit) encourages treatment T (Z xor a deterministic defier mask),
  *    outcome Y = purchase: β_IV = (ȳ₁−ȳ₀)/(t̄₁−t̄₀) by exact
  *    cross-multiplied integer ratio (micro). Completes the causal
  *    family (q239 DiD, q403 RD, q435 propensity, q469 DEFF).
  *
  * Reference analog: harvest regime labeling, wave-distribution shift,
  * calendar overbooking levels, policy effects with non-compliance.
  */
object QueriesDT extends QueryPack {
  import Q._

  // NOT private: Spark codegen accesses these.
  case class VitObs(tp: String, rn: Long, x: Int)
  case class VitOut(tp: String, n_days: Long, v_best: Long, path: String,
                    n_high: Long, switches: Long)

  private val TAA = -223144L; private val TAB = -1609438L
  private val TBA = -1609438L; private val TBB = -223144L
  private val EA1 = -356675L; private val EA0 = -1203973L
  private val EB1 = -1203973L; private val EB0 = -356675L
  private val INIT = -693148L

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q487
    QDef("q487_viterbi",
      (s, dir) => {
        import s.implicits._
        val daily = t(s, dir, "events")
          .selectExpr("event_type AS tp", s"($tsMs) DIV 86400000 AS d")
          .groupBy("tp", "d").agg(count(lit(1)).cast("long").as("c"))
        val med = daily
          .withColumn("rn", row_number().over(Window.partitionBy("tp")
            .orderBy("c", "d")).cast("long"))
          .withColumn("n", count(lit(1)).over(Window.partitionBy("tp"))
            .cast("long"))
          .where(col("rn") * 2 === col("n") + (col("n") % 2))
          .groupBy("tp").agg(min("c").as("med"))
        val obs = daily.join(med, "tp")
          .selectExpr("tp", "d", "CASE WHEN c > med THEN 1 ELSE 0 END AS x")
          .withColumn("rn", row_number().over(Window.partitionBy("tp")
            .orderBy("d")).cast("long"))
          .select(col("tp"), col("rn"), col("x").cast("int"))
          .as[VitObs]
        obs.repartition(col("tp")).sortWithinPartitions("tp", "rn")
          .mapPartitions { it =>
            val out = scala.collection.mutable.ArrayBuffer.empty[VitOut]
            var cur: String = null
            var vA = 0L; var vB = 0L
            var pA = ""; var pB = ""
            var n = 0L
            def flush(): Unit = if (cur != null) {
              val (v, p) = if (vA >= vB) (vA, pA) else (vB, pB)
              val nh = p.count(_ == 'A').toLong
              val sw = p.zip(p.drop(1)).count { case (a, b) => a != b }.toLong
              out += VitOut(cur, n, v, p, nh, sw)
            }
            it.foreach { o =>
              if (o.tp != cur) {
                flush(); cur = o.tp
                vA = 0L; vB = 0L; pA = ""; pB = ""; n = 0L
              }
              n += 1
              val (eA, eB) =
                if (o.x == 1) (EA1, EB1) else (EA0, EB0)
              if (n == 1) {
                vA = INIT + eA; vB = INIT + eB; pA = "A"; pB = "B"
              } else {
                val (nvA, npA) =
                  if (vA + TAA >= vB + TBA) (vA + TAA + eA, pA + "A")
                  else (vB + TBA + eA, pB + "A")
                val (nvB, npB) =
                  if (vA + TAB >= vB + TBB) (vA + TAB + eB, pA + "B")
                  else (vB + TBB + eB, pB + "B")
                vA = nvA; vB = nvB; pA = npA; pB = npB
              }
            }
            flush()
            out.iterator
          }.toDF()
          .selectExpr("tp AS event_type", "n_days", "v_best", "path",
            "n_high", "switches")
          .orderBy("event_type")
      },
      Some(s"""
        WITH RECURSIVE daily AS MATERIALIZED (
          SELECT event_type AS tp, epoch_ms(ts) // 86400000 AS d,
                 CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2),
        med AS (
          SELECT tp, min(c) AS med FROM (
            SELECT tp, c,
                   row_number() OVER (PARTITION BY tp ORDER BY c, d) AS rn,
                   count(*) OVER (PARTITION BY tp) AS n
            FROM daily)
          WHERE rn * 2 = n + (n % 2) GROUP BY 1),
        obs AS MATERIALIZED (
          SELECT daily.tp,
                 row_number() OVER (PARTITION BY daily.tp ORDER BY d) AS rn,
                 CASE WHEN c > med THEN 1 ELSE 0 END AS x
          FROM daily JOIN med ON daily.tp = med.tp),
        maxs AS MATERIALIZED (SELECT tp, max(rn) AS ns FROM obs GROUP BY 1),
        rec AS (
          SELECT o.tp, CAST(1 AS BIGINT) AS rn,
                 $INIT + CASE WHEN o.x = 1 THEN $EA1 ELSE $EA0 END AS va,
                 $INIT + CASE WHEN o.x = 1 THEN $EB1 ELSE $EB0 END AS vb,
                 'A' AS pa, 'B' AS pb
          FROM obs o WHERE o.rn = 1
          UNION ALL
          SELECT r.tp, r.rn + 1,
                 CASE WHEN r.va + $TAA >= r.vb + $TBA
                      THEN r.va + $TAA ELSE r.vb + $TBA END
                   + CASE WHEN o.x = 1 THEN $EA1 ELSE $EA0 END AS va,
                 CASE WHEN r.va + $TAB >= r.vb + $TBB
                      THEN r.va + $TAB ELSE r.vb + $TBB END
                   + CASE WHEN o.x = 1 THEN $EB1 ELSE $EB0 END AS vb,
                 (CASE WHEN r.va + $TAA >= r.vb + $TBA
                       THEN r.pa ELSE r.pb END) || 'A' AS pa,
                 (CASE WHEN r.va + $TAB >= r.vb + $TBB
                       THEN r.pa ELSE r.pb END) || 'B' AS pb
          FROM rec r JOIN obs o ON o.tp = r.tp AND o.rn = r.rn + 1),
        fin AS (
          SELECT rec.tp, rec.rn AS n_days,
                 CASE WHEN va >= vb THEN va ELSE vb END AS v_best,
                 CASE WHEN va >= vb THEN pa ELSE pb END AS path
          FROM rec JOIN maxs ON rec.tp = maxs.tp AND rec.rn = maxs.ns)
        SELECT tp AS event_type, CAST(n_days AS BIGINT) AS n_days,
               CAST(v_best AS BIGINT) AS v_best, path,
               CAST(length(path) - length(replace(path, 'A', ''))
                 AS BIGINT) AS n_high,
               CAST(len(list_filter(range(1, length(path)),
                 i -> substr(path, i, 1) <> substr(path, i + 1, 1)))
                 AS BIGINT) AS switches
        FROM fin ORDER BY event_type""")),

    // --------------------------------------------------------------- q488
    QDef("q488_energy_distance",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .selectExpr("event_type", s"($tsMs) DIV 86400000 AS d")
          .groupBy("event_type", "d").agg(count(lit(1)).cast("long").as("c"))
        val mid = daily.agg(expr("(min(d) + max(d) + 1) DIV 2")
          .cast("long").as("mid"))
        val halves = daily.crossJoin(broadcast(mid))
          .selectExpr("event_type", "d", "c",
            "CASE WHEN d < mid THEN 0 ELSE 1 END AS half")
        def pairSum(hx: Int, hy: Int, name: String) =
          halves.where(col("half") === hx).as("x")
            .join(halves.where(col("half") === hy).as("y"),
              col("x.event_type") === col("y.event_type"))
            .groupBy(col("x.event_type").as("event_type"))
            .agg(sum(abs(col("x.c") - col("y.c"))).cast("bigint").as(name),
              count(lit(1)).cast("bigint").as(name + "_n"))
        val xy = pairSum(0, 1, "sxy")
        val xx = pairSum(0, 0, "sxx")
        val yy = pairSum(1, 1, "syy")
        val counts = halves.groupBy("event_type").agg(
          sum(when(col("half") === 0, 1L).otherwise(0L))
            .cast("bigint").as("n"),
          sum(when(col("half") === 1, 1L).otherwise(0L))
            .cast("bigint").as("m"))
        xy.join(xx, "event_type").join(yy, "event_type")
          .join(counts, "event_type")
          .selectExpr("event_type", "n", "m", "sxy", "sxx", "syy",
            // E = 2 sxy/(nm) - sxx/n^2 - syy/m^2, scaled by n^2 m^2:
            "2 * sxy * n * m - sxx * m * m - syy * n * n AS e_scaled",
            "n * n * m * m AS denom")
          .selectExpr("event_type", "n", "m", "e_scaled", "denom",
            "e_scaled * 1000 DIV denom AS energy_milli")
          .orderBy("event_type")
      },
      Some("""
        WITH daily AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS d,
                 CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2),
        mid AS (SELECT (min(d) + max(d) + 1) // 2 AS mid FROM daily),
        halves AS MATERIALIZED (
          SELECT event_type, d, c,
                 CASE WHEN d < (SELECT mid FROM mid) THEN 0 ELSE 1 END AS half
          FROM daily),
        sxy AS (
          SELECT x.event_type, sum(abs(x.c - y.c)) AS sxy
          FROM halves x JOIN halves y
            ON x.event_type = y.event_type AND x.half = 0 AND y.half = 1
          GROUP BY 1),
        sxx AS (
          SELECT x.event_type, sum(abs(x.c - y.c)) AS sxx
          FROM halves x JOIN halves y
            ON x.event_type = y.event_type AND x.half = 0 AND y.half = 0
          GROUP BY 1),
        syy AS (
          SELECT x.event_type, sum(abs(x.c - y.c)) AS syy
          FROM halves x JOIN halves y
            ON x.event_type = y.event_type AND x.half = 1 AND y.half = 1
          GROUP BY 1),
        counts AS (
          SELECT event_type,
                 sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS n,
                 sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS m
          FROM halves GROUP BY 1)
        SELECT counts.event_type AS event_type, CAST(n AS BIGINT) AS n,
               CAST(m AS BIGINT) AS m,
               CAST(2 * sxy * n * m - sxx * m * m - syy * n * n AS BIGINT)
                 AS e_scaled,
               CAST(n * n * m * m AS BIGINT) AS denom,
               CAST((2 * sxy * n * m - sxx * m * m - syy * n * n) * 1000
                 // (n * n * m * m) AS BIGINT) AS energy_milli
        FROM counts
        JOIN sxy ON counts.event_type = sxy.event_type
        JOIN sxx ON counts.event_type = sxx.event_type
        JOIN syy ON counts.event_type = syy.event_type
        ORDER BY event_type""")),

    // --------------------------------------------------------------- q489
    QDef("q489_overbooking",
      (s, dir) => {
        val p = t(s, dir, "orders").agg(
          count(lit(1)).cast("bigint").as("n"),
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L))
            .cast("bigint").as("shows"))
          .selectExpr("n", "shows",
            "CAST(shows AS DOUBLE) / CAST(n AS DOUBLE) AS ps")
        val levels = p.where(col("n") > 0 && col("shows") > 0 &&
            col("shows") < col("n"))
          .select(col("n"), col("shows"), col("ps"),
            explode(sequence(lit(20L), lit(25L))).as("book"))
        import s.implicits._
        val scored = levels
          .select(col("book"), col("ps"), col("shows"), col("n"))
          .as[(Long, Double, Long, Long)]
          .map { case (book, ps, shows, n) =>
            // binomial pmf by Pascal recurrence, fixed op order
            var pmf = new Array[Double](book.toInt + 1)
            pmf(0) = math.pow(1.0 - ps, book.toDouble)
            var k = 1
            while (k <= book) {
              pmf(k) = pmf(k - 1) * ((book - k + 1).toDouble / k.toDouble) *
                (ps / (1.0 - ps))
              k += 1
            }
            var ev = 0.0
            var i = 0
            while (i <= book) {
              val showsI = i.toDouble
              val revenue = math.min(showsI, 20.0) * 100.0
              val bumps = math.max(showsI - 20.0, 0.0) * 250.0
              ev = ev + pmf(i) * (revenue - bumps)
              i += 1
            }
            (book, math.floor(ev * 1000).toLong, shows, n)
          }.toDF("book", "ev_milli", "shows", "n")
        scored
          .withColumn("rk", row_number().over(Window
            .orderBy(col("ev_milli").desc, col("book"))))
          .selectExpr("book", "ev_milli", "shows", "n",
            "CAST(CASE WHEN rk = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_best")
          .orderBy("book")
      },
      Some("""
        WITH RECURSIVE p AS (
          SELECT count(*) AS n,
                 sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                   AS shows,
                 CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                   AS DOUBLE) / CAST(count(*) AS DOUBLE) AS ps
          FROM orders),
        levels AS (SELECT p.*, gs.book
                   FROM p, (SELECT unnest(range(20, 26)) AS book) gs
                   WHERE n > 0 AND shows > 0 AND shows < n),
        pmf AS (
          SELECT book, ps, shows, n, CAST(0 AS BIGINT) AS k,
                 pow(1.0 - ps, CAST(book AS DOUBLE)) AS prob
          FROM levels
          UNION ALL
          SELECT book, ps, shows, n, k + 1,
                 prob * (CAST(book - k AS DOUBLE) / CAST(k + 1 AS DOUBLE))
                   * (ps / (1.0 - ps))
          FROM pmf WHERE k < book),
        ev AS (
          SELECT book, max(shows) AS shows, max(n) AS n,
                 CAST(floor(sum(prob * (least(CAST(k AS DOUBLE), 20.0) * 100.0
                   - greatest(CAST(k AS DOUBLE) - 20.0, 0.0) * 250.0))
                   * 1000) AS BIGINT) AS ev_milli
          FROM pmf GROUP BY book),
        rk AS (
          SELECT *, row_number() OVER (ORDER BY ev_milli DESC, book) AS r
          FROM ev)
        SELECT CAST(book AS BIGINT) AS book, ev_milli,
               CAST(shows AS BIGINT) AS shows, CAST(n AS BIGINT) AS n,
               CAST(CASE WHEN r = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_best
        FROM rk ORDER BY book""")),

    // --------------------------------------------------------------- q490
    QDef("q490_iv_wald",
      (s, dir) => {
        val users = t(s, dir, "events")
          .groupBy("user_id").agg(
            max(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("y"))
          .withColumn("z",
            pmod(graft.functions.PortableHash.md5Long(col("user_id"),
              salt = "iv~"), lit(2L)))
          // imperfect compliance: defiers flip assignment on a second bit
          .withColumn("defier",
            (pmod(graft.functions.PortableHash.md5Long(col("user_id"),
              salt = "df~"), lit(5L)) === 0).cast("long"))
          .withColumn("t", (col("z") + col("defier")) % 2)
        users.agg(
          sum(when(col("z") === 1, 1L).otherwise(0L)).cast("bigint").as("n1"),
          sum(when(col("z") === 0, 1L).otherwise(0L)).cast("bigint").as("n0"),
          sum(when(col("z") === 1, col("y")).otherwise(0L))
            .cast("bigint").as("y1"),
          sum(when(col("z") === 0, col("y")).otherwise(0L))
            .cast("bigint").as("y0"),
          sum(when(col("z") === 1, col("t")).otherwise(0L))
            .cast("bigint").as("t1"),
          sum(when(col("z") === 0, col("t")).otherwise(0L))
            .cast("bigint").as("t0"))
          .selectExpr("n1", "n0", "y1", "y0", "t1", "t0",
            "y1 * 1000000 DIV n1 - y0 * 1000000 DIV n0 AS itt_micro",
            "t1 * 1000000 DIV n1 - t0 * 1000000 DIV n0 AS fs_micro")
          .selectExpr("n1", "n0", "itt_micro", "fs_micro",
            "CASE WHEN fs_micro <> 0 THEN itt_micro * 1000000 DIV fs_micro ELSE 0 END AS late_micro")
      },
      Some(s"""
        WITH users AS (
          SELECT user_id,
                 max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS y,
                 ${graft.functions.PortableHash.md5LongSql("user_id", "iv~")}
                   % 2 AS z,
                 CASE WHEN ${graft.functions.PortableHash.md5LongSql(
                   "user_id", "df~")} % 5 = 0 THEN 1 ELSE 0 END AS defier
          FROM events GROUP BY user_id),
        u2 AS (SELECT user_id, y, z, (z + defier) % 2 AS t FROM users),
        agg AS (
          SELECT sum(CASE WHEN z = 1 THEN 1 ELSE 0 END) AS n1,
                 sum(CASE WHEN z = 0 THEN 1 ELSE 0 END) AS n0,
                 sum(CASE WHEN z = 1 THEN y ELSE 0 END) AS y1,
                 sum(CASE WHEN z = 0 THEN y ELSE 0 END) AS y0,
                 sum(CASE WHEN z = 1 THEN t ELSE 0 END) AS t1,
                 sum(CASE WHEN z = 0 THEN t ELSE 0 END) AS t0
          FROM u2),
        est AS (
          SELECT n1, n0,
                 y1 * 1000000 // n1 - y0 * 1000000 // n0 AS itt_micro,
                 t1 * 1000000 // n1 - t0 * 1000000 // n0 AS fs_micro
          FROM agg)
        SELECT CAST(n1 AS BIGINT) AS n1, CAST(n0 AS BIGINT) AS n0,
               CAST(itt_micro AS BIGINT) AS itt_micro,
               CAST(fs_micro AS BIGINT) AS fs_micro,
               CAST(CASE WHEN fs_micro <> 0
                 THEN itt_micro * 1000000 // fs_micro ELSE 0 END AS BIGINT)
                 AS late_micro
        FROM est"""))
  )
}
