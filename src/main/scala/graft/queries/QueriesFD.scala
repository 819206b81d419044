package graft.queries

import graft.Tables.t
import graft.functions.PortableHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-7 coverage additions, part 153 — spectral decomposition, log
  * template mining, Bloom sizing, and inequality decomposition:
  *
  *  - q625: top-2 principal directions of the embedding second-moment
  *    matrix via INTEGER-EXACT power iteration with deflation: bounded
  *    deterministic sample (lowest-2048 md5 order — TakeOrdered, fixed
  *    at any corpus size), 64×64 moment matrix, PcaIters (8) iterations with
  *    integer rescaling (v ← (S·v)·10⁶ intdiv max|S·v|), Rayleigh
  *    quotient and rank-1 deflation over a common denominator — every
  *    arithmetic step is DECIMAL(38,0)/HUGEINT, zero FP (q144's
  *    one-step sibling, upgraded to converged top-2).
  *  - q626: log-template mining (Drain-lite): digit-masked 60-char
  *    prefixes as templates, top-10 census + corpus coverage — the log
  *    dedup/triage operator.
  *  - q627: Bloom-filter sizing planner: for each join-key candidate,
  *    ndv drives optimal bits m = ceil(n·(−ln p)/ln²2) and k hashes at
  *    1% / 0.1% fpp — CONSTANT ln factors as exact integer literals
  *    (×10⁴), so the planner is pure integer math (sizes what
  *    q97/q480 deploy).
  *  - q628: Theil inequality decomposition T = T_within + T_between
  *    over positive customer balances by nation. Per-row ln terms are
  *    floored to micro-integers FIRST, then integer-summed (no
  *    FP-addition order sensitivity); ratios enter ln as exact
  *    integer-derived doubles.
  *
  * Scale shapes: q625 is bounded by the fixed sample (the ONLY
  * at-scale work is the top-k hash scan); q626 one census shuffle +
  * top-k; q627 three distinct-count aggs; q628 one pass + a
  * nation-domain census.
  */
object QueriesFD extends QueryPack {
  import Q._

  private val PcaIters = 8
  private val PcaSample = 2048

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q625
    QDef("q625_pca_top2",
      (s, dir) => {
        val ex0 = t(s, dir, "embeddings")
          .select(col("vec_id"),
            PortableHash.md5Long(col("vec_id").cast("string")).as("hk"),
            col("embedding"))
          .orderBy("hk", "vec_id").limit(PcaSample)
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "xf")))
          .selectExpr("vec_id", "CAST(d AS BIGINT) AS d",
            "CAST(floor(CAST(xf AS DOUBLE) * 1000) AS BIGINT) AS xq")
        // the ONLY at-scale work is the sample scan + this 64×64 moment
        // matrix; the eigensolve itself runs on the driver over the
        // collected Gramian — the same split Spark MLlib's
        // RowMatrix.computePrincipalComponents uses. All driver math is
        // BigInt (mirrors the oracle's HUGEINT: / truncates toward 0).
        val smatRows = ex0.selectExpr("vec_id", "d AS i", "xq AS xi")
          .join(ex0.selectExpr("vec_id", "d AS j", "xq AS xj"), Seq("vec_id"))
          .groupBy("i", "j")
          .agg(sum(expr("xi * xj")).cast("long").as("sv"))
          .collect() // bounded: exactly 64×64 cells
        val D = 64
        val S0 = Array.ofDim[BigInt](D, D)
        for (i <- 0 until D; j <- 0 until D) S0(i)(j) = BigInt(0)
        smatRows.foreach(r => S0(r.getAs[Long]("i").toInt)(
          r.getAs[Long]("j").toInt) = BigInt(r.getAs[Long]("sv")))
        def iterate(m0: Array[Array[BigInt]]): Array[BigInt] = {
          var v = Array.tabulate(D)(i => BigInt(((i * 37) % 100 - 50) * 20000))
          for (_ <- 1 to PcaIters) {
            val w = Array.tabulate(D)(i =>
              (0 until D).map(j => m0(i)(j) * v(j)).sum)
            val m = w.map(_.abs).max.max(BigInt(1))
            v = w.map(x => x * 1000000 / m)
          }
          v
        }
        def rayleigh(m0: Array[Array[BigInt]], v: Array[BigInt]): (BigInt, BigInt) = {
          val num = (0 until D).map(i =>
            v(i) * (0 until D).map(j => m0(i)(j) * v(j)).sum).sum
          // empty/degenerate sample collapses v to the zero vector; the
          // oracle guards the same spot with greatest(max(abs(w)), 1)
          val den = v.map(x => x * x).sum.max(BigInt(1))
          (num, den)
        }
        val v1 = iterate(S0)
        val (num1, den1) = rayleigh(S0, v1)
        // deflate over the common denominator den²:
        // S' = (S·den² − num·v vᵀ) intdiv den²  — elementwise integer
        val S2 = Array.tabulate(D, D)((i, j) =>
          (S0(i)(j) * den1 * den1 - num1 * v1(i) * v1(j)) / (den1 * den1))
        val v2 = iterate(S2)
        val (num2, den2) = rayleigh(S2, v2)
        val s2s = s
        import s2s.implicits._
        val rows =
          (0 until D).map(d => (1L, d.toLong, v1(d).toLong, (num1 / den1).toLong)) ++
          (0 until D).map(d => (2L, d.toLong, v2(d).toLong, (num2 / den2).toLong))
        rows.toDF("component", "dim", "loading_micro", "lam_scaled")
          .orderBy("component", "dim")
      },
      Some {
        val hSql = PortableHash.md5LongSql("CAST(vec_id AS VARCHAR)")
        def iterSql(tag: String, mat: String): String =
          (1 to PcaIters).map { k =>
            s"""w$tag$k AS MATERIALIZED (
                 SELECT s.i AS dim, sum(s.sv * v.x) AS w
                 FROM $mat s JOIN v$tag${k - 1} v ON s.j = v.dim GROUP BY 1),
               m$tag$k AS MATERIALIZED (SELECT greatest(max(abs(w)), 1) AS m FROM w$tag$k),
               v$tag$k AS MATERIALIZED (
                 SELECT dim, CAST(w * 1000000 // m AS BIGINT) AS x
                 FROM w$tag$k, m$tag$k)"""
          }.mkString(",\n")
        val vLast = s"v1$PcaIters"
        val uLast = s"v2$PcaIters"
        s"""
        WITH ranked AS (
          SELECT vec_id, embedding
          FROM embeddings
          ORDER BY $hSql, vec_id LIMIT $PcaSample),
        ex AS MATERIALIZED (
          SELECT vec_id, CAST(i - 1 AS BIGINT) AS d,
                 CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS xq
          FROM ranked, unnest(range(1, len(embedding) + 1)) AS t(i)),
        smat AS MATERIALIZED (
          SELECT a.d AS i, b.d AS j, CAST(sum(a.xq * b.xq) AS BIGINT) AS sv
          FROM ex a JOIN ex b ON a.vec_id = b.vec_id
          GROUP BY 1, 2),
        v10 AS (SELECT CAST(i AS BIGINT) AS dim,
                       ((i * 37) % 100 - 50) * 20000 AS x
                FROM range(0, 64) t(i)),
        ${iterSql("1", "smat")},
        nd1 AS MATERIALIZED (
          SELECT (SELECT sum(w.w * v.x)
                  FROM (SELECT s.i, sum(s.sv * vv.x) AS w
                        FROM smat s JOIN $vLast vv ON s.j = vv.dim
                        GROUP BY 1) w JOIN $vLast v ON w.i = v.dim) AS num,
                 (SELECT sum(x * x) FROM $vLast) AS den),
        smat2 AS MATERIALIZED (
          SELECT s.i, s.j,
                 CAST((CAST(s.sv AS HUGEINT) * nd1.den * nd1.den
                       - nd1.num * vi.x * vj.x)
                   // (nd1.den * nd1.den) AS BIGINT) AS sv
          FROM smat s
          JOIN $vLast vi ON s.i = vi.dim
          JOIN $vLast vj ON s.j = vj.dim, nd1),
        v20 AS (SELECT CAST(i AS BIGINT) AS dim,
                       ((i * 37) % 100 - 50) * 20000 AS x
                FROM range(0, 64) t(i)),
        ${iterSql("2", "smat2")},
        nd2 AS MATERIALIZED (
          SELECT (SELECT sum(w.w * v.x)
                  FROM (SELECT s.i, sum(s.sv * vv.x) AS w
                        FROM smat2 s JOIN $uLast vv ON s.j = vv.dim
                        GROUP BY 1) w JOIN $uLast v ON w.i = v.dim) AS num,
                 (SELECT sum(x * x) FROM $uLast) AS den)
        SELECT CAST(1 AS BIGINT) AS component, dim, x AS loading_micro,
               CAST(nd1.num // nd1.den AS BIGINT) AS lam_scaled
        FROM $vLast, nd1
        UNION ALL
        SELECT CAST(2 AS BIGINT) AS component, dim, x AS loading_micro,
               CAST(nd2.num // nd2.den AS BIGINT) AS lam_scaled
        FROM $uLast, nd2
        ORDER BY component, dim"""
      }),

    // --------------------------------------------------------------- q626
    QDef("q626_log_templates",
      (s, dir) => {
        val masked = t(s, dir, "documents")
          .where(col("text").isNotNull)
          .selectExpr(
            "substring(regexp_replace(text, '[0-9]+', '#'), 1, 60) AS tmpl")
        masked.cache(); masked.count() // eager: census + total
        val census = masked.groupBy("tmpl")
          .agg(count(lit(1)).cast("long").as("n_docs"))
        val tot = masked.agg(count(lit(1)).cast("long").as("total"))
        census.orderBy(col("n_docs").desc, col("tmpl")).limit(10)
          .crossJoin(broadcast(tot))
          .selectExpr("tmpl", "n_docs",
            "n_docs * 10000 DIV total AS coverage_bp")
          .orderBy(col("n_docs").desc, col("tmpl"))
      },
      Some("""
        WITH masked AS (
          SELECT substring(regexp_replace(text, '[0-9]+', '#', 'g'), 1, 60)
            AS tmpl
          FROM documents WHERE text IS NOT NULL),
        census AS (SELECT tmpl, CAST(count(*) AS BIGINT) AS n_docs
                   FROM masked GROUP BY 1),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM masked)
        SELECT tmpl, n_docs, n_docs * 10000 // total AS coverage_bp
        FROM census, tot
        ORDER BY n_docs DESC, tmpl LIMIT 10""")),

    // --------------------------------------------------------------- q627
    QDef("q627_bloom_planner",
      (s, dir) => {
        // m = ceil(n·c_p) with c_p = −ln(p)/ln²2 as exact ×10⁴ integer
        // literals: c(1%) = 9.5851, c(0.1%) = 14.3777; k = round(c·ln2)
        val keys = Seq(
          ("orders.o_custkey",
            t(s, dir, "orders").agg(countDistinct("o_custkey"))),
          ("lineitem.l_partkey",
            t(s, dir, "lineitem").agg(countDistinct("l_partkey"))),
          ("events.user_id",
            t(s, dir, "events").agg(countDistinct("user_id"))))
        val base = keys.map { case (name, df) =>
          df.toDF("ndv").selectExpr(s"'$name' AS key_name",
            "CAST(ndv AS BIGINT) AS ndv")
        }.reduce(_ unionByName _)
        val fpps = Seq((100L, 95851L, 7L), (10L, 143776L, 10L))
        fpps.map { case (fppBp, c4, k) =>
          base.selectExpr("key_name", "ndv",
            s"CAST($fppBp AS BIGINT) AS fpp_bp",
            s"(ndv * $c4 + 9999) DIV 10000 AS m_bits",
            s"CAST($k AS BIGINT) AS k_hashes")
            .selectExpr("key_name", "ndv", "fpp_bp", "m_bits", "k_hashes",
              "(m_bits + 7) DIV 8 AS n_bytes")
        }.reduce(_ unionByName _)
          .orderBy("key_name", "fpp_bp")
      },
      Some {
        val keys = Seq(
          ("orders.o_custkey", "SELECT count(DISTINCT o_custkey) FROM orders"),
          ("lineitem.l_partkey", "SELECT count(DISTINCT l_partkey) FROM lineitem"),
          ("events.user_id", "SELECT count(DISTINCT user_id) FROM events"))
        val base = keys.map { case (n, q) =>
          s"SELECT '$n' AS key_name, CAST(($q) AS BIGINT) AS ndv"
        }.mkString(" UNION ALL ")
        val fpps = Seq((100L, 95851L, 7L), (10L, 143776L, 10L))
        val rows = fpps.map { case (fppBp, c4, k) =>
          s"""SELECT key_name, ndv, CAST($fppBp AS BIGINT) AS fpp_bp,
                (ndv * $c4 + 9999) // 10000 AS m_bits,
                CAST($k AS BIGINT) AS k_hashes,
                ((ndv * $c4 + 9999) // 10000 + 7) // 8 AS n_bytes
              FROM base"""
        }.mkString(" UNION ALL ")
        s"""
        WITH base AS ($base)
        SELECT key_name, ndv, fpp_bp, CAST(m_bits AS BIGINT) AS m_bits,
               k_hashes, CAST(n_bytes AS BIGINT) AS n_bytes
        FROM ($rows)
        ORDER BY key_name, fpp_bp"""
      }),

    // --------------------------------------------------------------- q628
    QDef("q628_theil_decomposition",
      (s, dir) => {
        val cust = t(s, dir, "customer")
          .selectExpr("c_nationkey AS nk",
            "CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS x")
          .where(col("x") > 0)
        cust.cache(); cust.count() // eager: totals + groups + per-row terms
        val tot = cust.agg(sum("x").cast("long").as("s"),
          count(lit(1)).as("n"))
        val grp = cust.groupBy("nk").agg(sum("x").cast("long").as("sg"),
          count(lit(1)).as("ng"))
        // per-row within term: x·ln(x·Ng/Sg), floored to a micro integer
        // BEFORE summation — integer sums are order-insensitive, so the
        // cross-engine result does not depend on aggregation order
        val within = cust.join(broadcast(grp), Seq("nk"))
          .selectExpr("nk",
            """CAST(floor(CAST(x AS DOUBLE)
                 * ln(CAST(x AS DOUBLE) * ng / sg) * 1000000.0) AS BIGINT)
               AS tw""")
          .groupBy("nk").agg(sum("tw").cast("long").as("within_num_micro"))
        grp.join(within, Seq("nk"))
          .crossJoin(broadcast(tot))
          .selectExpr("nk", "ng", "sg", "within_num_micro",
            """CAST(floor(CAST(sg AS DOUBLE)
                 * ln((CAST(sg AS DOUBLE) * n) / (CAST(s AS DOUBLE) * ng))
                 * 1000000.0) AS BIGINT) AS between_num_micro""",
            // nation contributions to T (divide the micro numerators by
            // the exact global sum S)
            "within_num_micro DIV s AS t_within_micro",
            """CAST(floor(CAST(sg AS DOUBLE)
                 * ln((CAST(sg AS DOUBLE) * n) / (CAST(s AS DOUBLE) * ng))
                 * 1000000.0) AS BIGINT) DIV s AS t_between_micro""")
          .orderBy("nk")
      },
      Some("""
        WITH cust AS (
          SELECT c_nationkey AS nk,
                 CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS x
          FROM customer
          WHERE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) > 0),
        tot AS (SELECT CAST(sum(x) AS BIGINT) AS s,
                       CAST(count(*) AS BIGINT) AS n FROM cust),
        grp AS (SELECT nk, CAST(sum(x) AS BIGINT) AS sg,
                       CAST(count(*) AS BIGINT) AS ng
                FROM cust GROUP BY 1),
        within AS (
          SELECT c.nk,
                 CAST(sum(CAST(floor(CAST(c.x AS DOUBLE)
                   * ln(CAST(c.x AS DOUBLE) * g.ng / g.sg) * 1000000.0)
                   AS BIGINT)) AS BIGINT) AS within_num_micro
          FROM cust c JOIN grp g ON c.nk = g.nk
          GROUP BY 1)
        SELECT g.nk, g.ng, g.sg, w.within_num_micro,
               CAST(floor(CAST(g.sg AS DOUBLE)
                 * ln((CAST(g.sg AS DOUBLE) * t.n) / (CAST(t.s AS DOUBLE) * g.ng))
                 * 1000000.0) AS BIGINT) AS between_num_micro,
               w.within_num_micro // t.s AS t_within_micro,
               CAST(floor(CAST(g.sg AS DOUBLE)
                 * ln((CAST(g.sg AS DOUBLE) * t.n) / (CAST(t.s AS DOUBLE) * g.ng))
                 * 1000000.0) AS BIGINT) // t.s AS t_between_micro
        FROM grp g JOIN within w ON g.nk = w.nk, tot t
        ORDER BY g.nk"""))
  )
}
