package graft.queries

import graft.Tables.t
import org.apache.spark.sql.functions._

/** Round-5 coverage additions, part 134 — planner calibration, two more
  * deep TPC-H shapes, robust regression:
  *
  *  - q550: join-cardinality estimator audit: the System-R formula
  *    |A⋈B| ≈ |A|·|B|/max(d_A, d_B) against the TRUE join size for the
  *    three FK joins (lineitem–part, lineitem–supplier,
  *    orders–customer), error in bp. The calibration loop behind
  *    q138's sketch estimate and q408's join-order DP.
  *  - q551: TPC-H Q7 volume-shipping shape: revenue between the nation
  *    pair (NATION_3, NATION_8) in BOTH directions (supplier nation ×
  *    customer nation × ship year), exact integer centi-money.
  *  - q552: TPC-H Q16 parts/supplier relationship shape: distinct
  *    supplier count per (brand, type, size-bucket) over the lineitem
  *    link, excluding negative-balance suppliers (the complaints
  *    exclusion), top 20 by supplier count.
  *  - q553: Huber M-estimator of the daily revenue trend by two
  *    unrolled IRLS steps: plain OLS → ppm-quantized Huber weights
  *    (c = 1.345·MAD-free scale from the iid SE) → weighted OLS.
  *    Weighted component sums stay exact integers because the weights
  *    are ppm ints. The outlier-robust line beside q177's Theil–Sen.
  *
  * Scale shapes: q550/q551/q552 are hash joins + aggregations (the
  * bread-and-butter distributed shapes); q553's iterations run on the
  * bounded day aggregate.
  */
object QueriesEK extends QueryPack {
  import Q._

  private val revExpr =
    "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))"

  def defs: Seq[QDef] = Seq(

    // --------------------------------------------------------------- q550
    QDef("q550_join_card_error",
      (s, dir) => {
        def audit(name: String, a: org.apache.spark.sql.DataFrame,
            ka: String, b: org.apache.spark.sql.DataFrame, kb: String) = {
          val sa = a.agg(count(lit(1)).as("na"),
            countDistinct(col(ka)).as("da"))
          val sb = b.agg(count(lit(1)).as("nb"),
            countDistinct(col(kb)).as("db"))
          val actual = a.join(b, col(ka) === col(kb))
            .agg(count(lit(1)).as("actual"))
          sa.crossJoin(sb).crossJoin(actual)
            .selectExpr(s"'$name' AS join_name", "na", "nb", "da", "db",
              "actual", "na * nb DIV greatest(da, db) AS est")
        }
        val li = t(s, dir, "lineitem")
        val res = audit("lineitem_part",
            li.select(col("l_partkey")), "l_partkey",
            t(s, dir, "part").select(col("p_partkey")), "p_partkey")
          .unionAll(audit("lineitem_supplier",
            li.select(col("l_suppkey")), "l_suppkey",
            t(s, dir, "supplier").select(col("s_suppkey")), "s_suppkey"))
          .unionAll(audit("orders_customer",
            t(s, dir, "orders").select(col("o_custkey")), "o_custkey",
            t(s, dir, "customer").select(col("c_custkey")), "c_custkey"))
        res.where(expr("actual > 0"))
          .selectExpr("join_name", "na", "nb", "da", "db", "actual", "est",
            "abs(est - actual) * 10000 DIV actual AS err_bp")
          .orderBy("join_name")
      },
      Some("""
        WITH a1 AS (
          SELECT 'lineitem_part' AS join_name,
                 (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS na,
                 (SELECT CAST(count(*) AS BIGINT) FROM part) AS nb,
                 (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT)
                  FROM lineitem) AS da,
                 (SELECT CAST(count(DISTINCT p_partkey) AS BIGINT)
                  FROM part) AS db,
                 (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
                  JOIN part p ON l.l_partkey = p.p_partkey) AS actual),
        a2 AS (
          SELECT 'lineitem_supplier',
                 (SELECT count(*) FROM lineitem),
                 (SELECT count(*) FROM supplier),
                 (SELECT count(DISTINCT l_suppkey) FROM lineitem),
                 (SELECT count(DISTINCT s_suppkey) FROM supplier),
                 (SELECT count(*) FROM lineitem l
                  JOIN supplier s ON l.l_suppkey = s.s_suppkey)),
        a3 AS (
          SELECT 'orders_customer',
                 (SELECT count(*) FROM orders),
                 (SELECT count(*) FROM customer),
                 (SELECT count(DISTINCT o_custkey) FROM orders),
                 (SELECT count(DISTINCT c_custkey) FROM customer),
                 (SELECT count(*) FROM orders o
                  JOIN customer c ON o.o_custkey = c.c_custkey)),
        u AS (SELECT * FROM a1 UNION ALL SELECT * FROM a2
              UNION ALL SELECT * FROM a3)
        SELECT join_name, CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
               CAST(da AS BIGINT) AS da, CAST(db AS BIGINT) AS db,
               CAST(actual AS BIGINT) AS actual,
               CAST(na * nb // greatest(da, db) AS BIGINT) AS est,
               CAST(abs(na * nb // greatest(da, db) - actual) * 10000
                 // actual AS BIGINT) AS err_bp
        FROM u WHERE actual > 0
        ORDER BY join_name""")),

    // --------------------------------------------------------------- q551
    QDef("q551_volume_shipping",
      (s, dir) => {
        val nat = broadcast(t(s, dir, "nation")
          .where(expr("n_name IN ('NATION_3', 'NATION_8')"))
          .selectExpr("n_nationkey AS nk", "n_name"))
        val supp = t(s, dir, "supplier")
          .join(nat, expr("s_nationkey = nk"))
          .selectExpr("s_suppkey", "n_name AS supp_nation")
        val cust = t(s, dir, "customer")
          .join(nat, expr("c_nationkey = nk"))
          .selectExpr("c_custkey", "n_name AS cust_nation")
        t(s, dir, "lineitem")
          .selectExpr("l_orderkey", "l_suppkey",
            "unix_millis(CAST(l_shipdate AS TIMESTAMP)) DIV 86400000 DIV 365 AS shipyear",
            s"$revExpr AS rev")
          .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
            expr("l_orderkey = o_orderkey"))
          .join(broadcast(supp), expr("l_suppkey = s_suppkey"))
          .join(broadcast(cust), expr("o_custkey = c_custkey"))
          .where(expr("supp_nation <> cust_nation"))
          .groupBy("supp_nation", "cust_nation", "shipyear")
          .agg(count(lit(1)).as("n_items"),
            sum("rev").cast("long").as("rev_cp"))
          .orderBy("supp_nation", "cust_nation", "shipyear")
      },
      Some(s"""
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               epoch_ms(l.l_shipdate) // 86400000 // 365 AS shipyear,
               CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum($revExpr) AS BIGINT) AS rev_cp
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        WHERE sn.n_name IN ('NATION_3', 'NATION_8')
          AND cn.n_name IN ('NATION_3', 'NATION_8')
          AND sn.n_name <> cn.n_name
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3""")),

    // --------------------------------------------------------------- q552
    QDef("q552_partsupp_count",
      (s, dir) => {
        val badSupp = t(s, dir, "supplier")
          .where(expr("s_acctbal < 0"))
          .select(col("s_suppkey").as("bad"))
        val link = t(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_suppkey")).distinct()
          .join(broadcast(badSupp), col("l_suppkey") === col("bad"), "left_anti")
        link.join(t(s, dir, "part")
            .selectExpr("p_partkey", "p_brand", "p_type", "p_size DIV 10 AS szb"),
            expr("l_partkey = p_partkey"))
          .groupBy("p_brand", "p_type", "szb")
          .agg(countDistinct("l_suppkey").as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
            col("szb"))
          .limit(20)
      },
      Some("""
        WITH link AS (
          SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
          WHERE l_suppkey NOT IN
            (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)),
        g AS (
          SELECT p.p_brand, p.p_type, p.p_size // 10 AS szb,
                 CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
          FROM link l JOIN part p ON l.l_partkey = p.p_partkey
          GROUP BY 1, 2, 3)
        SELECT p_brand, p_type, CAST(szb AS BIGINT) AS szb, supplier_cnt
        FROM g
        ORDER BY supplier_cnt DESC, p_brand, p_type, szb
        LIMIT 20""")),

    // --------------------------------------------------------------- q553
    QDef("q553_huber_irls",
      (s, dir) => {
        // Driver-census IRLS (r11, the q453/q467/q561 recipe): the day
        // census is calendar-bounded (≤ ~2.5k rows at ANY data scale),
        // so ONE distributed job aggregates orders to (day, y) and the
        // whole OLS → scale → two Huber reweight iterations run in Scala
        // over the collected census — replacing ~7 chained agg/crossJoin
        // jobs of pure job floor (2.2 s isolated at sf0.1). Arithmetic
        // mirrors the oracle exactly: exact BigInt weighted sums (the
        // DECIMAL(38,0)/HUGEINT lane), double math in the same operation
        // order, floor-quantized output.
        val sc2 = s
        import sc2.implicits._
        val rows = t(s, dir, "orders")
          .where(col("o_totalprice").isNotNull)
          .selectExpr(
            "unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000 AS day",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
          .groupBy("day").agg(expr("CAST(sum(cents) AS BIGINT) DIV 1000 AS y"))
          .collect().map(r => (r.getAs[Long]("day"), r.getAs[Long]("y")))
        def empty = Seq.empty[(Long, Long, Long, Long)]
          .toDF("a_milli", "b_milli", "c_milli", "n_downweighted")
        if (rows.isEmpty) empty
        else {
          val d0 = rows.iterator.map(_._1).min
          val xy = rows.map { case (d, y) => (d - d0, y) }
          def ols(ws: Array[Long]): Option[(Double, Double)] = {
            var sw = 0L
            var swx, swy, swxx, swxy = BigInt(0)
            var i = 0
            while (i < xy.length) {
              val (x, y) = xy(i); val w = ws(i)
              sw += w
              swx += BigInt(w) * x
              swy += BigInt(w) * y
              swxx += BigInt(w) * x * x
              swxy += BigInt(w) * x * y
              i += 1
            }
            val (swD, swxD, swyD, swxxD, swxyD) = (sw.toDouble,
              swx.toDouble, swy.toDouble, swxx.toDouble, swxy.toDouble)
            if (sw > 0 && swD * swxxD > swxD * swxD) {
              val b = (swD * swxyD - swxD * swyD) / (swD * swxxD - swxD * swxD)
              val a = (swyD - b * swxD) / swD
              Some((a, b))
            } else None
          }
          ols(Array.fill(xy.length)(1L)) match {
            case None => empty
            case Some((a0, b0)) =>
              // robust scale: sqrt of mean squared residual of the OLS
              // fit, tuning constant c = 1.345 * scale (classic Huber);
              // floor(r²) summed exactly (the DECIMAL(38,0) lane)
              var srr = BigInt(0)
              xy.foreach { case (x, y) =>
                val r = y - (a0 + b0 * x)
                srr += BigDecimal(math.floor(r * r)).toBigInt
              }
              val c = 1.345 * math.sqrt(srr.toDouble / xy.length)
              def weights(a: Double, b: Double): (Array[Long], Long) = {
                val ws = new Array[Long](xy.length)
                var nd = 0L
                var i = 0
                while (i < xy.length) {
                  val (x, y) = xy(i)
                  val ar = math.abs(y - (a + b * x))
                  val w = if (ar <= c) 1000000L
                          else math.floor(c / ar * 1000000).toLong
                  if (w < 1000000L) nd += 1
                  ws(i) = w; i += 1
                }
                (ws, nd)
              }
              val res = for {
                (a1, b1) <- ols(weights(a0, b0)._1)
                wn2 = weights(a1, b1)
                (a2, b2) <- ols(wn2._1)
              } yield (math.floor(a2 * 1000).toLong,
                math.floor(b2 * 1000).toLong,
                math.floor(c * 1000).toLong, wn2._2)
              res.map(Seq(_).toDF(
                  "a_milli", "b_milli", "c_milli", "n_downweighted"))
                .getOrElse(empty)
          }
        }
      },
      Some("""
        WITH daily AS (
          SELECT day, CAST(sum(cents) AS BIGINT) // 1000 AS y FROM (
            SELECT epoch_ms(o_orderdate) // 86400000 AS day,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
            FROM orders WHERE o_totalprice IS NOT NULL)
          GROUP BY day),
        d0 AS (SELECT CAST(min(day) AS BIGINT) AS d0 FROM daily),
        xy AS (SELECT day - d0 AS x, y FROM daily, d0),
        f0 AS (
          SELECT (CAST(sw AS DOUBLE)*swxy - CAST(swx AS DOUBLE)*swy)
                   / (CAST(sw AS DOUBLE)*swxx - CAST(swx AS DOUBLE)*swx) AS b,
                 (CAST(swy AS DOUBLE) - (CAST(sw AS DOUBLE)*swxy - CAST(swx AS DOUBLE)*swy)
                   / (CAST(sw AS DOUBLE)*swxx - CAST(swx AS DOUBLE)*swx) * swx) / sw AS a
          FROM (
            SELECT CAST(count(*) AS BIGINT) AS sw,
                   CAST(sum(x) AS HUGEINT) AS swx,
                   CAST(sum(y) AS HUGEINT) AS swy,
                   CAST(sum(x*x) AS HUGEINT) AS swxx,
                   CAST(sum(x*y) AS HUGEINT) AS swxy
            FROM xy)
          WHERE sw > 0 AND CAST(sw AS DOUBLE)*swxx > CAST(swx AS DOUBLE)*swx),
        sc AS (
          SELECT a, b, 1.345 * sqrt(CAST(srr AS DOUBLE) / n) AS c
          FROM (
            SELECT max(f.a) AS a, max(f.b) AS b,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(floor((xy.y - (f.a + f.b * xy.x))
                     * (xy.y - (f.a + f.b * xy.x))) AS HUGEINT)) AS HUGEINT)
                     AS srr
            FROM xy, f0 f)),
        w1 AS (
          SELECT x, y, c,
                 CAST(CASE WHEN abs(y - (a + b * x)) <= c THEN 1000000
                   ELSE floor(c / abs(y - (a + b * x)) * 1000000) END
                   AS BIGINT) AS w
          FROM xy, sc),
        f1 AS (
          SELECT (CAST(sw AS DOUBLE)*swxy - CAST(swx AS DOUBLE)*swy)
                   / (CAST(sw AS DOUBLE)*swxx - CAST(swx AS DOUBLE)*swx) AS b,
                 (CAST(swy AS DOUBLE) - (CAST(sw AS DOUBLE)*swxy - CAST(swx AS DOUBLE)*swy)
                   / (CAST(sw AS DOUBLE)*swxx - CAST(swx AS DOUBLE)*swx) * swx) / sw AS a,
                 max(c2) AS c
          FROM (
            SELECT CAST(sum(w) AS BIGINT) AS sw,
                   CAST(sum(CAST(w AS HUGEINT)*x) AS HUGEINT) AS swx,
                   CAST(sum(CAST(w AS HUGEINT)*y) AS HUGEINT) AS swy,
                   CAST(sum(CAST(w AS HUGEINT)*x*x) AS HUGEINT) AS swxx,
                   CAST(sum(CAST(w AS HUGEINT)*x*y) AS HUGEINT) AS swxy,
                   max(c) AS c2
            FROM w1)
          GROUP BY sw, swx, swy, swxx, swxy, c2
          HAVING sw > 0 AND CAST(sw AS DOUBLE)*swxx > CAST(swx AS DOUBLE)*swx),
        w2 AS (
          SELECT x, y, c,
                 CAST(CASE WHEN abs(y - (a + b * x)) <= c THEN 1000000
                   ELSE floor(c / abs(y - (a + b * x)) * 1000000) END
                   AS BIGINT) AS w
          FROM xy, f1),
        f2 AS (
          SELECT (CAST(sw AS DOUBLE)*swxy - CAST(swx AS DOUBLE)*swy)
                   / (CAST(sw AS DOUBLE)*swxx - CAST(swx AS DOUBLE)*swx) AS b,
                 (CAST(swy AS DOUBLE) - (CAST(sw AS DOUBLE)*swxy - CAST(swx AS DOUBLE)*swy)
                   / (CAST(sw AS DOUBLE)*swxx - CAST(swx AS DOUBLE)*swx) * swx) / sw AS a,
                 max(c2) AS c, max(nd) AS ndown
          FROM (
            SELECT CAST(sum(w) AS BIGINT) AS sw,
                   CAST(sum(CAST(w AS HUGEINT)*x) AS HUGEINT) AS swx,
                   CAST(sum(CAST(w AS HUGEINT)*y) AS HUGEINT) AS swy,
                   CAST(sum(CAST(w AS HUGEINT)*x*x) AS HUGEINT) AS swxx,
                   CAST(sum(CAST(w AS HUGEINT)*x*y) AS HUGEINT) AS swxy,
                   max(c) AS c2,
                   CAST(sum(CASE WHEN w < 1000000 THEN 1 ELSE 0 END)
                     AS BIGINT) AS nd
            FROM w2)
          GROUP BY sw, swx, swy, swxx, swxy, c2, nd
          HAVING sw > 0 AND CAST(sw AS DOUBLE)*swxx > CAST(swx AS DOUBLE)*swx)
        SELECT CAST(floor(a * 1000) AS BIGINT) AS a_milli,
               CAST(floor(b * 1000) AS BIGINT) AS b_milli,
               CAST(floor(c * 1000) AS BIGINT) AS c_milli,
               ndown AS n_downweighted
        FROM f2"""))
  )
}
