package graft.queries

import graft.Tables.t
import graft.dedup.Dedup
import graft.functions.{PortableHash, TextFunctions}
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 31:
  *
  *  - q161: dedup METHOD-AGREEMENT audit — the near-dup pair sets found
  *    by MinHash-LSH (exact-Jaccard ≥ 0.6 verified) and by SimHash
  *    (hamming ≤ 3) over the same corpus: sizes, intersection, union,
  *    pair-set Jaccard in bp. The "do my two dedup indexes agree"
  *    quality gate a pipeline runs before trusting either at 100 TB.
  *  - q162: broadcast-decision planner — per candidate dimension table:
  *    exact row count and byte estimate (8 B per numeric + string
  *    lengths), and the broadcast-vs-shuffle decision at a 10 MiB
  *    threshold: the join-strategy table an engine's CBO consults,
  *    computed as a query.
  *  - q163: completeness matrix — expected (day × event_type) grid vs
  *    observed: per type, days present/missing and the first missing
  *    day. The data-completeness monitor (complements q90's gap fill
  *    and q103's DQ gate).
  */
object QueriesAL extends QueryPack {
  import Q._

  def defs: Seq[QDef] = Seq(

    QDef("q161_dedup_agreement",
      (s, dir) => {
        val docs = QueriesC.shingled(s, dir)
        val lshPairs = Dedup.lshCandidates(docs.select("doc_id", "sig"),
            "doc_id", "sig", nHashes = 6, bandSize = 2)
          .join(docs.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
          .join(docs.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
          .withColumn("inter", Dedup.sortedIntersectCount("sh_a", "sh_b"))
          .withColumn("jac_bp", Dedup.jaccardBpFromInter(col("inter"), "sh_a", "sh_b"))
          .where(col("jac_bp") >= 6000)
          .select("id_a", "id_b")
          .cache() // read by n_minhash AND the intersect
        val exploded = t(s, dir, "documents")
          .withColumn("w", TextFunctions.words(col("text")))
          .filter(size(col("w")) > 0)
          .select(col("doc_id"), explode(col("w")).as("word"))
        val sh = Dedup.simhashAgg(exploded, "doc_id", "word").cache()
        sh.count()
        val bands = sh.select(col("doc_id"), col("sh"),
          posexplode(array((0 until 4).map(b =>
            shiftright(col("sh"), 8 * b).bitwiseAND(lit(255L))): _*)).as(Seq("band", "bval")))
        val shPairs = bands.as("a").join(bands.as("b"),
            col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
            col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
          .distinct()
          .where(Dedup.hamming(col("sh_a"), col("sh_b")) <= 3)
          .select("id_a", "id_b")
          .cache() // read by n_simhash AND the intersect
        lshPairs.count(); shPairs.count() // eager before the shared job
        val nA = lshPairs.agg(count(lit(1)).as("n_minhash"))
        val nB = shPairs.agg(count(lit(1)).as("n_simhash"))
        val nI = lshPairs.intersect(shPairs).agg(count(lit(1)).as("n_both"))
        nA.crossJoin(nB).crossJoin(nI)
          .selectExpr("n_minhash", "n_simhash", "n_both",
            "n_minhash + n_simhash - n_both AS n_union",
            """CASE WHEN n_minhash + n_simhash - n_both > 0
               THEN n_both * 10000 DIV (n_minhash + n_simhash - n_both)
               ELSE 0L END AS agreement_bp""")
      },
      Some {
        val wSql = TextFunctions.wordsSql("text")
        val hwSql = s"list_transform(w, x -> ${PortableHash.md5LongSql("x")})"
        val bandSelects = (0 until 4).map { b =>
          s"SELECT doc_id, sh, $b AS band, (sh >> ${8 * b}) & 255 AS bval FROM shdocs"
        }.mkString(" UNION ALL ")
        s"""
        ${QueriesC.candidatePairsSql},
        lsh AS (
          SELECT p.id_a, p.id_b
          FROM pairs p JOIN docs da ON da.doc_id = p.id_a
                       JOIN docs db ON db.doc_id = p.id_b
          WHERE ${Dedup.jaccardBpSql("da.sh", "db.sh")} >= 6000),
        d2 AS (SELECT doc_id, $hwSql AS hw
               FROM (SELECT doc_id, $wSql AS w FROM documents) WHERE len(w) > 0),
        shdocs AS (SELECT doc_id, ${Dedup.simhash32Sql("hw")} AS sh FROM d2),
        shbands AS ($bandSelects),
        shp AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM shbands a JOIN shbands b
            ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
          WHERE ${Dedup.hammingSql("a.sh", "b.sh")} <= 3),
        nA AS (SELECT count(*) AS n_minhash FROM lsh),
        nB AS (SELECT count(*) AS n_simhash FROM shp),
        nI AS (SELECT count(*) AS n_both FROM
                 (SELECT * FROM lsh INTERSECT SELECT * FROM shp))
        SELECT CAST(n_minhash AS BIGINT) AS n_minhash,
               CAST(n_simhash AS BIGINT) AS n_simhash,
               CAST(n_both AS BIGINT) AS n_both,
               CAST(n_minhash + n_simhash - n_both AS BIGINT) AS n_union,
               CASE WHEN n_minhash + n_simhash - n_both > 0
                 THEN CAST(n_both * 10000 // (n_minhash + n_simhash - n_both) AS BIGINT)
                 ELSE 0 END AS agreement_bp
        FROM nA, nB, nI"""
      }),

    QDef("q162_join_planner",
      (s, dir) => {
        import s.implicits._
        val thresholdBytes = 10L * 1024 * 1024
        def stats(name: String, strCols: Seq[String], nNum: Int) = {
          val df = t(s, dir, name)
          val bytesE = strCols.map(c => s"coalesce(length($c), 0)")
            .mkString(" + ") match {
            case "" => s"${8 * nNum}"
            case e => s"$e + ${8 * nNum}"
          }
          df.agg(count(lit(1)).as("n_rows"),
              sum(expr(bytesE)).cast("bigint").as("est_bytes"))
            .withColumn("tbl", lit(name))
        }
        stats("region", Seq("r_name"), 1)
          .unionByName(stats("nation", Seq("n_name"), 2))
          .unionByName(stats("customer", Seq("c_name", "c_mktsegment"), 3))
          .unionByName(stats("supplier", Seq("s_name"), 3))
          .unionByName(stats("part", Seq("p_name", "p_brand", "p_type"), 3))
          .withColumn("broadcastable",
            col("est_bytes") <= lit(thresholdBytes))
          .select("tbl", "n_rows", "est_bytes", "broadcastable")
          .orderBy("tbl")
      },
      Some {
        val th = 10L * 1024 * 1024
        def one(name: String, strCols: Seq[String], nNum: Int) = {
          val bytesE = (strCols.map(c => s"coalesce(length($c), 0)") :+
            s"${8 * nNum}").mkString(" + ")
          s"""SELECT '$name' AS tbl, count(*) AS n_rows,
                CAST(sum($bytesE) AS BIGINT) AS est_bytes,
                CAST(sum($bytesE) AS BIGINT) <= $th AS broadcastable
              FROM $name"""
        }
        Seq(
          one("region", Seq("r_name"), 1),
          one("nation", Seq("n_name"), 2),
          one("customer", Seq("c_name", "c_mktsegment"), 3),
          one("supplier", Seq("s_name"), 3),
          one("part", Seq("p_name", "p_brand", "p_type"), 3))
          .mkString("", " UNION ALL ", " ORDER BY tbl")
      }),

    QDef("q163_completeness",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .selectExpr("event_type", s"($tsMs) DIV 86400000 AS day")
        val days = ev.select("day").distinct()
        val types = ev.select("event_type").distinct()
        val expected = types.crossJoin(days)
        val observed = ev.distinct().withColumn("present", lit(1L))
        expected.join(observed, Seq("event_type", "day"), "left")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_days_expected"),
            sum(coalesce(col("present"), lit(0L))).cast("bigint")
              .as("n_days_present"),
            min(when(col("present").isNull, col("day"))).as("first_missing_day"))
          .withColumn("n_missing",
            col("n_days_expected") - col("n_days_present"))
          .orderBy("event_type")
      },
      Some("""
        WITH ev AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS day FROM events),
        days AS (SELECT DISTINCT day FROM ev),
        types AS (SELECT DISTINCT event_type FROM ev),
        expected AS (SELECT event_type, day FROM types, days),
        observed AS (SELECT DISTINCT event_type, day, 1 AS present FROM ev)
        SELECT e.event_type, count(*) AS n_days_expected,
               CAST(sum(coalesce(o.present, 0)) AS BIGINT) AS n_days_present,
               min(CASE WHEN o.present IS NULL THEN e.day END) AS first_missing_day,
               count(*) - CAST(sum(coalesce(o.present, 0)) AS BIGINT) AS n_missing
        FROM expected e LEFT JOIN observed o
          ON e.event_type = o.event_type AND e.day = o.day
        GROUP BY 1 ORDER BY 1"""))
  )
}
