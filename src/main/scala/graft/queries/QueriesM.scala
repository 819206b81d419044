package graft.queries

import graft.Tables.t
import graft.functions.{PortableHash, TextFunctions, VectorOps}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-4 coverage additions, part 6: iterative ML on the engine.
  *
  * q45 runs ONE FULL k-means Lloyd iteration (cosine metric) end to end:
  * deterministic seeding → E-step assignment → M-step centroid
  * recomputation → re-assignment — and reports the per-cell migration.
  * Composes q42's assignment machinery with q44's dimension-parallel
  * mean; everything stays oracle-exact (decimal per-dim sums, sequential
  * double folds, 6-dp rounded similarities for deterministic rank
  * tie-break). At 100 TB per iteration: one broadcast of k centroids,
  * one posexplode shuffle of |cells|×dim partial sums, zero driver-side
  * vector math.
  */
object QueriesM extends QueryPack {

  private val SeedMod = 100 // same coarse seeding as q42 (vec_id % 100 == 0)

  def defs: Seq[QDef] = Seq(
    QDef("q45_kmeans_iter",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"), VectorOps.norm("embedding").as("nrm"))
          // single-file parquet scan = ONE partition: repartition or both
          // broadcast cross-join E-steps run on one task (see q198)
          .repartition(col("vec_id"))
          .cache()
        e.count() // eager: corpus read by both assignment passes in one job
        val seeds = e.filter(col("vec_id") % SeedMod === 0)
          .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"),
            col("nrm").as("c_nrm"))
        // E-step 1: nearest seed by 6-dp cosine, c_id tie-break. argmax
        // via max(struct(sim6, -c_id)) — partial aggregation collapses
        // each vec_id's |seeds| rows MAP-SIDE, so nothing vector-sized
        // crosses a shuffle (the r9 row_number window shuffled |corpus| ×
        // |seeds| rows each carrying the 256-byte embedding — ~1 GB per
        // E-step at sf1, the wall's bulk). Ordering identity: struct max
        // compares sim6 first (NaN greatest, same as the window's DESC),
        // then the negated id picks the smallest c_id.
        val a1 = e.crossJoin(broadcast(seeds))
          .select(col("vec_id"),
            round(VectorOps.cosineFromNorms("embedding", "c_vec", "nrm", "c_nrm"), 6)
              .as("sim6"),
            col("c_id"))
          .groupBy("vec_id")
          .agg(max(struct(col("sim6"), (-col("c_id")).as("nc"))).as("m"))
          .select(col("vec_id"), (-col("m.nc")).as("cell"))
          .cache()
        a1.count() // eager: referenced by the M-step and the migration join
        // M-step: per-cell per-dim decimal-exact means, re-assembled in
        // dim order (the sequential fold below then matches the oracle);
        // vectors re-read from the cached corpus, not carried through a1
        val dims = a1.join(e, "vec_id")
          .select(col("cell"), posexplode(col("embedding")).as(Seq("dim", "x")))
          .groupBy("cell", "dim")
          .agg(sum(col("x").cast("double").cast(DecimalType(28, 9))).cast("double").as("sd"),
            count(lit(1)).as("cn"))
          .withColumn("md", col("sd") / col("cn"))
        val cents = dims.groupBy("cell")
          .agg(expr("transform(array_sort(collect_list(struct(dim, md))), t -> t.md)")
            .as("c_vec2"))
          .withColumn("c_nrm2",
            sqrt(expr("aggregate(c_vec2, CAST(0 AS DOUBLE), (a, v) -> a + v * v)")))
        // E-step 2 against the recomputed centroids: native float×double
        // dot (the HOF zip_with/aggregate form runs ~3 interpreted
        // lambdas per pair — seconds at 4M pairs), same map-side argmax
        val a2 = e.crossJoin(broadcast(cents.select(col("cell").as("cell2"),
            col("c_vec2"), col("c_nrm2"))))
          .select(col("vec_id"),
            round(VectorOps.dotFD("embedding", "c_vec2")
              / (col("nrm") * col("c_nrm2")), 6).as("sim6b"),
            col("cell2"))
          .groupBy("vec_id")
          .agg(max(struct(col("sim6b"), (-col("cell2")).as("nc"))).as("m"))
          .select(col("vec_id"), (-col("m.nc")).as("cell2"),
            col("m.sim6b").as("sim6b"))
        // migration report per original cell
        val moved = a1.select("vec_id", "cell").join(a2, "vec_id")
          .groupBy("cell")
          .agg(count(lit(1)).as("n_iter1"),
            sum(when(col("cell2") === col("cell"), 1L).otherwise(0L)).cast("bigint")
              .as("n_stable"),
            sum(col("sim6b").cast(DecimalType(18, 6))).as("sim_sum"))
        val after = a2.groupBy(col("cell2").as("cell"))
          .agg(count(lit(1)).as("n_iter2"))
        moved.join(after, Seq("cell"), "left_outer")
          .select(col("cell"), col("n_iter1"),
            coalesce(col("n_iter2"), lit(0L)).as("n_iter2"), col("n_stable"),
            round(col("sim_sum").cast("double") / col("n_iter1"), 6).as("mean_sim6"))
          .orderBy("cell")
      },
      Some(s"""
        WITH e AS (SELECT vec_id, embedding, ${VectorOps.normSql("embedding")} AS nrm
                   FROM embeddings),
        seeds AS (SELECT vec_id AS c_id, embedding AS c_vec, nrm AS c_nrm
                  FROM e WHERE vec_id % $SeedMod = 0),
        a1 AS (
          SELECT vec_id, embedding, nrm, cell FROM (
            SELECT e.vec_id, e.embedding, e.nrm, s.c_id AS cell,
                   row_number() OVER (PARTITION BY e.vec_id ORDER BY
                     round(${VectorOps.cosineFromNormsSql("e.embedding", "s.c_vec", "e.nrm", "s.c_nrm")}, 6) DESC,
                     s.c_id) AS rn
            FROM e CROSS JOIN seeds s)
          WHERE rn = 1),
        dims AS (
          SELECT cell, i - 1 AS dim,
                 CAST(sum(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(28,9))) AS DOUBLE)
                   / count(*) AS md
          FROM a1, unnest(range(1, len(embedding) + 1)) AS tt(i)
          GROUP BY 1, 2),
        cents AS (
          SELECT cell AS cell2, list(md ORDER BY dim) AS c_vec2
          FROM dims GROUP BY 1),
        cents2 AS (
          SELECT cell2, c_vec2,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), c_vec2),
                   (a, v) -> a + v * v)) AS c_nrm2
          FROM cents),
        a2 AS (
          SELECT vec_id, cell2, sim6b FROM (
            SELECT e.vec_id, c.cell2,
                   round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                       list_transform(list_zip(e.embedding, c.c_vec2),
                         t -> CAST(t[1] AS DOUBLE) * t[2])),
                       (acc, v) -> acc + v) / (e.nrm * c.c_nrm2), 6) AS sim6b,
                   row_number() OVER (PARTITION BY e.vec_id ORDER BY
                     round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                         list_transform(list_zip(e.embedding, c.c_vec2),
                           t -> CAST(t[1] AS DOUBLE) * t[2])),
                         (acc, v) -> acc + v) / (e.nrm * c.c_nrm2), 6) DESC,
                     c.cell2) AS rn
            FROM e CROSS JOIN cents2 c)
          WHERE rn = 1),
        moved AS (
          SELECT a1.cell, count(*) AS n_iter1,
                 sum(CASE WHEN a2.cell2 = a1.cell THEN 1 ELSE 0 END) AS n_stable,
                 sum(CAST(sim6b AS DECIMAL(18,6))) AS sim_sum
          FROM a1 JOIN a2 ON a1.vec_id = a2.vec_id
          GROUP BY 1),
        after AS (SELECT cell2 AS cell, count(*) AS n_iter2 FROM a2 GROUP BY 1)
        SELECT m.cell AS cell, CAST(n_iter1 AS BIGINT) AS n_iter1,
               CAST(coalesce(n_iter2, 0) AS BIGINT) AS n_iter2,
               CAST(n_stable AS BIGINT) AS n_stable,
               round(CAST(sim_sum AS DOUBLE) / n_iter1, 6) AS mean_sim6
        FROM moved m LEFT JOIN after a ON m.cell = a.cell
        ORDER BY cell""")),

    // ---------------------------------------------------------------- q96
    // Count-Min sketch heavy hitters: d=3 hash rows × w=64 buckets of
    // BIGINT counts — like the portable HLL (q17), a DETERMINISTIC sketch
    // both engines compute bit-identically. Cells are plain sums →
    // map-side combinable; the whole sketch is 192 longs regardless of
    // corpus size; estimates are min-over-rows with the classic
    // one-sided (over-)estimate guarantee, reported against the exact
    // counts for the true top 15 tokens.
    QDef("q96_cms_heavy_hitters",
      (s, dir) => {
        val toks = t(s, dir, "documents")
          .select(explode(TextFunctions.words(col("text"))).as("tok"))
          .filter(length(col("tok")) > 0)
          .cache()
        toks.count() // eager: exact side + 3 sketch rows in one job
        val exact = toks.groupBy("tok").agg(count(lit(1)).as("exact_n"))
        val top = exact.orderBy(col("exact_n").desc, col("tok")).limit(15)
        def bucketOf(row: Int, tokCol: String) =
          pmod(PortableHash.md5Long(col(tokCol), salt = s"cms$row~"), lit(64L))
        val cells = (0 until 3).map { r =>
          toks.groupBy(bucketOf(r, "tok").as("bucket"))
            .agg(count(lit(1)).as("c")).withColumn("row", lit(r))
        }.reduce(_ unionByName _)
        val est = (0 until 3).map { r =>
          top.withColumn("row", lit(r)).withColumn("bucket", bucketOf(r, "tok"))
        }.reduce(_ unionByName _)
          .join(cells, Seq("row", "bucket"))
          .groupBy("tok", "exact_n")
          .agg(min(col("c")).cast("bigint").as("cms_n"))
        est.select(col("tok"), col("exact_n"), col("cms_n"),
            (col("cms_n") - col("exact_n")).as("overcount"))
          .orderBy(col("exact_n").desc, col("tok"))
      },
      Some {
        val wSql = TextFunctions.wordsSql("text")
        def bSql(r: Int) = s"${PortableHash.md5LongSql("tok", salt = s"cms$r~")} % 64"
        val cellSelects = (0 until 3).map(r =>
          s"SELECT $r AS row, ${bSql(r)} AS bucket, count(*) AS c FROM toks GROUP BY 1, 2")
          .mkString(" UNION ALL ")
        val probeSelects = (0 until 3).map(r =>
          s"SELECT tok, exact_n, $r AS row, ${bSql(r)} AS bucket FROM top")
          .mkString(" UNION ALL ")
        s"""
        WITH toks AS (
          SELECT tok FROM (SELECT unnest($wSql) AS tok FROM documents)
          WHERE length(tok) > 0),
        exact AS (SELECT tok, count(*) AS exact_n FROM toks GROUP BY 1),
        top AS (SELECT * FROM exact ORDER BY exact_n DESC, tok LIMIT 15),
        cells AS ($cellSelects),
        probes AS ($probeSelects),
        est AS (
          SELECT p.tok, p.exact_n, min(c.c) AS cms_n
          FROM probes p JOIN cells c ON p.row = c.row AND p.bucket = c.bucket
          GROUP BY 1, 2)
        SELECT tok, CAST(exact_n AS BIGINT) AS exact_n, CAST(cms_n AS BIGINT) AS cms_n,
               CAST(cms_n - exact_n AS BIGINT) AS overcount
        FROM est
        ORDER BY exact_n DESC, tok"""
      })
  )
}
