package graft.queries

import graft.Tables.t
import graft.functions.PortableHash
import org.apache.spark.sql.functions._

/** Round-4 coverage additions, part 14:
  *
  *  - q99: table anti-entropy checksum — order-independent per-bucket
  *    row-hash XOR + count (the Merkle-leaf primitive for replica/epoch
  *    table diffing at 100 TB: mergeable, one scan, no sort). Two
  *    replicas disagree exactly where a bucket's (n, xor) differs.
  *    Reference analog: payload md5 bookkeeping (WorldShape.md5_checksum)
  *    lifted to whole-table consistency.
  *  - q80b: explicit GROUPING SETS — the third lattice form next to
  *    ROLLUP (q18) and CUBE (q80): only the slices actually reported,
  *    with grouping() flags distinguishing subtotal rows from real
  *    groups (and NULL keys coalesced so engine NULL-ordering never
  *    matters).
  */
object QueriesU extends QueryPack {
  import Q._

  /** Canonical row serialization for checksumming: prices in exact cents
    * via floor(x*100+0.5) — CAST(double AS BIGINT) truncates in Spark but
    * rounds in DuckDB, floor makes both exact. */
  private def rowStr(cast: String) =
    s"concat_ws('|', CAST(o_orderkey AS $cast), CAST(o_custkey AS $cast), " +
      s"o_orderstatus, CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS $cast), " +
      "o_orderpriority)"

  def defs: Seq[QDef] = Seq(
    // ---------------------------------------------------------------- q99
    QDef("q99_table_checksum",
      (s, dir) => {
        t(s, dir, "orders")
          .withColumn("h", PortableHash.md5Long(expr(rowStr("STRING")), salt = "ck~"))
          .groupBy(expr("o_orderkey % 16").as("bucket"))
          .agg(count(lit(1)).as("n_rows"),
            expr("bit_xor(h)").as("xor60"))
          .orderBy("bucket")
      },
      Some(s"""
        WITH h AS (
          SELECT o_orderkey % 16 AS bucket,
                 ${PortableHash.md5LongSql(rowStr("VARCHAR"), salt = "ck~")} AS hv
          FROM orders)
        SELECT bucket, count(*) AS n_rows, bit_xor(hv) AS xor60
        FROM h GROUP BY 1 ORDER BY 1""")),

    // --------------------------------------------------------------- q80b
    QDef("q80b_grouping_sets",
      (s, dir) => {
        t(s, dir, "orders")
          .select(col("o_orderstatus"), col("o_orderpriority"), col("o_totalprice"))
          .groupingSets(
            Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
              Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
            col("o_orderstatus"), col("o_orderpriority"))
          .agg(grouping(col("o_orderstatus")).cast("int").as("g_status"),
            grouping(col("o_orderpriority")).cast("int").as("g_priority"),
            count(lit(1)).as("n"),
            dec38(sum(dec(col("o_totalprice")))).as("total"))
          .select(coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
            coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
            col("g_status"), col("g_priority"), col("n"), col("total"))
          .orderBy("g_status", "g_priority", "status", "priority")
      },
      Some(s"""
        SELECT coalesce(o_orderstatus, '(all)') AS status,
               coalesce(o_orderpriority, '(all)') AS priority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority,
               count(*) AS n,
               CAST(sum(CAST(o_totalprice AS $decSql)) AS $dec38Sql) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority))
        ORDER BY g_status, g_priority, status, priority"""))
  )
}
