package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** 60-bit string hash computed identically by Spark and DuckDB, so that
  * hash-driven operators (dedup, MinHash, SimHash, LSH) stay verifiable
  * against the DuckDB oracle.
  *
  * Spark side:  `conv(substr(md5(x), 1, 15), 16, 10)::bigint`
  * DuckDB side: `('0x' || substr(md5(x), 1, 15))::BIGINT`
  *
  * md5 is identical everywhere; 15 hex chars = 60 bits keeps the value
  * positive in an int64 in both engines. This is NOT a hot-path hash for
  * the 100 TB deployment — operators accept a pluggable hash and default
  * to [[org.apache.spark.sql.functions.xxhash64]] when oracle parity is
  * not required (see `fast` below).
  */
object PortableHash {
  /** Hash profile: "portable" (default — md5-based, DuckDB-matchable)
    * or "fast" (xxhash64 — the 100 TB production profile, NOT oracle-
    * matchable). Switched via SPARK_GRAFT_HASH=fast for profiling the
    * md5-portability tax; the driver's verify/bench never set it, so
    * every shipped number stays oracle-faithful. */
  def profile: String =
    profileOverride.getOrElse(sys.env.getOrElse("SPARK_GRAFT_HASH", "portable"))

  /** Test hook: env is fixed at JVM start, so fast-profile parity specs
    * (StreamOpsSpec) flip the profile here around plan CONSTRUCTION —
    * the profile is baked into each Column at build time. Volatile so a
    * concurrently-building session sees the write; the contract is still
    * single-threaded-test-only (set → build plans → restore, no parallel
    * suites touching it). */
  @volatile private[graft] var profileOverride: Option[String] = None

  /** Salted portable 60-bit hash of a string column. Native
    * [[graft.expressions.Md5Long]] — one md5 over the raw bytes, first
    * 60 bits assembled directly (no hex string, no base-16 parse). The
    * dedup/LSH/HLL family calls this per shingle/word, so the composed
    * form's string round-trip dominated those queries' runtime. */
  def md5Long(c: Column, salt: String = ""): Column = {
    if (profile == "fast") return fast(c, salt)
    val in = if (salt.isEmpty) c else concat(lit(salt), c)
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.Md5Long(
        org.apache.spark.sql.GraftColumnBridge.expression(in.cast("string"))))
  }

  /** Composed built-in form (hex → substr → conv): kept as the reference
    * semantics; Md5LongSpec asserts bit-identity with [[md5Long]]. */
  def md5LongComposed(c: Column, salt: String = ""): Column = {
    val in = if (salt.isEmpty) c else concat(lit(salt), c)
    conv(substring(md5(in.cast("string")), 1, 15), 16, 10).cast(LongType)
  }

  /** SPARK-side SQL fragment of [[md5Long]] (the registered
    * `graft_md5long`, or xxhash64 in the fast profile) — for call sites
    * inside `expr(...)` lambda bodies, where a Column can't reach
    * (transform/aggregate variables). Profile is baked at plan build,
    * same as every Column-based call site. */
  def md5LongSparkSql(e: String, salt: String = ""): String = {
    val lit = s"'${salt.replace("'", "''")}'"
    if (profile == "fast") {
      if (salt.isEmpty) s"xxhash64($e)" else s"xxhash64($lit, $e)"
    } else {
      if (salt.isEmpty) s"graft_md5long(CAST($e AS STRING))"
      else s"graft_md5long(CAST(concat($lit, $e) AS STRING))"
    }
  }

  /** Matching DuckDB SQL fragment; `expr` must be a SQL string expression.
    * The salt is escaped for a single-quoted SQL literal. */
  def md5LongSql(expr: String, salt: String = ""): String = {
    val in =
      if (salt.isEmpty) expr
      else s"concat('${salt.replace("'", "''")}', $expr)"
    s"CAST(('0x' || substr(md5($in), 1, 15)) AS BIGINT)"
  }

  /** Scale-path hash (single codegen'd xxhash64, no md5 string cost). */
  def fast(c: Column, salt: String = ""): Column =
    if (salt.isEmpty) xxhash64(c) else xxhash64(lit(salt), c)
}
