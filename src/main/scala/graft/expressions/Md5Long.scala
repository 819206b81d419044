package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Static md5-prefix hash callable from generated code. */
object HashMath {
  private val tl: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(s) as a non-negative long — the SAME value as
    * `conv(substr(md5(s), 1, 15), 16, 10)` (15 hex chars = bytes 0..6
    * plus the high nibble of byte 7, big-endian), without materializing
    * the 32-char hex string or running the base-16 string parse. */
  def md5Long60(s: UTF8String): Long = {
    val md = tl.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }
}

/** Native portable 60-bit md5 hash of a string column. The dedup/LSH/HLL
  * family computes this per shingle/word — millions of times per job — so
  * the hex-string round-trip of the composed form (md5 → hex → substr →
  * conv → cast) is pure overhead. Value-identical to the composed form
  * (asserted in Md5LongSpec) and to the DuckDB oracle fragment
  * `CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)`.
  * Registered as `graft_md5long(x)`. */
case class Md5Long(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5long"

  override protected def nullSafeEval(s: Any): Any =
    HashMath.md5Long60(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.expressions.HashMath.md5Long60($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
