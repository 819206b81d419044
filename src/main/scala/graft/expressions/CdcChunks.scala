package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass content-defined chunking (rsync/Borg-style, reference analog:
  * incremental snapshot economics over scraped responses). Static helper so
  * generated code can call it directly. */
object CdcMath {
  /** Split `s` into CDC chunks. Boundary rule (identical to the composed
    * SQL form it replaces, q558's oracle): for 1-based char position
    * i in [4, len): cut AFTER char i when
    * (cp(i-3)*29791 + cp(i-2)*961 + cp(i-1)*31 + cp(i)) % 64 == 0,
    * where cp(k) is the full codepoint of char k — exactly Spark's
    * `ascii(substring(text, k, 1))` (probed: ascii('ä')=228, ascii of a
    * supplementary char = its codepoint). The final chunk always ends
    * at len. One O(len) walk; the composed transform/filter/substring
    * form re-scanned the string per position (O(len²), 171 s at sf0.1).
    */
  def chunks(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val n = b.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // char-start byte offsets + codepoint per char, one walk
    val offs = new Array[Int](n)
    val fb = new Array[Int](n)
    var m = 0
    var i = 0
    while (i < n) {
      val b0 = b(i) & 0xff
      if ((b0 & 0xc0) != 0x80) {
        offs(m) = i
        fb(m) =
          if (b0 < 0x80) b0
          else if ((b0 & 0xe0) == 0xc0 && i + 1 < n)
            ((b0 & 0x1f) << 6) | (b(i + 1) & 0x3f)
          else if ((b0 & 0xf0) == 0xe0 && i + 2 < n)
            ((b0 & 0x0f) << 12) | ((b(i + 1) & 0x3f) << 6) | (b(i + 2) & 0x3f)
          else if ((b0 & 0xf8) == 0xf0 && i + 3 < n)
            ((b0 & 0x07) << 18) | ((b(i + 1) & 0x3f) << 12) |
              ((b(i + 2) & 0x3f) << 6) | (b(i + 3) & 0x3f)
          else b0 // malformed tail: best-effort, never thrown
        m += 1
      }
      i += 1
    }
    val out = new java.util.ArrayList[AnyRef]()
    var start = 0
    var ci = 4 // 1-based hash-window end position; ci < m enforces i < len
    while (ci < m) {
      // 64-bit accumulate: the composed int32 form ANSI-crashes on
      // codepoints ≥ 72090 (cp*29791 > 2³¹); identical below that
      val h = fb(ci - 4).toLong * 29791 + fb(ci - 3).toLong * 961 +
        fb(ci - 2).toLong * 31 + fb(ci - 1)
      if (h % 64 == 0) {
        val end = offs(ci) // byte where char ci+1 starts
        out.add(UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, start, end)))
        start = end
      }
      ci += 1
    }
    out.add(UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, start, n)))
    new GenericArrayData(out.toArray)
  }
}

/** Native CDC chunker: string → array<string> of chunks in one pass.
  * Value-identical to the composed transform/filter/substring pipeline on
  * any input (CdcChunksSpec asserts this on the real documents table and
  * on adversarial unicode), O(len) instead of O(len²) per row. Registered
  * as `graft_cdc_chunks(text)`. */
case class CdcChunks(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_cdc_chunks"

  override protected def nullSafeEval(s: Any): Any =
    CdcMath.chunks(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.expressions.CdcMath.chunks($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
