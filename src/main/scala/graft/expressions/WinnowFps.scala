package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass winnowing fingerprints (Schleimer et al.'s local fingerprint
  * selection — the survey's document-fingerprint family). Static helper so
  * generated code can call it directly. */
object WinnowMath {
  /** Sorted DISTINCT window-min fingerprints of `s`: for every char
    * position i, h(i) = fold over the n-char-gram codepoints of
    * (acc·131 + cp) % 1e9+7, and fp(i) = min(h(i..i+win-1)) with the
    * window clipped at the end — value-identical to
    * `distinct(min(rollingFingerprint(charNgram)) OVER (ROWS CURRENT..
    * win-1 FOLLOWING))`. The composed form ran ~2·len interpreted
    * lambdas per gram plus a |grams|-row window shuffle per corpus. */
  def winnow(s: UTF8String, n: Int, win: Int): ArrayData = {
    val b = s.getBytes
    val nb = b.length
    // codepoints, one walk (CdcMath pattern)
    val fb = new Array[Int](nb)
    var m = 0
    var i = 0
    while (i < nb) {
      val b0 = b(i) & 0xff
      if ((b0 & 0xc0) != 0x80) {
        fb(m) =
          if (b0 < 0x80) b0
          else if ((b0 & 0xe0) == 0xc0 && i + 1 < nb)
            ((b0 & 0x1f) << 6) | (b(i + 1) & 0x3f)
          else if ((b0 & 0xf0) == 0xe0 && i + 2 < nb)
            ((b0 & 0x0f) << 12) | ((b(i + 1) & 0x3f) << 6) | (b(i + 2) & 0x3f)
          else if ((b0 & 0xf8) == 0xf0 && i + 3 < nb)
            ((b0 & 0x07) << 18) | ((b(i + 1) & 0x3f) << 12) |
              ((b(i + 2) & 0x3f) << 6) | (b(i + 3) & 0x3f)
          else b0 // malformed tail: best-effort, never thrown
        m += 1
      }
      i += 1
    }
    val cnt = m - n + 1
    if (cnt <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    val h = new Array[Long](cnt)
    i = 0
    while (i < cnt) {
      var acc = 0L
      var j = 0
      while (j < n) { acc = (acc * 131 + fb(i + j)) % 1000000007L; j += 1 }
      h(i) = acc
      i += 1
    }
    val fp = new Array[Long](cnt)
    i = 0
    while (i < cnt) {
      var mn = h(i)
      var j = i + 1
      val end = math.min(i + win, cnt)
      while (j < end) { if (h(j) < mn) mn = h(j); j += 1 }
      fp(i) = mn
      i += 1
    }
    java.util.Arrays.sort(fp)
    var w = 1
    i = 1
    while (i < cnt) {
      if (fp(i) != fp(w - 1)) { fp(w) = fp(i); w += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(fp, w))
  }
}

/** Native winnowing: string → sorted distinct array<long> of window-min
  * n-gram fingerprints in one pass (WinnowFpsSpec asserts value-identity
  * with the composed posexplode/rollingFingerprint/window-min/distinct
  * pipeline). */
case class WinnowFingerprints(child: Expression, n: Int, win: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_fps"

  override protected def nullSafeEval(s: Any): Any =
    WinnowMath.winnow(s.asInstanceOf[UTF8String], n, win)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.expressions.WinnowMath.winnow($s, $n, $win)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
