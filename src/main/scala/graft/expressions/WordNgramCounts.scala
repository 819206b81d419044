package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper callable from generated code. */
object WordNgramCountMath {
  /** Per-row word-n-gram histogram: sorted array<struct<g, c>> where `g`
    * is the space-joined n-gram and `c` its occurrence count in `w` —
    * value-identical to exploding every position and counting per gram,
    * but the dedup happens INSIDE the row, so nothing per-position ever
    * reaches a shuffle. Space-joining is injective on whitespace-split
    * tokens (no token contains a space), so (w1, w2) keys and `g` keys
    * are interchangeable for any join built from the same arrays. */
  def ngramCounts(w: ArrayData, n: Int): ArrayData = {
    val m = w.numElements()
    val cnt = m - n + 1
    if (cnt <= 0) return new GenericArrayData(Array.empty[Any])
    val sep = UTF8String.fromString(" ")
    val map = new java.util.TreeMap[UTF8String, Long]()
    var i = 0
    while (i < cnt) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = w.getUTF8String(i + j); j += 1 }
      val g = UTF8String.concatWs(sep, parts: _*)
      val prev = map.get(g)
      map.put(g, if (prev == null) 1L else prev + 1L)
      i += 1
    }
    val out = new Array[Any](map.size)
    val it = map.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = new GenericInternalRow(Array[Any](e.getKey, e.getValue))
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** Native distinct word-n-gram histogram (the counting sibling of
  * [[WordNgramSet]]): array<string> of words → sorted
  * array<struct<g: string, c: bigint>>. Lets a model-scoring pass carry
  * per-doc gram COUNTS through one explode instead of one row per gram
  * position (WordNgramCountsSpec asserts value-identity with the
  * composed explode + groupBy form). */
case class WordNgramCounts(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("g", StringType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_word_ngram_counts"

  override protected def nullSafeEval(w: Any): Any =
    WordNgramCountMath.ngramCounts(w.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      w => s"graft.expressions.WordNgramCountMath.ngramCounts($w, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
