package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper callable from generated code. */
object WordNgramMath {
  /** Sorted distinct space-joined word n-grams of `w` — value-identical
    * to `sort_array(array_distinct(transform(sequence(0, size-n), i ->
    * concat_ws(' ', w[i..i+n)))))`, one pass and no interpreted lambdas
    * (the composed transform re-ran per explode OUTPUT row). */
  def ngramSet(w: ArrayData, n: Int): ArrayData = {
    val m = w.numElements()
    val cnt = m - n + 1
    if (cnt <= 0) return new GenericArrayData(Array.empty[Any])
    val sep = UTF8String.fromString(" ")
    val set = new java.util.TreeSet[UTF8String]()
    var i = 0
    while (i < cnt) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = w.getUTF8String(i + j); j += 1 }
      set.add(UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    new GenericArrayData(set.toArray.asInstanceOf[Array[AnyRef]])
  }
}

/** Native distinct word-n-gram STRING set (the un-hashed sibling of
  * [[WordShingleSet]], for queries whose oracle works on raw grams).
  * WordNgramSetSpec asserts value-identity with the composed form. */
case class WordNgramSet(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_ngram_set"

  override protected def nullSafeEval(w: Any): Any =
    WordNgramMath.ngramSet(w.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      w => s"graft.expressions.WordNgramMath.ngramSet($w, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
