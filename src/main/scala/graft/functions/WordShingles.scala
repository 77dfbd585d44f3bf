package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles in first-occurrence order — semantically
  * identical to
  * `array_distinct(transform(sequence(1, greatest(size(w)-n+1, 1)),
  *    i -> concat_ws(' ', slice(w, i, n))))`
  * (short inputs fall back to one shingle of the whole word list), but a
  * single pass over the words array. The composable form re-evaluates its
  * (non-cheap) child inside the lambda — O(words^2) on interpreted eval —
  * which is why this exists.
  */
case class WordShingles(child: Expression, n: Int)
  extends UnaryExpression with RefCallCodegen {

  require(n >= 1 && n <= 16, s"n out of range: $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val words = new Array[UTF8String](arr.numElements())
    var i = 0
    while (i < words.length) { words(i) = arr.getUTF8String(i); i += 1 }
    val count = math.max(words.length - n + 1, 1)
    val seen = new java.util.LinkedHashSet[UTF8String]()
    i = 0
    while (i < count) {
      val end = math.min(i + n, words.length)
      val parts = java.util.Arrays.copyOfRange(words, i, end)
      seen.add(UTF8String.fromString(
        parts.map(w => if (w == null) "" else w.toString).mkString(" ")))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  def word_shingles(words: Column, n: Int): Column =
    ColumnInterop.toColumn(WordShingles(ColumnInterop.toExpr(words), n))
}
