package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DISTINCT sliding character n-gram windows in first-occurrence
  * order — semantically identical to
  * `array_distinct(transform(sequence(1, length(s) - n + 1),
  *    i -> substring(s, i, n)))`
  * (strings shorter than n chars yield an empty array), but a single
  * pass over the bytes. The composable form re-evaluates
  * `substring(s, i, n)` per position, and UTF8String.substring scans
  * from byte 0 to find the i-th character — O(chars²) byte stepping
  * per document plus one interpreted lambda dispatch per window
  * (higher-order functions are CodegenFallback). Here the character
  * byte-offsets are computed once (O(chars)), each window is one
  * bounded byte slice, and dedup rides a LinkedHashSet — the
  * WordShingles discipline for character grams.
  *
  * Character semantics match SQL `substring`: windows are n Unicode
  * code points, so multi-byte text windows exactly like the
  * `transform` form (byte windows would diverge on non-ASCII).
  */
case class CharWindows(child: Expression, n: Int)
  extends RefCallCodegen {

  require(n >= 1 && n <= 256, s"n out of range: $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_windows"

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    // char-start byte offsets, one pass (ASCII strings: offs(i) == i)
    val offs = new Array[Int](bytes.length + 1)
    var nChars = 0
    var b = 0
    while (b < bytes.length) {
      offs(nChars) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      nChars += 1
    }
    offs(nChars) = bytes.length
    val count = nChars - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
    var i = 0
    while (i < count) {
      seen.add(UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, offs(i), offs(i + n))))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharWindows {
  def char_windows(s: Column, n: Int): Column =
    ColumnInterop.toColumn(CharWindows(ColumnInterop.toExpr(s), n))
}
