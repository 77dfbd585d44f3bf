package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken 2003):
  * polynomial rolling hashes of the character k-grams, then one minimum
  * selected per window of `w` consecutive hashes (rightmost min), and the
  * distinct selected hashes returned sorted. Guarantees any shared
  * substring of length >= k + w - 1 contributes at least one common
  * fingerprint hash — the standard plagiarism/near-dup primitive.
  */
case class RollingFingerprint(child: Expression, k: Int, w: Int)
  extends UnaryExpression with CodegenFallback {

  require(k >= 2 && k <= 64, s"k out of range: $k")
  require(w >= 1 && w <= 256, s"w out of range: $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_fingerprint"

  private val Base = 1000003L

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    if (s.length < k) return new GenericArrayData(Array.empty[Long])
    // rolling polynomial hash over char k-grams
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= Base; i += 1 }
    val n = s.length - k + 1
    val hashes = new Array[Long](n)
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + s.charAt(i); i += 1 }
    hashes(0) = h
    i = 1
    while (i < n) {
      h = (h - s.charAt(i - 1) * pow) * Base + s.charAt(i + k - 1)
      hashes(i) = h
      i += 1
    }
    // winnow: rightmost minimum of each window of w hashes
    val selected = scala.collection.mutable.SortedSet.empty[Long]
    var start = 0
    while (start <= n - math.min(w, n)) {
      val end = math.min(start + w, n)
      var minIdx = start
      var j = start + 1
      while (j < end) { if (hashes(j) <= hashes(minIdx)) minIdx = j; j += 1 }
      selected += hashes(minIdx)
      start += 1
    }
    new GenericArrayData(selected.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingFingerprint {
  def rolling_fingerprint(text: Column, k: Int, w: Int): Column =
    ColumnInterop.toColumn(
      RollingFingerprint(ColumnInterop.toExpr(text), k, w))
}
