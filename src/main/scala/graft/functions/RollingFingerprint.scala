package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken 2003):
  * polynomial hashes of the character k-grams, then one minimum selected
  * per window of `w` consecutive hashes (rightmost min), and the distinct
  * selected hashes returned sorted. Guarantees any shared substring of
  * length >= k + w - 1 contributes at least one common fingerprint hash —
  * the standard plagiarism/near-dup primitive.
  *
  * Hash semantics are deliberately oracle-replayable: grams are Unicode
  * *code points* (matching SQL `substr`/`ascii` character semantics, not
  * UTF-16 units), and the hash is `fold(h = (h*257 + cp) % 1000003)` —
  * intermediates stay below 2^38, so a SQL engine with non-wrapping
  * 64-bit integers (DuckDB) evaluates the identical value.
  */
case class RollingFingerprint(child: Expression, k: Int, w: Int)
  extends UnaryExpression with RefCallCodegen {

  require(k >= 2 && k <= 64, s"k out of range: $k")
  require(w >= 1 && w <= 256, s"w out of range: $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_fingerprint"

  import RollingFingerprint.{Base, Mod}

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    val cps = s.codePoints().toArray
    val n = cps.length - k + 1
    if (n < 1) return new GenericArrayData(Array.empty[Long])
    // per-gram modular polynomial hash (k is small; O(n*k) is cheaper than
    // a rolling update once the modular-inverse bookkeeping is counted)
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      var h = 0L
      var j = 0
      while (j < k) { h = (h * Base + cps(i + j)) % Mod; j += 1 }
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
  val Base = 257L
  val Mod = 1000003L

  def rolling_fingerprint(text: Column, k: Int, w: Int): Column =
    ColumnInterop.toColumn(
      RollingFingerprint(ColumnInterop.toExpr(text), k, w))
}
