package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import java.security.MessageDigest

/** One-pass md5 MinHash with k hash families derived from ONE digest per
  * token: family j is the j-th 32-bit big-endian slice of md5(token),
  * rendered as 8 lowercase hex chars; signature_j = min over tokens.
  * Exactly the value of the composable form
  * `array_min(transform(sh, s -> substr(md5(s), 8*j+1, 8)))`
  * (fixed-width lowercase hex compares lexicographically == numerically),
  * but with a single digest per token instead of k digests over k
  * prefixed copies — 4x less hashing at k=4, which is what dominates
  * signature cost at scale. md5's bits are independent, so disjoint
  * slices are valid independent hash families.
  *
  * Keeping md5 as the hash family is what lets the DuckDB oracle replay
  * the signatures; the non-replayable fast path is MinHash64.
  */
case class MinHashMd5(child: Expression, k: Int)
  extends UnaryExpression with RefCallCodegen {

  require(k > 0 && k <= 4, s"k out of range (md5 has 4 32-bit slices): $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_md5"

  @transient private lazy val md = MessageDigest.getInstance("MD5")

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](k))
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      var j = 0
      while (j < k) {
        val off = j * 4
        val v32 = ((d(off) & 0xffL) << 24) | ((d(off + 1) & 0xffL) << 16) |
          ((d(off + 2) & 0xffL) << 8) | (d(off + 3) & 0xffL)
        if (v32 < mins(j)) mins(j) = v32
        j += 1
      }
      i += 1
    }
    val hex = new Array[Any](k)
    var j = 0
    while (j < k) {
      hex(j) = UTF8String.fromString(f"${mins(j)}%08x")
      j += 1
    }
    new GenericArrayData(hex)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashMd5 {
  def minhash_md5(tokens: Column, k: Int): Column =
    ColumnInterop.toColumn(MinHashMd5(ColumnInterop.toExpr(tokens), k))
}
