package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import java.security.MessageDigest

/** One-pass md5 MinHash: signature_j = lexicographic min over tokens of
  * md5Hex(j + "|" + token), for j in [0, k) — EXACTLY the value of the
  * composable form `array_min(transform(sh, s -> md5(concat('j|', s))))`,
  * but with a single traversal computing all k minima and byte-level
  * comparisons instead of k interpreted lambda passes + hex-string
  * allocation per element (hex encoding preserves unsigned byte order,
  * so comparing the 16 digest bytes is equivalent to comparing the hex).
  *
  * Keeping md5 as the hash family is what lets the DuckDB oracle replay
  * the signatures; the non-replayable fast path is MinHash64.
  */
case class MinHashMd5(child: Expression, k: Int)
  extends UnaryExpression with CodegenFallback {

  require(k > 0 && k <= 64, s"k out of range: $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_md5"

  @transient private lazy val md = MessageDigest.getInstance("MD5")
  @transient private lazy val prefixes: Array[Array[Byte]] =
    (0 until k).map(j => s"$j|".getBytes("UTF-8")).toArray

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](k))
    val mins = new Array[Array[Byte]](k)
    var i = 0
    while (i < n) {
      val tok = arr.getUTF8String(i).getBytes
      var j = 0
      while (j < k) {
        md.reset()
        md.update(prefixes(j))
        md.update(tok)
        val d = md.digest()
        if (mins(j) == null || unsignedLess(d, mins(j))) mins(j) = d
        j += 1
      }
      i += 1
    }
    val hex = new Array[Any](k)
    var j = 0
    while (j < k) {
      val sb = new java.lang.StringBuilder(32)
      mins(j).foreach(b => sb.append(f"${b & 0xff}%02x"))
      hex(j) = UTF8String.fromString(sb.toString)
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
