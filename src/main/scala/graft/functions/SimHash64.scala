package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types.{DataType, LongType}

import java.security.MessageDigest

/** 60-bit SimHash over a token array, one md5 digest per token.
  *
  * Bit p (0-based, p < 60) votes +1/-1 per token on bit (p % 4) of
  * nibble (p / 4) of the token's md5, where nibble i is the i-th
  * lowercase hex character of the digest (even i = high nibble of byte
  * i/2). The signature sets bit p iff its vote sum is positive — the
  * token-frequency-weighted SimHash of Charikar 2002 / Manku et al.
  * 2007, at 60 bits so the value (and every DuckDB replay term) stays
  * inside a signed 64-bit integer.
  *
  * Why 60 and not the 16-bit variant [[graft.queries.PipelineQueries]]
  * exposes as `simhash`: on a shared-vocabulary corpus a 16-bit
  * signature puts ~28% of ALL pairs within hamming 3 — the "near-dup"
  * relation degenerates and any pair search does O(n^2) useful work.
  * At 60 bits random pairs concentrate around hamming ~30 and only
  * genuine near-duplicates land at <= 3, so the banded search's
  * candidate set tracks the true duplicate count. One digest per token
  * amortizes the hashing exactly like [[MinHashMd5]].
  */
case class SimHash64(child: Expression)
  extends RefCallCodegen {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  @transient private lazy val md = MessageDigest.getInstance("MD5")

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](60)
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      var p = 0
      while (p < 60) {
        val i4 = p >> 2 // nibble index = hex char index
        val nib =
          if ((i4 & 1) == 0) (d(i4 >> 1) >> 4) & 0xf else d(i4 >> 1) & 0xf
        if (((nib >> (p & 3)) & 1) == 1) votes(p) += 1 else votes(p) -= 1
        p += 1
      }
      i += 1
    }
    var sig = 0L
    var p = 0
    while (p < 60) {
      if (votes(p) > 0) sig |= 1L << p
      p += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  def simhash64(tokens: Column): Column =
    ColumnInterop.toColumn(SimHash64(ColumnInterop.toExpr(tokens)))
}
