package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types.{DataType, LongType}

import java.security.MessageDigest

/** The 16-bit nibble-voted SimHash the `simhash` query reports, as one
  * pass — semantically identical to the composable form
  * (per bit p: vote +1 per token whose md5 hex char at index p is in
  * 8..f — i.e. the nibble's top bit is set — else −1; bit p set iff
  * the vote sum is positive), but one digest and one 16-counter sweep
  * per token instead of 16 interpreted `aggregate` folds each
  * re-scanning the md5-string array (higher-order functions are
  * CodegenFallback; measured 1.9 s of full-materialization time at
  * sf0.1 for the fold form). [[SimHash64]] remains the wide signature
  * for pair search; this one exists for the reporting query only.
  */
case class SimHash16(child: Expression)
  extends RefCallCodegen {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash16"

  @transient private lazy val md = MessageDigest.getInstance("MD5")

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](16)
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      var p = 0
      while (p < 16) {
        // hex char index p = nibble p: even p is the high nibble of
        // byte p/2; vote on the nibble's top bit (hex char in 8..f)
        val nib =
          if ((p & 1) == 0) (d(p >> 1) >> 4) & 0xf else d(p >> 1) & 0xf
        if ((nib & 8) != 0) votes(p) += 1 else votes(p) -= 1
        p += 1
      }
      i += 1
    }
    var sig = 0L
    var p = 0
    while (p < 16) {
      if (votes(p) > 0) sig |= 1L << p
      p += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash16 {
  def simhash16(tokens: Column): Column =
    ColumnInterop.toColumn(SimHash16(ColumnInterop.toExpr(tokens)))
}
