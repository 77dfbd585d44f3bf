package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types.{DataType, LongType}

/** ⟨w, x_row⟩ over a doc-major feature array — the Perceptron score
  * fold as one native pass: semantically identical to the composable
  *
  *   aggregate(fs, 0L, (acc, s) ->
  *     acc + s.x * element_at(typedlit(w), s.f + 1))
  *
  * but without the interpreted-lambda dispatch per element (higher-
  * order functions are CodegenFallback, and the fold form additionally
  * re-reads the weight literal array through element_at per step).
  * The weight vector rides the expression as a literal, exactly like
  * the typedlit it replaces — the batch perceptron's weights live on
  * the driver between rounds by contract.
  *
  * `fs` elements are struct(f int, x long) with f validated into
  * [0, weights.length) at matrix build (Perceptron.pivotMat) — an
  * out-of-range id here is a build-contract violation and fails loud.
  */
case class FeatureDot(child: Expression, weights: Seq[Long])
  extends RefCallCodegen {

  override def dataType: DataType = LongType
  override def prettyName: String = "feature_dot"

  @transient private lazy val w = weights.toArray

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      val e = arr.getStruct(i, 2)
      s += e.getLong(1) * w(e.getInt(0))
      i += 1
    }
    s
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FeatureDot {
  def feature_dot(fs: Column, weights: Array[Long]): Column =
    ColumnInterop.toColumn(
      FeatureDot(ColumnInterop.toExpr(fs), weights.toSeq))
}
