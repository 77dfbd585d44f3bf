package org.apache.spark.sql.graftinterop

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between Catalyst `Expression`s and user-facing `Column`s.
  * Spark 4 keeps the conversion (`ExpressionUtils`) `private[sql]`, so
  * this one-file shim lives under the sql package namespace to expose it
  * to graft's custom expressions.
  */
object ColumnInterop {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)

  /** The session's unique id — public on the classic implementation
    * but absent from the API type graft codes against; every local
    * SparkSession here IS classic.
    */
  def sessionUUID(s: org.apache.spark.sql.SparkSession): String =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionUUID
}
