package org.apache.spark.sql.graftinterop

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.DataSourceStrategy
import org.apache.spark.sql.sources.Filter

/** `DataSourceStrategy.translateFilter` is `protected[sql]`; this shim
  * exposes catalyst-predicate -> data-source-Filter translation to the
  * metadata-count optimizer rule.
  */
object FilterInterop {
  def translate(predicate: Expression): Option[Filter] =
    DataSourceStrategy.translateFilter(predicate,
      supportNestedPredicatePushdown = false)
}
