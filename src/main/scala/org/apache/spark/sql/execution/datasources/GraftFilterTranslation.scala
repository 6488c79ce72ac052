package org.apache.spark.sql.execution.datasources

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.sources.Filter

/** Package-placed shim: `DataSourceStrategy.translateFilter` is
  * `protected[sql]`, and graft's `TxFileIndex` wants Spark's OWN
  * Expression → source-Filter translation (hand-rolling it would be a
  * second, driftable copy of non-trivial semantics — null handling,
  * nested fields, collations). One forwarding method, nothing else;
  * the same in-package access route Spark-native extensions
  * (Delta, Iceberg's spark module) use for exactly this call.
  */
object GraftFilterTranslation {
  def translate(e: Expression): Option[Filter] =
    DataSourceStrategy.translateFilter(e, supportNestedPredicatePushdown = true)
}
