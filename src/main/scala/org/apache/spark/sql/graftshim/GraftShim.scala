package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst expressions and the public
  * Column API. `ExpressionUtils` is `private[sql]`, so this one-file shim
  * lives under the org.apache.spark.sql package — the same technique
  * third-party Spark extensions (e.g. connectors and UDF libraries) use
  * to wrap native expressions.
  */
object GraftShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
