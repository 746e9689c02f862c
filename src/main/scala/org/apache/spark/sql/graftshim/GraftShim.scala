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

  /** Build a DataFrame from a hand-constructed logical plan (the hook a
    * custom operator rewrite needs to hand its output back to the public
    * API). `Dataset.ofRows` is `private[sql]`, hence the shim.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Executor-side access to the session's Hadoop configuration: returns
    * a serializable thunk wrapping a broadcast `SerializableConfiguration`
    * (`private[spark]`, hence the shim) — the standard way distributed
    * filesystem/footer work picks up the driver's FS settings instead of
    * silently rebuilding defaults on the executors.
    */
  def hadoopConfAccessor(sc: org.apache.spark.SparkContext)
      : () => org.apache.hadoop.conf.Configuration = {
    val b = org.apache.spark.util.SerializableConfiguration.broadcast(sc)
    () => b.value.value
  }
}
