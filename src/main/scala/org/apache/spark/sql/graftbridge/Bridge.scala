package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. In Spark 4 the `Column` API is decoupled
  * from Catalyst (Spark Connect column nodes) and the converters live in
  * `private[sql]` `classic.ExpressionUtils`; custom-Expression libraries
  * conventionally reach them from inside the `org.apache.spark.sql`
  * namespace. This is the only file outside the `graft` package.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
