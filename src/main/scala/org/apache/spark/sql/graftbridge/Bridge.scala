package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression conversion for custom expressions.
  *
  * Spark 4 scopes `ExpressionUtils` as private[sql]; extension libraries
  * conventionally expose the two converters from a subpackage of
  * org.apache.spark.sql (qualified-private access includes nested
  * packages). This is the only file outside the graft namespace.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
