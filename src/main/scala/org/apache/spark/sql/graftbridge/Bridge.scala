package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst-Expression bridge.
  *
  * Spark 4 moved the classic Column-from-Expression constructors behind
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`); a
  * same-package-tree object is the standard way for an extension library to
  * lift its custom Catalyst expressions into the public Column API.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
