package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column <-> Expression bridge. Spark 4 made the converters
 * `private[sql]` (Column wraps a ColumnNode now); extensions that
 * define native Catalyst expressions use a same-package bridge — the
 * standard pattern for Spark extension libraries.
 */
object SqlBridge {
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
  def col(e: Expression): Column = ExpressionUtils.column(e)
}
