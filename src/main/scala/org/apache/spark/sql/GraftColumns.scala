package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Catalyst Expression bridge for graft's native expressions.
  *
  * Spark 4 made these conversions `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils); a same-package
  * accessor is the standard pattern open-source Spark libraries use to
  * build Columns from custom expressions without registering a SQL
  * function for every parameterization (a function-registry route would
  * need the IVF centroid matrix spelled as a giant array literal in SQL
  * text). Only these two conversions are exposed.
  */
object GraftColumns {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
