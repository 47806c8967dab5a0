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

  /** EAGER Column → Expression conversion. `expression` wraps the
    * Column's node lazily (`ColumnNodeExpression`, Unevaluable) and
    * relies on the Dataset API to convert at plan construction; an
    * expression injected through a `FunctionRegistry` builder never
    * goes through that path, so it must be converted up front into
    * plain (possibly Unresolved*) Catalyst nodes the SQL analyzer
    * knows. Used by [[graft.GraftExtensions]]'s composite functions. */
  def resolvedExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
