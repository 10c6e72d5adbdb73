package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 moved `Column` off catalyst (`Column.expr` is gone; a
  * Column wraps a connect-compatible `ColumnNode`) and fenced the
  * converter behind `private[sql]`. Graft's data skipping needs the
  * UNRESOLVED expression tree of a user predicate — analyzing it first
  * would wrap literals in casts and let the optimizer collapse the
  * probe plan — so this one-liner bridges into the package. The
  * standard pattern for Spark-extension libraries; no behavior lives
  * here.
  */
object GraftColumnBridge {
  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
