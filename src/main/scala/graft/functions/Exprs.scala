package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Catalyst Expression bridge for Spark 4.x (where `Column`
  * no longer wraps an `Expression` directly).
  */
private[graft] object Exprs {
  def toColumn(e: Expression): Column = org.apache.spark.sql.graft.Bridge.column(e)
  def toExpr(c: Column): Expression   = org.apache.spark.sql.graft.Bridge.expression(c)
}
