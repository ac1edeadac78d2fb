package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{classic, Column}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` surface (this object lives under the
  * org.apache.spark.sql package namespace solely to satisfy that
  * access): Column <-> Catalyst Expression conversion for graft's
  * native expressions. Only public, stable classic-API entry points
  * are touched. */
object SqlShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
