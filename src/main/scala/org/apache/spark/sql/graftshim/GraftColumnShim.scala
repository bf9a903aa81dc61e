package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for expressions that cannot go through the
  * SQL function registry (graft's Bloom probe embeds a runtime-built
  * 512 KiB bit array as a JVM reference — there is no literal form for
  * it). Spark 4 made `ExpressionUtils` `private[sql]`, so this one-line
  * forwarder lives in a subpackage of `org.apache.spark.sql` — the same
  * documented trick every Spark extension library uses for Column
  * construction; it touches no internals beyond the two stable
  * conversion entry points. */
object GraftColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
