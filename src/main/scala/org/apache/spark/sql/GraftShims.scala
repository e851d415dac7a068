package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Minimal bridge to `private[sql]` seams needed by graft's native
  * Catalyst expressions (see `graft.functions.VectorFunctions`): wrapping
  * an `Expression` in a user-facing `Column` and registering a function
  * builder on an already-built session. Kept to exactly these two seams —
  * everything else in the engine uses public API.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  def registerFunction(
      spark: SparkSession,
      id: FunctionIdentifier,
      info: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(id)) registry.registerFunction(id, info, builder)
  }
}
