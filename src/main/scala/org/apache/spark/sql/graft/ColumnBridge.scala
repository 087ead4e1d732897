package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Expression ↔ Column bridge for graft's native Catalyst expressions.
 *
 * Spark 4 moved the `Column(expr)` constructor behind
 * `private[sql] classic.ExpressionUtils`, so a library can no longer
 * wrap a hand-built [[Expression]] into a [[Column]] from its own
 * package. This shim lives under `org.apache.spark.sql` for exactly
 * that one access (the standard ecosystem pattern — Delta, Sedona and
 * the Spark connectors ship the same bridge) and re-exports the two
 * conversions graft needs. Nothing else from the private surface is
 * touched.
 *
 * Why it matters: DataFrame-API entry points like
 * `Dedup.editNearDups` must work on ANY SparkSession — requiring
 * `spark.sql.extensions=graft.plans.GraftExtensions` just to resolve
 * `call_function("lev_banded", …)` would fail analysis with an obscure
 * "undefined function" on unconfigured sessions. Building the
 * expression directly removes the registration requirement; the SQL
 * name stays registered for SQL users.
 */
object ColumnBridge {
  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a Column back to its Catalyst expression. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
