package org.apache.spark.sql

import graft.extensions.GraftExtensions

/** Runtime registration of graft's native expressions into an existing
  * session, idempotent. The sanctioned path is
  * `graft.extensions.GraftExtensions` via `spark.sql.extensions`; this
  * helper covers sessions that were built without it (e.g. a host
  * application's session), which requires the `org.apache.spark.sql`
  * package for `sessionState` access — the standard ecosystem escape hatch.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    GraftExtensions.registrations.foreach { case (id, info, builder) =>
      if (!reg.functionExists(id)) reg.registerFunction(id, info, builder)
    }
  }

  /** Column ↔ Expression bridges (`classic.ExpressionUtils` is
    * private[sql]) for graft expressions whose parameters don't encode as
    * SQL-function varargs (e.g. [[graft.expressions.LangId]]'s marker
    * map) and therefore bypass the function registry.
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
