package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Spark internals, compiled into the
  * `org.apache.spark.sql` package — the standard technique public Spark
  * extension libraries use to lift a custom Catalyst [[Expression]] into
  * the public [[Column]] API (Spark 4.x routes Column through ColumnNode,
  * so `new Column(expr)` no longer exists).
  *
  * Kept intentionally tiny: everything else in the engine stays on public
  * API.
  */
object GraftSqlBridge {

  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Unwrap a Column to its Catalyst expression (classic sessions). */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register an expression builder as a SQL temp function so
    * `spark.sql("SELECT cosine_sim(a, b)")` resolves to the native
    * expression (codegen-capable path, unlike a Scala UDF). */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark
      .asInstanceOf[classic.SparkSession]
      .sessionState
      .functionRegistry
      .createOrReplaceTempFunction(name, builder, "internal")
}
